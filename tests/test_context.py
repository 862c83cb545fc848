"""Context lifecycle: selftest KAT + blinding derivation (fast tier).

The kernel-level check that blinded ecmult_gen returns identical points
lives in test_pallas_tpu.py (needs hardware); here we check the host
side: derivation determinism, range, the -b*G point, and reset.
"""

import numpy as np

from secp256k1_zkp_tpu.context import Context, _derive_blind
from secp256k1_zkp_tpu.utils import hostcurve


def test_randomize_blind_state():
    ctx = Context()
    assert ctx.blind is None
    ctx.randomize(b"\x07" * 32)
    b_limbs, gbx, gby = ctx.blind
    b = sum(int(c) << (16 * i) for i, c in enumerate(b_limbs))
    assert 0 < b < hostcurve.N
    # gb must be -b*G
    ex, ey = hostcurve.mul(hostcurve.N - b)
    assert sum(int(c) << (16 * i) for i, c in enumerate(gbx)) == ex
    assert sum(int(c) << (16 * i) for i, c in enumerate(gby)) == ey
    # deterministic in the seed, different across seeds
    b2 = _derive_blind(b"\x07" * 32, hostcurve.N)
    assert b2 == b
    assert _derive_blind(b"\x08" * 32, hostcurve.N) != b
    # NULL-seed reset (secp256k1.c:833 NULL path)
    ctx.randomize(None)
    assert ctx.blind is None
