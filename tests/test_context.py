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


def test_hash_compress_hook():
    """The pluggable compression hook routes every hash path and is
    KAT-gated (include/secp256k1.h:420-446 parity)."""
    import pytest
    from secp256k1_zkp_tpu.ops import sha256 as H

    calls = []

    def spy(state, block):
        calls.append(1)
        return H._compress_scan(state, block)

    Context.set_hash_compress(spy)
    try:
        assert calls, "KAT did not route through the override"
        n0 = len(calls)
        H.tagged_hash_bytes("BIP0340/aux", np.zeros((1, 32), np.uint8))
        assert len(calls) > n0, "tagged hash bypassed the override"
    finally:
        Context.set_hash_compress(None)

    def broken(state, block):
        return H._compress_scan(state, block) ^ np.uint32(1)

    with pytest.raises(RuntimeError):
        Context.set_hash_compress(broken)
    # failed install restores the builtin
    import secp256k1_zkp_tpu.ops.sha256 as H2
    assert H2._COMPRESS_OVERRIDE is None
