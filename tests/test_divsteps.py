"""Parity tests for the batched safegcd divsteps inverse
(ops/pallas_divsteps.py) against python pow().

These functions are plain jnp on limb-vector lists (the kernel-internal
representation), so they run on CPU directly — the Mosaic kernels that
embed them are covered by tests/test_pallas_tpu.py on hardware.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from secp256k1_zkp_tpu.ops import pallas_divsteps as DS
from secp256k1_zkp_tpu.utils import hostcurve

P = hostcurve.P
N = hostcurve.N


def _to_rows(vals):
    """python ints -> 16 x [B] uint32 16-bit limb vectors."""
    B = len(vals)
    rows = np.zeros((16, B), np.uint32)
    for j, v in enumerate(vals):
        for i in range(16):
            rows[i, j] = (v >> (16 * i)) & 0xFFFF
    return [jnp.asarray(rows[i]) for i in range(16)]


def _from_rows(rows):
    arr = np.stack([np.asarray(r) for r in rows])  # [16, B]
    out = []
    for j in range(arr.shape[1]):
        v = 0
        for i in reversed(range(16)):
            v = (v << 16) | int(arr[i, j])
        out.append(v)
    return out


@pytest.mark.parametrize("mod", [P, N], ids=["p", "n"])
def test_inv_divsteps_edges_and_random(mod, rng):
    vals = [0, 1, 2, 3, mod - 1, mod - 2, (mod - 1) // 2, 2 ** 255 % mod,
            0xFFFF, 0x10000, 2 ** 128, 2 ** 129 - 1]
    vals += [int.from_bytes(rng.bytes(32), "big") % mod for _ in range(52)]
    got = _from_rows(DS.inv_limbs16(_to_rows(vals), mod))
    for v, g in zip(vals, got):
        want = pow(v, -1, mod) if v else 0
        assert g == want, hex(v)


def test_conversion_roundtrip(rng):
    vals = [int.from_bytes(rng.bytes(32), "big") for _ in range(16)]
    x15 = DS._from16(_to_rows(vals))
    back = _from_rows([v.astype(jnp.uint32) for v in DS._to16(
        [v.astype(jnp.int32) for v in x15])])
    assert back == vals
