"""GLV lambda-split correctness (the scalar decomposition feeding the
fused TPU verify kernels; reference algorithm: scalar_split_lambda,
src/scalar_impl.h:127-181 with the bounds proof at :183-287).

These run the kernel *helper functions* directly on CPU — they are pure
elementwise jnp dataflow, so the exact same code path the Mosaic kernel
traces is checked against big-int ground truth here.
"""

import numpy as np
import jax.numpy as jnp

from secp256k1_zkp_tpu.ops import pallas_scalar as PS

N = PS.N_ORDER
LAM = PS.LAMBDA


def _to_int(limbs):
    b = np.asarray(limbs[0]).shape[0]
    out = np.zeros(b, object)
    for i, l in enumerate(limbs):
        out += np.asarray(l).astype(object) << (16 * i)
    return out


def _k_limbs(ks):
    return [jnp.asarray(np.array([(k >> (16 * i)) & 0xFFFF for k in ks],
                                 np.uint32)) for i in range(16)]


def _edge_scalars(rng, n_random=48):
    ks = [int.from_bytes(rng.bytes(32), "big") % N for _ in range(n_random)]
    ks += [0, 1, 2, N - 1, N - 2, PS._N_HALF, PS._N_HALF + 1,
           2 ** 128, 2 ** 128 - 1, 2 ** 128 + 1, LAM, N - LAM,
           (LAM * LAM) % N]
    return ks


def test_mul_shift384_round(rng):
    ks = _edge_scalars(rng)
    kl = _k_limbs(ks)
    for g in (PS._G1, PS._G2):
        got = _to_int(PS._mul_shift384_round(kl, g))
        want = np.array([(k * g + (1 << 383)) >> 384 for k in ks], object)
        assert (got == want).all()


def test_glv_split_relation_and_bounds(rng):
    ks = _edge_scalars(rng)
    kl = _k_limbs(ks)
    a1, n1, a2, n2 = PS._glv_split(kl)
    a1i, a2i = _to_int(a1), _to_int(a2)
    n1 = np.asarray(n1)
    n2 = np.asarray(n2)
    for j, k in enumerate(ks):
        r1 = (-int(a1i[j])) % N if n1[j] else int(a1i[j])
        r2 = (-int(a2i[j])) % N if n2[j] else int(a2i[j])
        assert (r1 + LAM * r2) % N == k
        # the reference's proven bound (scalar_impl.h:135-141)
        assert int(a1i[j]) < 2 ** 128 and int(a2i[j]) < 2 ** 128


def test_digits128_msb(rng):
    ks = _edge_scalars(rng, n_random=16)
    kl = _k_limbs(ks)
    a1, _, _, _ = PS._glv_split(kl)
    digs = PS._digits128_msb(a1)
    assert len(digs) == 32
    v = np.zeros(len(ks), object)
    for d in digs:
        v = v * 16 + np.asarray(d).astype(object)
    assert (v == _to_int(a1)).all()


def test_recode_w5(rng):
    from secp256k1_zkp_tpu.ops.pallas_scalar import recode_w5, NW5
    vals = [int.from_bytes(rng.bytes(16), "big") for _ in range(48)]
    vals += [0, 1, 2 ** 128 - 1, 16, 17, 31, 32, 33 * 32 ** 10]
    B = len(vals)
    l8 = [jnp.asarray(np.array([(v >> (16 * i)) & 0xFFFF for v in vals],
                               np.uint32)) for i in range(8)]
    digs = recode_w5(l8)
    assert len(digs) == NW5
    acc = np.zeros(B, object)
    for d in digs:                        # MSB-first
        d = np.asarray(d)
        mag = (d & 0xFF).astype(object)
        sgn = (d >> 8).astype(object)
        assert (d & 0xFF).max() <= 16
        acc = acc * 32 + np.where(sgn == 1, -mag, mag)
    for j, v in enumerate(vals):
        assert int(acc[j]) == v


def test_glv_constants():
    # lambda and beta are the primitive cube roots tied by the lattice:
    # a1 + b1*lambda === 0 (mod n) for the reduced basis row.
    assert pow(LAM, 3, N) == 1 and LAM != 1
    b2 = N - PS._MINUS_B2
    a1 = 0x3086D221A7D46BCDE86C90E49284EB15
    assert a1 == b2  # a1 == b2 for this curve's reduced basis
    assert (a1 - PS._MINUS_B1 * LAM) % N == 0
