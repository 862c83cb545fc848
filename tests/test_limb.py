"""Field/scalar arithmetic parity vs the Python-int oracle.

Mirrors the reference's scalar/field test groups (src/tests.c registry
"scalar", "field"; SURVEY.md §4.1), jitted end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from secp256k1_zkp_tpu.ops import field as F, scalar as S
from secp256k1_zkp_tpu.ops.limb import LB, MASK16, limbs_to_int_np

import oracle

MODS = {"fp": (oracle.P, F.FP), "fn": (oracle.N, S.FN)}


def make_lb(vals):
    arr = np.array([[(v >> (16 * i)) & 0xFFFF for i in range(16)]
                    for v in vals], dtype=np.uint32)
    return LB(jnp.asarray(arr), MASK16)


def to_ints(lb):
    a = np.asarray(lb.v)
    return [limbs_to_int_np(a[i]) for i in range(a.shape[0])]


def rand_vals(rng, mod, n=32):
    out = [int.from_bytes(rng.bytes(32), "big") % mod for _ in range(n - 8)]
    # Edge-biased values, like testrand256_test (src/testrand.h:33-37).
    out += [0, 1, 2, mod - 1, mod - 2, (mod - 1) // 2, 2 ** 255 % mod,
            (2 ** 256 - 1) % mod]
    return out


@pytest.mark.parametrize("name", list(MODS))
def test_ring_ops(rng, name):
    mod, M = MODS[name]
    av = rand_vals(rng, mod)
    bv = rand_vals(rng, mod)
    a, b = make_lb(av), make_lb(bv)

    @jax.jit
    def go(a, b):
        return (M.normalize(M.mul(a, b)),
                M.normalize(M.add(a, b)),
                M.normalize(M.sub(a, b)),
                M.normalize(M.sqr(a)),
                M.normalize(M.half(a)),
                M.normalize(M.neg(a)))

    m, ad, sb, sq, hf, ng = go(a, b)
    assert to_ints(m) == [(x * y) % mod for x, y in zip(av, bv)]
    assert to_ints(ad) == [(x + y) % mod for x, y in zip(av, bv)]
    assert to_ints(sb) == [(x - y) % mod for x, y in zip(av, bv)]
    assert to_ints(sq) == [x * x % mod for x in av]
    inv2 = pow(2, -1, mod)
    assert to_ints(hf) == [x * inv2 % mod for x in av]
    assert to_ints(ng) == [(-x) % mod for x in av]


@pytest.mark.parametrize("name", list(MODS))
def test_inverse(rng, name):
    mod, M = MODS[name]
    av = rand_vals(rng, mod, 16)
    a = make_lb(av)
    r = to_ints(jax.jit(lambda x: M.normalize(M.inv(x)))(a))
    expect = [pow(x, -1, mod) if x else 0 for x in av]
    assert r == expect


def test_mul_chain_deep(rng):
    """Long dependent mul chains keep bounds sound (magnitude discipline)."""
    mod, M = MODS["fp"]
    av = rand_vals(rng, mod, 8)
    a = make_lb(av)

    @jax.jit
    def chain(a):
        x = a
        for _ in range(20):
            x = M.mul(M.add(x, a), M.sub(x, a))
        return M.normalize(x)

    got = to_ints(chain(a))
    exp = list(av)
    for i, v in enumerate(av):
        x = v
        for _ in range(20):
            x = (x + v) * (x - v) % mod
        exp[i] = x
    assert got == exp


def test_sqrt_and_is_square(rng):
    vals = rand_vals(rng, oracle.P, 16)
    a = make_lb(vals)
    sq = jax.jit(F.sqr)(a)
    r, ok = jax.jit(F.sqrt)(sq)
    assert np.asarray(ok).all()
    for got, v in zip(to_ints(F.normalize(r)), vals):
        assert got in (v % oracle.P, (oracle.P - v) % oracle.P)
    issq = np.asarray(jax.jit(F.is_square)(a))
    for got, v in zip(issq, vals):
        exp = v == 0 or pow(v, (oracle.P - 1) // 2, oracle.P) == 1
        assert bool(got) == exp


def test_bytes_roundtrip_and_overflow():
    mod = oracle.P
    vals = [0, 5, mod - 1, mod, mod + 3, 2 ** 256 - 1]
    b = np.array([list(v.to_bytes(32, "big")) for v in vals], dtype=np.uint8)
    x, ovf = jax.jit(F.from_bytes_be)(jnp.asarray(b))
    assert to_ints(x) == [v % mod for v in vals]
    assert list(np.asarray(ovf)) == [v >= mod for v in vals]
    bb = np.asarray(jax.jit(F.to_bytes_be)(x))
    assert [int.from_bytes(bytes(r), "big") for r in bb] == \
        [v % mod for v in vals]


def test_scalar_high_and_cond_negate():
    vals = [1, S.N_HALF, S.N_HALF + 1, oracle.N - 1, 7]
    x = make_lb(vals)
    hi = np.asarray(jax.jit(S.is_high)(x))
    assert list(hi) == [v > S.N_HALF for v in vals]
    neg = jax.jit(lambda a, m: S.normalize(S.cond_negate(a, m)))(
        x, jnp.asarray(hi))
    assert to_ints(neg) == [(oracle.N - v) % oracle.N if v > S.N_HALF else v
                            for v in vals]


def test_get_bits():
    vals = [0x123456789ABCDEF0FEDCBA9876543210 | (1 << 255), 12345]
    x = make_lb(vals)
    for off, cnt in [(0, 4), (4, 8), (12, 16), (120, 8), (252, 4)]:
        got = np.asarray(S.FN.get_bits(x, off, cnt))
        exp = [(v >> off) & ((1 << cnt) - 1) for v in vals]
        assert list(got) == exp, (off, cnt)
