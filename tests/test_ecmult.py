"""Scalar-multiplication engine parity vs the oracle (mirrors the
"ecmult" registry tests: ecmult_chain etc., src/tests.c:4617)."""

import jax
import jax.numpy as jnp
import numpy as np

from secp256k1_zkp_tpu.ops import ecmult, field as F, group as G
from secp256k1_zkp_tpu.ops.limb import LB, MASK16, limbs_to_int_np

import oracle


def mk_lb(vals):
    return LB(jnp.asarray(np.array(
        [[(v >> (16 * i)) & 0xFFFF for i in range(16)] for v in vals],
        dtype=np.uint32)), MASK16)


def mk_ge(pts):
    xs = [0 if p is None else p[0] for p in pts]
    ys = [0 if p is None else p[1] for p in pts]
    return G.GE(mk_lb(xs), mk_lb(ys),
                jnp.asarray([p is None for p in pts]))


def out_pts(j):
    a = jax.jit(G.ge_from_gej)(j)
    xs, ys = np.asarray(F.normalize(a.x).v), np.asarray(F.normalize(a.y).v)
    infs = np.asarray(a.inf)
    return [None if infs[i] else (limbs_to_int_np(xs[i]),
                                  limbs_to_int_np(ys[i]))
            for i in range(len(infs))]


def rand_scalars(rng, n):
    ks = [int.from_bytes(rng.bytes(32), "big") % oracle.N
          for _ in range(n - 3)]
    return ks + [0, 1, oracle.N - 1]


def test_ecmult_gen(rng):
    ks = rand_scalars(rng, 8)
    got = out_pts(jax.jit(ecmult.ecmult_gen)(mk_lb(ks)))
    exp = [oracle.point_mul(k, oracle.G) for k in ks]
    assert got == exp


def test_ecmult_const(rng):
    ks = rand_scalars(rng, 7)
    base_ks = [int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
               for _ in range(7)]
    pts = [oracle.point_mul(b, oracle.G) for b in base_ks]
    got = out_pts(jax.jit(ecmult.ecmult_const)(mk_lb(ks), mk_ge(pts)))
    exp = [oracle.point_mul(k, p) for k, p in zip(ks, pts)]
    assert got == exp


def test_ecmult_double_scalar(rng):
    u1 = rand_scalars(rng, 6)
    u2 = rand_scalars(rng, 6)[::-1]
    base_ks = [int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
               for _ in range(6)]
    pts = [oracle.point_mul(b, oracle.G) for b in base_ks]
    got = out_pts(jax.jit(ecmult.ecmult)(mk_lb(u1), mk_lb(u2), mk_ge(pts)))
    exp = [oracle.point_add(oracle.point_mul(a, oracle.G),
                            oracle.point_mul(b, p))
           for a, b, p in zip(u1, u2, pts)]
    assert got == exp


def test_ecmult_chain(rng):
    """Iterated composition like the reference's ecmult_chain: verify
    k1*(k2*G) == (k1*k2)*G through the const engine."""
    k1 = [int.from_bytes(rng.bytes(32), "big") % oracle.N for _ in range(4)]
    k2 = [int.from_bytes(rng.bytes(32), "big") % oracle.N for _ in range(4)]
    p2 = [oracle.point_mul(k, oracle.G) for k in k2]
    got = out_pts(jax.jit(ecmult.ecmult_const)(mk_lb(k1), mk_ge(p2)))
    exp = [oracle.point_mul(a * b % oracle.N, oracle.G)
           for a, b in zip(k1, k2)]
    assert got == exp


def test_ecmult_const_xonly(rng):
    """Sqrt-free x-only ladder vs the oracle (ecmult_const_xonly,
    src/ecmult_const_impl.h:268): random on-curve x values, both y
    parities give the same |x| result; off-curve x is rejected."""
    ks = rand_scalars(rng, 6)[:5] + [1]
    base_ks = [int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
               for _ in range(6)]
    pts = [oracle.point_mul(b, oracle.G) for b in base_ks]
    xs = mk_lb([p[0] for p in pts])
    x_out, ok = jax.jit(
        lambda k, x: ecmult.ecmult_const_xonly(k, x))(mk_lb(ks), xs)
    okn = np.asarray(ok)
    got = np.asarray(x_out.v)
    for i, (k, p) in enumerate(zip(ks, pts)):
        exp = oracle.point_mul(k, p)
        if exp is None:  # k == 0 rejected
            assert not okn[i]
            continue
        assert okn[i]
        assert limbs_to_int_np(got[i]) == exp[0], i


def test_ecmult_const_xonly_off_curve(rng):
    """x not on the curve must be flagged when known_on_curve=False."""
    # find an x whose x^3+7 is not a QR
    P = oracle.P
    x = 1
    while pow(pow(x, 3, P) + 7, (P - 1) // 2, P) == 1:
        x += 1
    ks = mk_lb([5, 7])
    xs = mk_lb([x, x])
    _, ok = jax.jit(
        lambda k, v: ecmult.ecmult_const_xonly(k, v))(ks, xs)
    assert not np.asarray(ok).any()
