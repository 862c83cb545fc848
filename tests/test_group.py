"""Group-law parity vs the Python-int oracle, including every degenerate
case the reference's complete-add formula covers (src/group_impl.h:732):
P+Q, P+P, P+(-P), inf+P, P+inf, inf+inf.  Mirrors the "group"/"ecmult"
test registries of src/tests.c (SURVEY.md §4.1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from secp256k1_zkp_tpu.ops import field as F, group as G
from secp256k1_zkp_tpu.ops.limb import LB, MASK16, limbs_to_int_np

import oracle


def pts_to_ge(pts):
    xs, ys, infs = [], [], []
    for p in pts:
        if p is oracle.INF:
            xs.append(0); ys.append(0); infs.append(True)
        else:
            xs.append(p[0]); ys.append(p[1]); infs.append(False)
    mk = lambda vals: LB(jnp.asarray(np.array(
        [[(v >> (16 * i)) & 0xFFFF for i in range(16)] for v in vals],
        dtype=np.uint32)), MASK16)
    return G.GE(mk(xs), mk(ys), jnp.asarray(infs))


def gej_to_pts(j: G.GEJ):
    a = jax.jit(G.ge_from_gej)(j)
    xs = np.asarray(F.normalize(a.x).v)
    ys = np.asarray(F.normalize(a.y).v)
    infs = np.asarray(a.inf)
    out = []
    for i in range(len(infs)):
        if infs[i]:
            out.append(oracle.INF)
        else:
            out.append((limbs_to_int_np(xs[i]), limbs_to_int_np(ys[i])))
    return out


def random_points(rng, n):
    ks = [int.from_bytes(rng.bytes(32), "big") % oracle.N for _ in range(n)]
    return [oracle.point_mul(k, oracle.G) for k in ks]


def test_add_complete_cases(rng):
    pa = random_points(rng, 4)
    pb = random_points(rng, 4)
    # degenerate lanes: P+P (double), P+(-P) (infinity), inf+P, P+inf, inf+inf
    pa += [pa[0], pa[1], oracle.INF, pb[2], oracle.INF, oracle.G]
    pb += [pa[0], oracle.point_neg(pa[1]), pb[0], oracle.INF, oracle.INF,
           oracle.point_neg((oracle.G[0], oracle.G[1]))]
    a, b = pts_to_ge(pa), pts_to_ge(pb)

    out = jax.jit(lambda a, b: G.gej_add_ge(G.gej_from_ge(a), b))(a, b)
    expect = [oracle.point_add(x, y) for x, y in zip(pa, pb)]
    assert gej_to_pts(out) == expect

    out2 = jax.jit(
        lambda a, b: G.gej_add(G.gej_from_ge(a), G.gej_from_ge(b)))(a, b)
    assert gej_to_pts(out2) == expect


def test_add_nontrivial_z(rng):
    """gej_add with distinct non-one z on both sides: compute (2A)+(2B)
    where doubling produces z != 1."""
    pa = random_points(rng, 6)
    pb = random_points(rng, 6)
    a, b = pts_to_ge(pa), pts_to_ge(pb)

    @jax.jit
    def go(a, b):
        ja = G.gej_double(G.gej_from_ge(a))
        jb = G.gej_double(G.gej_from_ge(b))
        return G.gej_add(ja, jb)

    got = gej_to_pts(go(a, b))
    expect = [oracle.point_add(oracle.point_add(x, x),
                               oracle.point_add(y, y))
              for x, y in zip(pa, pb)]
    assert got == expect


def test_double(rng):
    pts = random_points(rng, 6) + [oracle.INF]
    a = pts_to_ge(pts)
    out = jax.jit(lambda a: G.gej_double(G.gej_from_ge(a)))(a)
    assert gej_to_pts(out) == [oracle.point_add(p, p) for p in pts]


def test_double_chain(rng):
    """Iterated doubling: 2^k P, exercising repeated non-one z."""
    pts = random_points(rng, 4)
    a = pts_to_ge(pts)

    @jax.jit
    def go(a):
        j = G.gej_from_ge(a)
        def body(j, _):
            return G.gej_double(j), None
        j, _ = jax.lax.scan(body, j, None, length=10)
        return j

    got = gej_to_pts(go(a))
    assert got == [oracle.point_mul(1024, p) for p in pts]


def test_add_zinv(rng):
    """Effective-affine add: B stored as (x*w^2, y*w^3) with bzinv=w."""
    pa = random_points(rng, 4) + [oracle.INF]
    pb = random_points(rng, 5)
    ws = [int.from_bytes(rng.bytes(32), "big") % oracle.P or 1
          for _ in range(5)]
    # b_eff coords: B has jacobian (bx, by, 1/w)  =>  bx = Bx/w^2... i.e.
    # stored bx = Bx * (1/w)^-2 = Bx * w^... (x = X/Z^2 => X = x*Z^2 = x/w^2)
    eff = []
    for (Bx, By), w in zip(pb, ws):
        w2 = pow(w, -2, oracle.P)
        eff.append((Bx * w2 % oracle.P, By * w2 * pow(w, -1, oracle.P) % oracle.P))
    a = pts_to_ge(pa)
    b = pts_to_ge(eff)
    wlb = LB(jnp.asarray(np.array(
        [[(v >> (16 * i)) & 0xFFFF for i in range(16)] for v in ws],
        dtype=np.uint32)), MASK16)
    out = jax.jit(lambda a, b, w: G.gej_add_zinv(G.gej_from_ge(a), b, w))(
        a, b, wlb)
    assert gej_to_pts(out) == [oracle.point_add(x, y)
                               for x, y in zip(pa, pb)]


def test_on_curve_and_neg(rng):
    pts = random_points(rng, 4)
    a = pts_to_ge(pts)
    assert np.asarray(jax.jit(G.ge_is_on_curve)(a)).all()
    bad = G.GE(a.x, F.add(a.y, F.fe(1)), a.inf)
    assert not np.asarray(jax.jit(G.ge_is_on_curve)(bad)).any()
    n = jax.jit(G.ge_neg)(a)
    got = gej_to_pts(jax.jit(G.gej_from_ge)(n))
    assert got == [oracle.point_neg(p) for p in pts]


def test_batch_affine(rng):
    pts = random_points(rng, 8)
    a = pts_to_ge(pts)

    @jax.jit
    def go(a):
        j = G.gej_double(G.gej_from_ge(a))  # non-trivial z
        return G.ge_from_gej_batch(j)

    out = go(a)
    xs = np.asarray(F.normalize(out.x).v)
    ys = np.asarray(F.normalize(out.y).v)
    exp = [oracle.point_add(p, p) for p in pts]
    for i, e in enumerate(exp):
        assert (limbs_to_int_np(xs[i]), limbs_to_int_np(ys[i])) == e


def test_gej_eq_x(rng):
    pts = random_points(rng, 4)
    a = pts_to_ge(pts)

    @jax.jit
    def go(a):
        j = G.gej_double(G.gej_from_ge(a))
        xs = [oracle.point_add(p, p)[0] for p in pts]
        xlb = LB(jnp.asarray(np.array(
            [[(v >> (16 * i)) & 0xFFFF for i in range(16)] for v in xs],
            dtype=np.uint32)), MASK16)
        return G.gej_eq_x(j, xlb), G.gej_eq_x(j, F.fe(123))

    ok, bad = go(a)
    assert np.asarray(ok).all() and not np.asarray(bad).any()
