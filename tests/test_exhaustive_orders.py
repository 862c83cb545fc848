"""Exhaustive checks on the OTHER tiny-order test groups (7 and 199)
plus the exhaustive ecmult_multi sweep — completing the reference's
three-order model checking (src/group_impl.h:17-64 sage-generated
generators; src/tests_exhaustive.c:136-196,390-464).

test_exhaustive_protocols.py runs the deep protocol sweeps at order 13;
this file re-runs the engine-level sweeps at orders 7 (fast) and 199
(slow, subsampled point set like the reference's skip logic) and routes
every (k1, k2) pair through ops/msm.ecmult_multi.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from secp256k1_zkp_tpu.ops import ecmult, field as F, group as G, msm
from secp256k1_zkp_tpu.ops.limb import LB, MASK16, limbs_to_int_np
from secp256k1_zkp_tpu.ops.small_scalar import SmallScalar
from secp256k1_zkp_tpu.modules import ecdsa

P = F.P

# sage-generated tiny-order generators (src/group_impl.h:17-34; public
# constants, group law re-verified from scratch in the fixture below).
GENS = {
    7: (6,  # y^2 = x^3 + 6
        0x66625d13317ffe4463d32cff1ca02b9be5c6d07050b4b05e81cc30dbf5166f0a,
        0x1e60e897a7c00c7c2df53eb698274ff464252f428ca44e173b25418cff4ab0cf),
    13: (2,
         0xa2482ff84bf34edfa51262fde57921dbe0dd2cb7a5914790bc71631fc09704fb,
         0x942536cba3e494923a701cc3ee3e443fdf182aa915b8aa6a166d3b19ba84b045),
    199: (4,
          0x7fb07b5cd07c3bda553902e27a87ea2c35108a7f051f41e5b76abad51f2703ad,
          0x0a2515395b4c4438952a634fac10dd4d6d6f474598990c273a4f3116d32ff969),
}


def _host_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2 and (y1 + y2) % P == 0:
        return None
    if a == b:
        lam = (3 * x1 * x1) * pow(2 * y1, P - 2, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, P - 2, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


@pytest.fixture(scope="module",
                params=[7, pytest.param(199, marks=pytest.mark.slow)])
def octx(request):
    """(order, curve_b, group list, GenTable) with the group law
    re-verified from scratch."""
    order = request.param
    b, gx, gy = GENS[order]
    assert (gy * gy - gx ** 3 - b) % P == 0
    pts = [None]
    cur = None
    g = (gx, gy)
    for _ in range(order - 1):
        cur = _host_add(cur, g)
        pts.append(cur)
    assert _host_add(cur, g) is None, f"generator order != {order}"
    assert len({p for p in pts if p}) == order - 1
    return order, b, pts, ecmult.GenTable(gen=(gx, gy))


def mk_sc(vals, order):
    arr = np.zeros((len(vals), 16), np.uint32)
    arr[:, 0] = np.asarray(vals, np.uint32) % order
    return LB(jnp.asarray(arr), MASK16)


def mk_ge(idx, group, order):
    xs = np.zeros((len(idx), 16), np.uint32)
    ys = np.zeros((len(idx), 16), np.uint32)
    infs = np.zeros(len(idx), bool)
    for k, i in enumerate(idx):
        if group[i % order] is None:
            infs[k] = True
            continue
        x, y = group[i % order]
        for l in range(16):
            xs[k, l] = (x >> (16 * l)) & 0xFFFF
            ys[k, l] = (y >> (16 * l)) & 0xFFFF
    return G.GE(LB(jnp.asarray(xs), MASK16), LB(jnp.asarray(ys), MASK16),
                jnp.asarray(infs))


def assert_points(j, expect_idx, group, order):
    a = jax.jit(G.ge_from_gej)(j)
    xs = np.asarray(F.normalize(a.x).v)
    ys = np.asarray(F.normalize(a.y).v)
    infs = np.asarray(a.inf)
    for lane, ei in enumerate(expect_idx):
        want = group[ei % order]
        if want is None:
            assert infs[lane], lane
        else:
            assert not infs[lane], lane
            assert (limbs_to_int_np(xs[lane]),
                    limbs_to_int_np(ys[lane])) == want, lane


def test_exhaustive_ecmult(octx):
    """u1*G + u2*P sweep (test_exhaustive_ecmult,
    tests_exhaustive.c:136).  Order 7: full (i, j, P) cube; order 199:
    full (i, j) grid against a strided point sample (the reference's
    skip-factor shape, tests_exhaustive.c:43-52)."""
    order, b, group, table = octx
    r_logs = (range(1, order) if order < 20 else [1, 3, 100, order - 2])
    lanes = [(i, j, r_log)
             for r_log in r_logs
             for j in range(order)
             for i in range(order)]
    u2 = mk_sc([l[0] for l in lanes], order)
    u1 = mk_sc([l[1] for l in lanes], order)
    pts = mk_ge([l[2] for l in lanes], group, order)
    got = jax.jit(lambda a, c, p: ecmult.ecmult(a, c, p, table))(u1, u2,
                                                                 pts)
    assert_points(got, [(i * r + j) % order for i, j, r in lanes], group,
                  order)


def test_exhaustive_ecmult_multi(octx):
    """Every (k1, k2) pair through the MSM dispatcher
    (test_exhaustive_ecmult_multi, tests_exhaustive.c:158-196): checks
    sum(k_i * P_i) over two strided point streams."""
    order, b, group, table = octx
    if order > 20:
        pairs = [(i, j) for i in range(0, order, 13)
                 for j in range(0, order, 17)]
    else:
        pairs = [(i, j) for i in range(order) for j in range(order)]
    p1, p2 = 1, 2
    ks = LB(jnp.stack([mk_sc([a for a, _ in pairs], order).v,
                       mk_sc([c for _, c in pairs], order).v], axis=0),
            MASK16)
    pts = G.GE(
        LB(jnp.stack([mk_ge([p1] * len(pairs), group, order).x.v,
                      mk_ge([p2] * len(pairs), group, order).x.v]),
           MASK16),
        LB(jnp.stack([mk_ge([p1] * len(pairs), group, order).y.v,
                      mk_ge([p2] * len(pairs), group, order).y.v]),
           MASK16),
        jnp.zeros((2, len(pairs)), bool))
    got = jax.jit(msm.ecmult_multi)(ks, pts)
    assert_points(got, [(a * p1 + c * p2) % order for a, c in pairs],
                  group, order)


@pytest.mark.slow
def test_msm_pippenger_tiny_group(octx):
    """The bucketed Pippenger engine over >threshold tiny-order points
    (the dispatcher's large-n path) against the host sum."""
    order, b, group, table = octx
    n = 1100
    rng = np.random.default_rng(order)
    kv = rng.integers(0, order, n)
    pv = rng.integers(1, order, n)
    ks = mk_sc(list(kv), order)
    pts = mk_ge(list(pv), group, order)
    got = jax.jit(msm.msm_pippenger)(ks, pts)
    expect = sum(int(k) * int(p) for k, p in zip(kv, pv)) % order
    assert_points(G.GEJ(LB(got.x.v[None], MASK16),
                        LB(got.y.v[None], MASK16),
                        LB(got.z.v[None], MASK16), got.inf[None]),
                  [expect], group, order)


def test_exhaustive_ecdsa_verify_sample(octx):
    """ECDSA acceptance predicate at the non-13 orders (strided sample
    of the (s, r, m, d) space at 199; full at 7) — the engine-level
    slice of test_exhaustive_verify (tests_exhaustive.c:236)."""
    order, b, group, table = octx
    small = SmallScalar(order)
    step = 1 if order < 20 else 23
    lanes = [(s, r, m, d)
             for s in range(1, order, step)
             for r in range(1, order, step)
             for m in range(1, order, step)
             for d in range(1, order, step)]
    s = mk_sc([l[0] for l in lanes], order)
    r = mk_sc([l[1] for l in lanes], order)
    m = mk_sc([l[2] for l in lanes], order)
    pub = mk_ge([l[3] for l in lanes], group, order)
    got = np.asarray(jax.jit(lambda m, r, s, pub: ecdsa.verify_scalars(
        m, r, s, pub, table, sc=small))(m, r, s, pub))
    r_of_k = [0 if group[k] is None else group[k][0] % order
              for k in range(order)]
    for lane, (si, ri, mi, di) in enumerate(lanes):
        should = any(r_of_k[k] == ri and (k * si) % order ==
                     (mi + ri * di) % order for k in range(order))
        should = should and not si > (order - 1) // 2
        assert got[lane] == should, (lane, si, ri, mi, di)
