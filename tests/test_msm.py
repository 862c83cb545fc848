"""MSM engines + multi-device sharded MSM on the virtual CPU mesh
(parity vs oracle; mirrors ecmult_multi tests and exercises the
cross-device EC reduction of SURVEY.md §2.3.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from secp256k1_zkp_tpu.ops import field as F, group as G, msm
from secp256k1_zkp_tpu.ops.limb import LB, MASK16, limbs_to_int_np
from secp256k1_zkp_tpu.parallel.mesh import make_mesh, BATCH_AXIS
from secp256k1_zkp_tpu.parallel.msm_sharded import msm_sharded

import oracle


def mk_lb(vals):
    return LB(jnp.asarray(np.array(
        [[(v >> (16 * i)) & 0xFFFF for i in range(16)] for v in vals],
        dtype=np.uint32)), MASK16)


def mk_ge(pts):
    return G.GE(mk_lb([0 if p is None else p[0] for p in pts]),
                mk_lb([0 if p is None else p[1] for p in pts]),
                jnp.asarray([p is None for p in pts]))


def msm_case(rng, n):
    ks = [int.from_bytes(rng.bytes(32), "big") % oracle.N for _ in range(n)]
    ks[0] = 0  # zero scalar lane
    pts = [oracle.point_mul(i * 7 + 1, oracle.G) for i in range(n)]
    expect = None
    for k, p in zip(ks, pts):
        expect = oracle.point_add(expect, oracle.point_mul(k, p))
    return ks, pts, expect


def check(total, expect):
    got = jax.jit(G.ge_from_gej)(total)
    if expect is None:
        assert bool(np.asarray(got.inf))
        return
    x = limbs_to_int_np(np.asarray(F.normalize(got.x).v))
    y = limbs_to_int_np(np.asarray(F.normalize(got.y).v))
    assert (x, y) == expect


def test_msm_simple(rng):
    ks, pts, expect = msm_case(rng, 5)
    check(jax.jit(msm.msm_simple)(mk_lb(ks), mk_ge(pts)), expect)


def test_msm_windowed(rng):
    ks, pts, expect = msm_case(rng, 6)
    check(jax.jit(msm.msm_windowed)(mk_lb(ks), mk_ge(pts)), expect)


def test_msm_sharded_8dev(rng):
    n_dev = len(jax.devices())
    n = 2 * n_dev
    ks, pts, expect = msm_case(rng, n)
    mesh = make_mesh()
    total = jax.jit(lambda k, p: msm_sharded(mesh, k, p))(
        mk_lb(ks), mk_ge(pts))
    check(total, expect)


def test_msm_pippenger_small(rng):
    """Bucketed Pippenger vs the python oracle at a forced tiny window
    (exercises sort + segmented scan + bucket reduce on CPU)."""
    ks, pts, expect = msm_case(rng, 13)
    check(jax.jit(lambda k, p: msm.msm_pippenger(k, p, c=5))(
        mk_lb(ks), mk_ge(pts)), expect)


def test_msm_pippenger_with_infinity_points(rng):
    ks = [int.from_bytes(rng.bytes(32), "big") % oracle.N
          for _ in range(9)]
    pts = [oracle.point_mul(i * 3 + 2, oracle.G) for i in range(7)]
    pts += [None, None]
    expect = None
    for k, p in zip(ks, pts):
        if p is not None:
            expect = oracle.point_add(expect, oracle.point_mul(k, p))
    check(jax.jit(lambda k, p: msm.msm_pippenger(k, p, c=4))(
        mk_lb(ks), mk_ge(pts)), expect)


def test_pippenger_window_table():
    # cost-model window choice is monotone-ish and in range
    last = 4
    for n in [16, 128, 1024, 1 << 14, 1 << 17, 1 << 20]:
        c = msm.pippenger_window(n)
        assert 4 <= c <= 16
        assert c >= last
        last = c


def test_tree_reduce_with_infinities(rng):
    pts = [oracle.point_mul(k + 1, oracle.G) for k in range(5)]
    pts += [None, None, None]  # infinity lanes
    expect = None
    for p in pts:
        expect = oracle.point_add(expect, p)
    ge = mk_ge(pts)
    total = jax.jit(lambda p: msm._tree_reduce(G.gej_from_ge(p)))(ge)
    check(total, expect)


@__import__("pytest").mark.slow
def test_msm_pippenger_above_dispatch_threshold(rng):
    """1250 points — above the windowed->Pippenger crossover, so this
    exercises the real bucketed engine through ecmult_multi dispatch
    (the scale tier; TPU runs 2^10..2^20 in test_pallas_tpu.py)."""
    n = 1250
    a = [int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
         for _ in range(n)]
    ks = [int.from_bytes(rng.bytes(32), "big") % oracle.N
          for _ in range(n)]
    ks[7] = 0
    pts = [oracle.point_mul(ai, oracle.G) for ai in a]
    expect = oracle.point_mul(
        sum(k * ai for k, ai in zip(ks, a)) % oracle.N, oracle.G)
    total = jax.jit(msm.ecmult_multi)(mk_lb(ks), mk_ge(pts))
    check(total, expect)
