"""Multi-scalar multiplication (MSM): R = sum_i k_i * P_i (+ q*G).

Counterpart of secp256k1_ecmult_multi_var (src/ecmult_impl.h:823) —
the engine behind BPPP, halfagg and batch verification.  Three
single-device strategies plus a dispatcher, mirroring the reference's
dispatch structure (Strauss below 88 points, Pippenger above,
ecmult_impl.h:55):

* :func:`msm_simple` — per-lane windowed multiplies + an EC tree
  reduction (analogue of ecmult_multi_simple_var, ecmult_impl.h:779).
  O(B * 64) window adds; optimal for tiny B.
* :func:`msm_windowed` — shared-doubling windowed sum: one 4-bit window
  of EVERY point is added per doubling round.  ~84 complete adds per
  point; best in the mid range (the per-lane 16-entry tables amortize).
* :func:`msm_pippenger` — true bucketed Pippenger
  (ecmult_pippenger_wnaf, ecmult_impl.h:516): per window, points are
  SORTED by their c-bit digit and per-bucket sums are built with a
  work-efficient segmented scan (2N complete adds, all in the Pallas
  add kernel on TPU), then the classic running-sum bucket reduction
  (ecmult_impl.h:572-588).  (256/c)(2N + 3*2^c) adds total — the
  scatter of the reference becomes sort + segmented-scan, the only
  bucket-accumulation shape that is both work-efficient and
  data-independent on a vector machine.
* :func:`ecmult_multi` — size dispatch across the three, plus the
  TPU fast path: on Pallas backends, 1-D batches above 256 points
  route to the fused windowed-table engine (``ops/pallas_msm.py``,
  ~11x the sort+scan path on v5e — see docs/PERF.md round 5); the
  engines here remain the portable/CPU reference and the
  multi-device building block.

Multi-device sharding lives in ``parallel/msm_sharded.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import ecmult
from . import field as F
from . import group as G
from . import scalar as S
from .limb import LB, MASK16


def _tree_reduce(pts: G.GEJ, axis: int = 0) -> G.GEJ:
    """EC sum over ``axis`` via pairwise halving: log2(B) complete adds.

    psum can't add curve points (EC addition is not elementwise —
    SURVEY.md §5 note), so reductions are explicit add trees."""
    def move(lb, src, dst):
        return LB(jnp.moveaxis(lb.v, src, dst), lb.bound)

    cur = G.GEJ(move(pts.x, axis, 0), move(pts.y, axis, 0),
                move(pts.z, axis, 0), jnp.moveaxis(pts.inf, axis, 0))
    n = cur.inf.shape[0]
    if n > 2 and ecmult._window() == 1:
        # Compile-small shape (config.jnp_window=1, multichip dryrun /
        # 1-core CI): a sequential lax.scan traces ONE general-add body
        # instead of log2(n) inlined ones.  The pairwise tree below is
        # the throughput shape (log depth, full lanes).
        def norm(p):
            return (F.FP.norm_if_needed(p.x).v, F.FP.norm_if_needed(p.y).v,
                    F.FP.norm_if_needed(p.z).v, p.inf)

        def body(c, x):
            s = G.gej_add(
                G.GEJ(LB(c[0], MASK16), LB(c[1], MASK16),
                      LB(c[2], MASK16), c[3]),
                G.GEJ(LB(x[0], MASK16), LB(x[1], MASK16),
                      LB(x[2], MASK16), x[3]))
            return norm(s), None

        first = G.GEJ(LB(cur.x.v[0], cur.x.bound),
                      LB(cur.y.v[0], cur.y.bound),
                      LB(cur.z.v[0], cur.z.bound), cur.inf[0])
        rest = (F.FP.norm_if_needed(cur.x).v[1:],
                F.FP.norm_if_needed(cur.y).v[1:],
                F.FP.norm_if_needed(cur.z).v[1:], cur.inf[1:])
        out, _ = jax.lax.scan(body, norm(first), rest)
        return G.GEJ(LB(out[0], MASK16), LB(out[1], MASK16),
                     LB(out[2], MASK16), out[3])
    while n > 1:
        half = (n + 1) // 2
        lo = G.GEJ(LB(cur.x.v[:n // 2 * 2:2], cur.x.bound),
                   LB(cur.y.v[:n // 2 * 2:2], cur.y.bound),
                   LB(cur.z.v[:n // 2 * 2:2], cur.z.bound),
                   cur.inf[:n // 2 * 2:2])
        hi = G.GEJ(LB(cur.x.v[1::2], cur.x.bound),
                   LB(cur.y.v[1::2], cur.y.bound),
                   LB(cur.z.v[1::2], cur.z.bound),
                   cur.inf[1::2])
        summed = G.gej_add(lo, hi)
        if n % 2:
            # append the odd leftover lane
            summed = G.GEJ(
                LB(jnp.concatenate([F.FP.norm_if_needed(summed.x).v,
                                    F.FP.norm_if_needed(cur.x).v[-1:]], 0),
                   MASK16),
                LB(jnp.concatenate([F.FP.norm_if_needed(summed.y).v,
                                    F.FP.norm_if_needed(cur.y).v[-1:]], 0),
                   MASK16),
                LB(jnp.concatenate([F.FP.norm_if_needed(summed.z).v,
                                    F.FP.norm_if_needed(cur.z).v[-1:]], 0),
                   MASK16),
                jnp.concatenate([summed.inf, cur.inf[-1:]], 0))
        cur = summed
        n = cur.inf.shape[0]
    return G.GEJ(LB(cur.x.v[0], cur.x.bound), LB(cur.y.v[0], cur.y.bound),
                 LB(cur.z.v[0], cur.z.bound), cur.inf[0])


def msm_simple(ks: LB, pts: G.GE, axis: int = 0) -> G.GEJ:
    """sum k_i * P_i via per-lane multiplies + tree reduction."""
    prods = ecmult.ecmult_const(ks, pts)
    return _tree_reduce(prods, axis)


def msm_windowed(ks: LB, pts: G.GE) -> G.GEJ:
    """Shared-doubling windowed MSM over the LEADING axis; any trailing
    axes are independent batched MSMs (the halfagg/musig batched-
    aggregate shape).

    acc := 16*acc + sum_i digit_w(k_i)*P_i  per window w (MSB-first);
    the inner sum is a tree of complete adds over gathered per-lane
    multiples (d*P_i from each lane's 16-entry table)."""
    window = ecmult._window()
    ks = S.FN.norm_weak(ks) if ks.bound > MASK16 else ks
    tx, ty, tinf = ecmult._pt_table(pts, window)  # [T, n, ..., 16limbs]
    digits = ecmult.scalar_digits(ks, window)     # [n, ..., W] LSB-first
    digs = jnp.moveaxis(digits, -1, 0)[::-1]      # [W, n, ...] MSB-first
    acc0 = G.gej_infinity(ks.batch_shape[1:])

    def body(acc, d):
        pt = G.ge_gather(tx, ty, tinf, d)          # [n, ...] points
        contrib = _tree_reduce(G.gej_from_ge(pt))  # [...] point(s)
        acc = G.gej_double_n(acc, window)
        return G.gej_add(acc, contrib), None

    acc, _ = jax.lax.scan(body, acc0, digs)
    return acc


# ---------------------------------------------------------------------------
# Bucketed Pippenger (sort + segmented-scan accumulation)
# ---------------------------------------------------------------------------
#
# Internal layout: limb-major tuples (x, y, z [16, N] uint32 weak limbs,
# inf [N] uint32 0/1) — the Pallas add kernel's shape.  The jnp
# fallback (CPU tests / dryrun) lifts to ops/group.py GEJ per add.


def _use_pallas() -> bool:
    from ..config import config
    return config().pallas_enabled()


def _pt_add(a, b):
    """Complete jacobian add on limb-major point tuples."""
    if _use_pallas():
        from . import pallas_group as PG
        return PG.gej_add_tpu(a, b)
    ga = G.GEJ(LB(jnp.swapaxes(a[0], 0, 1), MASK16),
               LB(jnp.swapaxes(a[1], 0, 1), MASK16),
               LB(jnp.swapaxes(a[2], 0, 1), MASK16), a[3] != 0)
    gb = G.GEJ(LB(jnp.swapaxes(b[0], 0, 1), MASK16),
               LB(jnp.swapaxes(b[1], 0, 1), MASK16),
               LB(jnp.swapaxes(b[2], 0, 1), MASK16), b[3] != 0)
    s = G.gej_add(ga, gb)
    return (jnp.swapaxes(F.FP.norm_if_needed(s.x).v, 0, 1),
            jnp.swapaxes(F.FP.norm_if_needed(s.y).v, 0, 1),
            jnp.swapaxes(F.FP.norm_if_needed(s.z).v, 0, 1),
            s.inf.astype(jnp.uint32))


def _pt_select(mask, a, b):
    """mask ? a : b on limb-major point tuples (mask [N] bool)."""
    return (jnp.where(mask[None, :], a[0], b[0]),
            jnp.where(mask[None, :], a[1], b[1]),
            jnp.where(mask[None, :], a[2], b[2]),
            jnp.where(mask, a[3], b[3]))


def _pt_gather(pt, idx):
    return (pt[0][:, idx], pt[1][:, idx], pt[2][:, idx], pt[3][idx])


# Below this width the fori-loop Hillis-Steele scan takes over from the
# pairwise recursion: its trace holds ONE add (compile-cheap) and the
# n*log2(n) lane-add work is negligible at these widths.  The jnp
# fallback (CPU tests / dryrun) always uses it — the pairwise
# recursion's 2*log2(N) inlined group adds are an XLA:CPU compile bomb.
_HS_MAX = 1024


def _seg_scan_add_hs(pt, newseg):
    """Inclusive segmented EC scan, Hillis-Steele shape: log2(n) steps
    of x_i += x_(i-2^d) gated by accumulated segment flags; ONE add in
    the trace (lax.fori_loop body)."""
    n = newseg.shape[0]
    idx = jnp.arange(n)

    def step(d, carry):
        cur, fl = carry
        off = jnp.int32(1) << d
        prev = tuple(jnp.roll(v, off, axis=-1) for v in cur)
        pfl = jnp.roll(fl, off)
        valid = idx >= off
        absorb = valid & ~fl
        added = _pt_add(prev, cur)
        nxt = _pt_select(absorb, added, cur)
        nfl = fl | jnp.where(valid, pfl, True)
        return nxt, nfl

    pt, _ = jax.lax.fori_loop(0, (n - 1).bit_length(), step, (pt, newseg))
    return pt


def _seg_scan_add(pt, newseg):
    """Inclusive segmented scan (EC sum) over the lane axis.

    pt lanes 0..N-1 (N a power of two); newseg[i] True where lane i
    starts a new segment (segments are contiguous).  Returns lanes
    where each lane holds the sum of its segment up to and including
    itself.  Work-efficient pairwise recursion: 2N adds, 2*log2(N)
    batched add calls — the vector replacement for the reference's
    serial bucket scatter (ecmult_impl.h:545-566).  Narrow widths (and
    the whole jnp fallback) run the Hillis-Steele variant instead."""
    n = newseg.shape[0]
    if n == 1:
        return pt
    if not _use_pallas() or n <= _HS_MAX:
        return _seg_scan_add_hs(pt, newseg)
    ev = _pt_gather(pt, slice(0, n, 2))
    od = _pt_gather(pt, slice(1, n, 2))
    f_ev = newseg[0::2]
    f_od = newseg[1::2]
    comb = _pt_select(f_od, od, _pt_add(ev, od))
    s = _seg_scan_add(comb, f_ev | f_od)
    # odd outputs are the pair scans; even outputs combine the previous
    # pair's scan with the even element (identity for lane 0 / segment
    # starts).
    prev = tuple(jnp.roll(v, 1, axis=-1) for v in s)
    first = jnp.arange(n // 2) == 0
    out_ev = _pt_select(f_ev | first, ev, _pt_add(prev, ev))
    # interleave even/odd back
    def il(a, b):
        if a.ndim == 2:
            st = jnp.stack([a, b], axis=-1)          # [16, n/2, 2]
            return st.reshape(a.shape[0], n)
        st = jnp.stack([a, b], axis=-1)
        return st.reshape(n)
    return tuple(il(a, b) for a, b in zip(out_ev, s))


def _tree_reduce_lm(pt):
    """EC sum of all lanes of a limb-major point tuple (N a power of
    two) -> 1-lane tuple.  Pairwise halving on the Pallas path; the
    jnp fallback / narrow widths use a fori-loop offset-add (one add in
    the trace) for compile cheapness."""
    n = pt[3].shape[0]
    if _use_pallas():
        while n > _HS_MAX:
            lo = _pt_gather(pt, slice(0, n, 2))
            hi = _pt_gather(pt, slice(1, n, 2))
            pt = _pt_add(lo, hi)
            n = n // 2
    if n == 1:
        return pt
    idx = jnp.arange(n)

    def step(d, cur):
        off = jnp.int32(1) << d
        nxt = tuple(jnp.roll(v, -off, axis=-1) for v in cur)
        valid = idx + off < n
        nxt = (nxt[0], nxt[1], nxt[2],
               jnp.where(valid, nxt[3], jnp.uint32(1)))
        return _pt_add(cur, nxt)

    pt = jax.lax.fori_loop(0, (n - 1).bit_length(), step, pt)
    return _pt_gather(pt, slice(0, 1))


def pippenger_window(n: int) -> int:
    """Bucket window bits for an n-point MSM — cost model
    (256/c)(2n + 3*2^c), the scan-based analogue of the reference's
    table (pippenger_bucket_window, ecmult_impl.h:597)."""
    best, best_cost = 4, None
    for c in range(4, 17):
        nwin = -(-256 // c)
        cost = nwin * (2 * n + 3 * (1 << c))
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best


def msm_pippenger(ks: LB, pts: G.GE, c: int | None = None) -> G.GEJ:
    """Bucketed Pippenger MSM over the leading batch axis (1-D batch).

    Returns a single GEJ.  See module docstring for the algorithm.
    Parity: tests/test_msm.py (python oracle, up to ~1.2e3 points on
    CPU) and tests/test_pallas_tpu.py::test_msm_pippenger_tpu
    (analytic P_i = a_i*G oracle at 2^10..2^20 points on hardware —
    the reference's ecmult_multi_var is library-static, so large-scale
    parity uses oracles with known discrete logs instead)."""
    ks = S.normalize(ks)        # digit decomposition needs canonical k
    N = ks.v.shape[0]
    if c is None:
        c = pippenger_window(N)
    nwin = -(-256 // c)
    npad = max(2, 1 << (N - 1).bit_length())

    # digits [nwin, Npad] (LSB-first rows), zero-padded lanes -> bucket 0
    limbs = ks.v                                 # [N, 16]
    digs = []
    for w in range(nwin):
        bit = w * c
        idx, off = bit // 16, bit % 16
        v = limbs[:, idx] >> off
        take = 16 - off
        j = idx + 1
        while take < c and j < 16:
            v = v | (limbs[:, j] << take)
            take += 16
            j += 1
        digs.append(v & ((1 << c) - 1))
    digits = jnp.stack(digs, axis=0)
    digits = jnp.pad(digits, [(0, 0), (0, npad - N)])

    x = jnp.swapaxes(F.FP.norm_if_needed(pts.x).v, 0, 1)
    y = jnp.swapaxes(F.FP.norm_if_needed(pts.y).v, 0, 1)
    z16 = jnp.zeros_like(x)
    one16 = z16.at[0, :].set(1)
    pt = (jnp.pad(x, [(0, 0), (0, npad - N)]),
          jnp.pad(y, [(0, 0), (0, npad - N)]),
          jnp.pad(one16, [(0, 0), (0, npad - N)]),
          jnp.pad(pts.inf.astype(jnp.uint32), [(0, npad - N)],
                  constant_values=1))

    mpad = 1 << c                                # buckets incl. dropped 0
    first_only = jnp.arange(mpad) == 0

    def window(acc, d):
        order = jnp.argsort(d)
        ds = d[order]
        sp = _pt_gather(pt, order)
        newseg = jnp.concatenate(
            [jnp.ones((1,), bool), ds[1:] != ds[:-1]])
        scan = _seg_scan_add(sp, newseg)
        is_last = jnp.concatenate(
            [ds[:-1] != ds[1:], jnp.ones((1,), bool)])
        # route non-last lanes and bucket 0 into a dropped slot
        slot = jnp.where(is_last & (ds > 0), ds, mpad)
        bx = jnp.zeros((16, mpad), jnp.uint32).at[:, slot].set(
            scan[0], mode="drop")
        by = jnp.zeros((16, mpad), jnp.uint32).at[:, slot].set(
            scan[1], mode="drop")
        bz = jnp.zeros((16, mpad), jnp.uint32).at[:, slot].set(
            scan[2], mode="drop")
        binf = jnp.ones((mpad,), jnp.uint32).at[slot].set(
            scan[3], mode="drop")
        # suffix sums via reversed inclusive scan (buckets mpad-1 .. 1;
        # bucket 0 has weight 0 so its lane is forced to infinity both
        # before the scan and — because scan lane mpad-1 would otherwise
        # repeat S_1 — after it), then a full tree reduce:
        # sum_j j*B_j = sum_{j>=1} S_j, S_j = sum_{i>=j} B_i
        # (the running-sum reduction of ecmult_impl.h:572-588).
        lane_is_b0 = jnp.arange(mpad) == mpad - 1
        rb = (bx[:, ::-1], by[:, ::-1], bz[:, ::-1],
              jnp.where(lane_is_b0, jnp.uint32(1), binf[::-1]))
        rt = _seg_scan_add(rb, first_only)
        rt = (rt[0], rt[1], rt[2],
              jnp.where(lane_is_b0, jnp.uint32(1), rt[3]))
        wsum = _tree_reduce_lm(rt)
        # acc = 2^c * acc + wsum
        accj = G.gej_double_n(G.GEJ(LB(acc[0], MASK16), LB(acc[1], MASK16),
                                    LB(acc[2], MASK16), acc[3] != 0), c)
        accj = G.gej_add(accj, G.GEJ(LB(wsum[0][:, 0], MASK16),
                                     LB(wsum[1][:, 0], MASK16),
                                     LB(wsum[2][:, 0], MASK16),
                                     wsum[3][0] != 0))
        out = (F.FP.norm_if_needed(accj.x).v, F.FP.norm_if_needed(accj.y).v,
               F.FP.norm_if_needed(accj.z).v,
               accj.inf.astype(jnp.uint32))
        return out, None

    z1 = jnp.zeros((16,), jnp.uint32)
    acc0 = (z1, z1.at[0].set(1), z1.at[0].set(1), jnp.uint32(1))
    acc, _ = jax.lax.scan(window, acc0, digits[::-1])
    return G.GEJ(LB(acc[0], MASK16), LB(acc[1], MASK16),
                 LB(acc[2], MASK16), acc[3] != 0)


def ecmult_multi(ks: LB, pts: G.GE) -> G.GEJ:
    """Size-dispatched MSM over the LEADING axis (counterpart of
    ecmult_multi_var's algorithm selection, ecmult_impl.h:823-867).
    Trailing axes are independent batched MSMs (reduced per lane)."""
    from ..config import config
    n = ks.v.shape[0]
    if ks.v.ndim > 2:
        # batched aggregates: the sort/segment Pippenger engine is
        # per-lane only, so batched inputs use the shared-doubling
        # windowed engine (or per-lane multiplies when tiny).
        return msm_simple(ks, pts) if n <= 32 else msm_windowed(ks, pts)
    if _use_pallas() and n > 256:
        # fused contiguous windowed-table kernel: ~8x the sort+scan
        # Pippenger on v5e (round-5 profile: the scan's strided
        # compaction is a 10x HBM relayout tax; see ops/pallas_msm.py)
        from . import pallas_msm
        return pallas_msm.msm_windowed_tpu(S.normalize(ks), pts)
    if n <= 32:
        return msm_simple(ks, pts)
    if n <= max(config().pippenger_threshold, 1024):
        # shared-doubling windows beat buckets while 3*2^c doublings
        # dominate 2N adds; the reference's 88-point crossover
        # (ecmult_impl.h:55) shifts right on TPU because bucket
        # scatter costs a sort, not a pointer write.
        return msm_windowed(ks, pts)
    return msm_pippenger(ks, pts)
