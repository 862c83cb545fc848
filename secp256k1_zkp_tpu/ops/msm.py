"""Multi-scalar multiplication (MSM): R = sum_i k_i * P_i (+ q*G).

Counterpart of secp256k1_ecmult_multi_var (src/ecmult_impl.h:823) —
the engine behind BPPP and batch verification.  Two single-device
strategies, mirroring the reference's dispatch (Strauss below 88 points,
Pippenger above, ecmult_impl.h:55):

* :func:`msm_simple` — per-lane windowed multiplies + an EC tree
  reduction (analogue of ecmult_multi_simple_var, ecmult_impl.h:779).
  O(B * 64) window adds; optimal for small B.
* :func:`msm_windowed` — shared-doubling windowed sum: one 4-bit window
  of EVERY point is added per doubling round (Pippenger-flavored
  restructuring with uniform lanes; bucket scatter is replaced by
  complete adds of gathered per-lane multiples, which keeps the dataflow
  static for XLA).  Cost: 64 rounds x (4 doublings + B adds) — the adds
  dominate; the tree variant re-associates them into log2(B) depth.

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
    """Shared-doubling windowed MSM over the leading batch axis.

    acc := 16*acc + sum_i digit_w(k_i)*P_i  per window w (MSB-first);
    the inner sum is a tree of complete adds over gathered per-lane
    multiples (d*P_i from each lane's 16-entry table)."""
    ks = S.FN.norm_weak(ks) if ks.bound > MASK16 else ks
    tx, ty, tinf = ecmult._pt_table(pts)   # [16, B, 16limbs]
    digits = ecmult.scalar_digits(ks)      # [B, 64] LSB-first
    digs = jnp.moveaxis(digits, -1, 0)[::-1]  # [64, B] MSB-first
    acc0 = G.gej_infinity(())

    def body(acc, d):
        pt = G.ge_gather(tx, ty, tinf, d)      # [B] points
        contrib = _tree_reduce(G.gej_from_ge(pt))  # single point
        for _ in range(ecmult.WINDOW):
            acc = G.gej_double(acc)
        return G.gej_add(acc, contrib), None

    acc, _ = jax.lax.scan(body, acc0, digs)
    return acc
