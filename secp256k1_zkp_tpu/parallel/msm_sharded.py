"""Multi-device sharded MSM.

TPU-native re-expression of the reference's scratch-bounded MSM batching
(secp256k1_ecmult_pippenger_batch + batch loop, src/ecmult_impl.h:670-731,
804-867): points and scalars are sharded across the mesh, each device
computes its local partial sum, and partials are combined with an
explicit EC-add reduction — ``psum`` cannot add curve points
(EC addition is not an elementwise monoid on the limb tensors), so the
reduction is an all_gather of the 3x16-limb jacobian partials followed by
a (replicated, tiny) add chain.  SURVEY.md §2.3.3 / §5 "communication".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import field as F
from ..ops import group as G
from ..ops import msm
from ..ops.limb import LB, MASK16
from .mesh import BATCH_AXIS


def msm_sharded(mesh: Mesh, ks: LB, pts: G.GE) -> G.GEJ:
    """sum_i k_i * P_i with the point set sharded over the mesh batch axis.

    Returns a replicated single-point GEJ.  Batch size must divide the
    mesh size.  The local partial uses the windowed MSM engine; the
    cross-device combine is log-free (N is tiny) sequential adds on every
    device (replicated compute, zero extra comm beyond one all_gather of
    ~200 bytes/device).
    """

    def local(kv, px, py, pinf):
        k = LB(kv, MASK16)
        p = G.GE(LB(px, MASK16), LB(py, MASK16), pinf)
        part = msm.ecmult_multi(k, p)
        # pack partial: [16]x3 limbs + inf flag
        xs = jax.lax.all_gather(F.FP.norm_if_needed(part.x).v, BATCH_AXIS)
        ys = jax.lax.all_gather(F.FP.norm_if_needed(part.y).v, BATCH_AXIS)
        zs = jax.lax.all_gather(F.FP.norm_if_needed(part.z).v, BATCH_AXIS)
        infs = jax.lax.all_gather(part.inf, BATCH_AXIS)
        total = msm._tree_reduce(
            G.GEJ(LB(xs, MASK16), LB(ys, MASK16), LB(zs, MASK16), infs))
        return (F.FP.norm_if_needed(total.x).v,
                F.FP.norm_if_needed(total.y).v,
                F.FP.norm_if_needed(total.z).v, total.inf)

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(BATCH_AXIS), P(BATCH_AXIS), P(BATCH_AXIS),
                  P(BATCH_AXIS)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)
    xv, yv, zv, inf = shard(ks.v, pts.x.v, pts.y.v, pts.inf)
    return G.GEJ(LB(xv, MASK16), LB(yv, MASK16), LB(zv, MASK16), inf)
