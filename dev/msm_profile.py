"""Round-5: stage-level profile of msm_pippenger at 2^20 points on TPU.

Measures: argsort alone, sort+gather, segmented scan, bucket scatter +
suffix phase, and the full window — to locate the 12x gap between the
measured 254k pts/s and the ~3M pts/s compute ceiling.
"""
import os, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/secp_tpu_jax_cache"))

from secp256k1_zkp_tpu.ops import msm, group as G, field as F
from secp256k1_zkp_tpu.ops import scalar as S
from secp256k1_zkp_tpu.ops.limb import LB, MASK16

N = 1 << int(os.environ.get("MSM_LOG2N", "20"))
c = msm.pippenger_window(N)
print(f"N={N} c={c}", flush=True)
rng = np.random.default_rng(0)
d_np = rng.integers(0, 1 << c, N, dtype=np.int64).astype(np.uint32)
x_np = rng.integers(0, 1 << 16, (16, N), dtype=np.int64).astype(np.uint32)

d = jax.device_put(jnp.asarray(d_np))
x = jax.device_put(jnp.asarray(x_np))
pt = (x, x, x, jnp.zeros((N,), jnp.uint32))


def bench(name, fn, *args, reps=3):
    out = jax.jit(fn)(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.jit(fn)(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e3:9.2f} ms", flush=True)
    return dt


bench("argsort", lambda d: jnp.argsort(d), d)


def sort_gather(d, pt):
    order = jnp.argsort(d)
    return msm._pt_gather(pt, order)

bench("argsort+gather4", sort_gather, d, pt)


def segscan(d, pt):
    newseg = jnp.concatenate([jnp.ones((1,), bool), d[1:] != d[:-1]])
    return msm._seg_scan_add(pt, newseg)

bench("seg_scan_add (unsorted ok)", segscan, d, pt)


def one_add(pt):
    n = pt[3].shape[0]
    lo = msm._pt_gather(pt, slice(0, n, 2))
    hi = msm._pt_gather(pt, slice(1, n, 2))
    return msm._pt_add(lo, hi)

bench("one strided add (N/2)", one_add, pt)


def one_add_nostride(pt):
    n = pt[3].shape[0] // 2
    lo = tuple(v[..., :n] for v in pt)
    hi = tuple(v[..., n:] for v in pt)
    return msm._pt_add(lo, hi)

bench("one contig add (N/2)", one_add_nostride, pt)


def bucket_phase(d, pt):
    mpad = 1 << c
    ds = jnp.sort(d)
    is_last = jnp.concatenate([ds[:-1] != ds[1:], jnp.ones((1,), bool)])
    slot = jnp.where(is_last & (ds > 0), ds, mpad)
    bx = jnp.zeros((16, mpad), jnp.uint32).at[:, slot].set(pt[0], mode="drop")
    by = jnp.zeros((16, mpad), jnp.uint32).at[:, slot].set(pt[1], mode="drop")
    bz = jnp.zeros((16, mpad), jnp.uint32).at[:, slot].set(pt[2], mode="drop")
    binf = jnp.ones((mpad,), jnp.uint32).at[slot].set(pt[3], mode="drop")
    first_only = jnp.arange(mpad) == 0
    lane_is_b0 = jnp.arange(mpad) == mpad - 1
    rb = (bx[:, ::-1], by[:, ::-1], bz[:, ::-1],
          jnp.where(lane_is_b0, jnp.uint32(1), binf[::-1]))
    rt = msm._seg_scan_add(rb, first_only)
    return msm._tree_reduce_lm(rt)

bench("bucket scatter+suffix+reduce", bucket_phase, d, pt)

ks_np = rng.integers(0, 1 << 16, (N, 16), dtype=np.int64).astype(np.uint32)
ks_np[:, 15] &= 0x7FFF
ks = LB(jax.device_put(jnp.asarray(ks_np)), MASK16)
pts = G.GE(LB(jnp.transpose(x), MASK16), LB(jnp.transpose(x), MASK16),
           jnp.zeros((N,), bool))
dt = bench("FULL msm_pippenger", lambda k, p: msm.msm_pippenger(k, p),
           ks, pts, reps=1)
print(f"-> {N/dt/1e3:.0f}k pts/s", flush=True)
