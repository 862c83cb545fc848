"""Round-5: correctness + throughput of the fused windowed-table MSM."""
import os, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/secp_tpu_jax_cache"))

from secp256k1_zkp_tpu.ops import group as G, field as F
from secp256k1_zkp_tpu.ops import pallas_msm, pallas_gen as PGEN
from secp256k1_zkp_tpu.ops.limb import LB, MASK16, limbs_to_int_np
from secp256k1_zkp_tpu.utils import hostcurve

rng = np.random.default_rng(5)


def rows(vals):
    arr = np.zeros((16, len(vals)), np.uint32)
    for j, v in enumerate(vals):
        for i in range(16):
            arr[i, j] = (v >> (16 * i)) & 0xFFFF
    return jnp.asarray(arr)


def run(N, check=True, nbits=256, reps=1):
    a_int = [int.from_bytes(rng.bytes(32), "big") % hostcurve.N or 1
             for _ in range(N)]
    k_int = [int.from_bytes(rng.bytes(32), "big") % hostcurve.N
             if nbits == 256 else
             int.from_bytes(rng.bytes(16), "big") for _ in range(N)]
    k_int[0] = 0
    x, y, z = PGEN.ecmult_gen_tpu(rows(a_int))
    xa, ya = PGEN.affine_xy_tpu(x, y, z)
    pts = G.GE(LB(jnp.transpose(xa), MASK16),
               LB(jnp.transpose(ya), MASK16), jnp.zeros((N,), bool))
    ks = LB(jnp.transpose(rows(k_int)), MASK16)
    f = jax.jit(lambda k, p: pallas_msm.msm_windowed_tpu(k, p,
                                                        nbits=nbits))
    t0 = time.perf_counter()
    total = f(ks, pts)
    got = jax.block_until_ready(jax.jit(G.ge_from_gej)(total))
    gx = limbs_to_int_np(np.asarray(
        jax.jit(lambda v: F.normalize(v).v)(got.x)))
    print(f"N={N} nbits={nbits}: first call {time.perf_counter()-t0:.1f}s",
          flush=True)
    if check:
        expect = hostcurve.mul(
            sum(k * a for k, a in zip(k_int, a_int)) % hostcurve.N)
        assert gx == expect[0], f"MISMATCH at N={N}"
        print(f"  parity OK", flush=True)
    if reps > 1:
        np.asarray(f(ks, pts).x.v)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(ks, pts)
        np.asarray(out.x.v)
        dt = (time.perf_counter() - t0) / reps
        print(f"  {dt*1e3:.1f} ms -> {N/dt/1e6:.2f}M pts/s", flush=True)


run(1024)
run(1024, nbits=128)
run(4096)
run(32768, check=True, reps=5)
run(1 << 20, check=False, reps=3)
