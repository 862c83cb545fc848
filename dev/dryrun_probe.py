"""Probe: where does dryrun_multichip compile time go?

Reproduces the dryrun environment (8 virtual CPU devices, opt level 0)
and times trace vs compile for each leg, plus HLO op counts.
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    "--xla_backend_optimization_level=0 "
    "--xla_llvm_disable_expensive_passes=true "
    "--xla_cpu_use_thunk_runtime=false")
os.environ["SECP_TPU_JNP_WINDOW"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gc
gc.disable()

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

t0 = time.time()


def mark(msg):
    print(f"[{time.time()-t0:8.1f}s] {msg}", flush=True)


mark("jax imported")

import dataclasses
from secp256k1_zkp_tpu import config as _cfg
_cfg.set_config(dataclasses.replace(_cfg.config(), jnp_window=1))

from secp256k1_zkp_tpu.modules import schnorrsig
from secp256k1_zkp_tpu.ops import field as F, group as G
from secp256k1_zkp_tpu.parallel.mesh import make_mesh, BATCH_AXIS
from secp256k1_zkp_tpu.parallel.msm_sharded import msm_sharded
from secp256k1_zkp_tpu.utils import hostcurve
from secp256k1_zkp_tpu.ops.limb import LB, MASK16

mark("imports done")

n_devices = 8
mesh = make_mesh(n_devices)
batch = n_devices
rng = np.random.default_rng(0)
msgs = jnp.zeros((batch, 32), jnp.uint8)
sigs = jnp.zeros((batch, 64), jnp.uint8)
pubx = jnp.zeros((batch, 32), jnp.uint8)
shard = NamedSharding(mesh, P(BATCH_AXIS))
msgs = jax.device_put(msgs, shard)
sigs = jax.device_put(sigs, shard)
pubx = jax.device_put(pubx, shard)

# --- leg 1: verify ---
lowered = None
tA = time.time()
lowered = jax.jit(schnorrsig.verify).lower(msgs, sigs, pubx)
mark(f"verify traced+lowered in {time.time()-tA:.1f}s")
txt = lowered.as_text()
mark(f"verify stablehlo: {len(txt.splitlines())} lines, {len(txt)} bytes")
tA = time.time()
compiled = lowered.compile()
mark(f"verify compiled in {time.time()-tA:.1f}s")

# --- leg 2: msm ---
ks_int = [int.from_bytes(rng.bytes(32), "big") % hostcurve.N
          for _ in range(batch)]
pts = [hostcurve.mul(i + 1) for i in range(batch)]
k_arr = np.array([[(k >> (16 * i)) & 0xFFFF for i in range(16)]
                  for k in ks_int], np.uint32)
px_arr = np.array([[(p[0] >> (16 * i)) & 0xFFFF for i in range(16)]
                   for p in pts], np.uint32)
py_arr = np.array([[(p[1] >> (16 * i)) & 0xFFFF for i in range(16)]
                   for p in pts], np.uint32)
ks = LB(jax.device_put(jnp.asarray(k_arr), shard), MASK16)
P_pts = G.GE(LB(jax.device_put(jnp.asarray(px_arr), shard), MASK16),
             LB(jax.device_put(jnp.asarray(py_arr), shard), MASK16),
             jax.device_put(jnp.zeros(batch, bool), shard))


def msm_affine_x(k, p):
    total = msm_sharded(mesh, k, p)
    return F.normalize(G.ge_from_gej(total).x).v


tA = time.time()
low2 = jax.jit(msm_affine_x).lower(ks, P_pts)
mark(f"msm traced+lowered in {time.time()-tA:.1f}s")
txt2 = low2.as_text()
mark(f"msm stablehlo: {len(txt2.splitlines())} lines, {len(txt2)} bytes")
tA = time.time()
comp2 = low2.compile()
mark(f"msm compiled in {time.time()-tA:.1f}s")

mark("TOTAL")
