"""Probe the fused dryrun step: trace / lines / compile, per stage."""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    "--xla_backend_optimization_level=0 "
    "--xla_llvm_disable_expensive_passes=true")
os.environ["SECP_TPU_JNP_WINDOW"] = "1"
sys.path.insert(0, "/root/repo")
import gc
gc.disable()

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

jax.config.update("jax_platforms", "cpu")
print("XLA_FLAGS:", os.environ["XLA_FLAGS"], flush=True)
print("backend:", jax.default_backend(), flush=True)

import dataclasses
from secp256k1_zkp_tpu import config as _cfg
_cfg.set_config(dataclasses.replace(_cfg.config(), jnp_window=1))

from secp256k1_zkp_tpu.modules import schnorrsig
from secp256k1_zkp_tpu.ops import field as F, group as G
from secp256k1_zkp_tpu.ops.limb import LB, MASK16
from secp256k1_zkp_tpu.parallel.mesh import make_mesh, BATCH_AXIS
from secp256k1_zkp_tpu.parallel.msm_sharded import msm_sharded

t0 = time.time()


def mark(m, tA):
    print(f"[{time.time()-t0:7.1f}] {m}: {time.time()-tA:.1f}s", flush=True)


mesh = make_mesh(8)
shard = NamedSharding(mesh, P(BATCH_AXIS))
msgs = jax.device_put(jnp.zeros((8, 32), jnp.uint8), shard)
sigs = jax.device_put(jnp.zeros((8, 64), jnp.uint8), shard)
pubx = jax.device_put(jnp.zeros((8, 32), jnp.uint8), shard)
kv = jax.device_put(jnp.zeros((8, 16), jnp.uint32), shard)
px = jax.device_put(jnp.ones((8, 16), jnp.uint32), shard)
py = jax.device_put(jnp.ones((8, 16), jnp.uint32), shard)
pinf = jax.device_put(jnp.zeros(8, bool), shard)

# stage A: verify alone
tA = time.time()
lowv = jax.jit(schnorrsig.verify).lower(msgs, sigs, pubx)
mark("verify trace", tA)
print("  lines:", len(lowv.as_text().splitlines()), flush=True)
tA = time.time()
lowv.compile()
mark("verify compile", tA)


def msm_leg(kv, px, py, pinf):
    total = msm_sharded(mesh, LB(kv, MASK16),
                        G.GE(LB(px, MASK16), LB(py, MASK16), pinf))
    return F.normalize(G.ge_from_gej(total).x).v


tA = time.time()
lowm = jax.jit(msm_leg).lower(kv, px, py, pinf)
mark("msm trace", tA)
print("  lines:", len(lowm.as_text().splitlines()), flush=True)
tA = time.time()
lowm.compile()
mark("msm compile", tA)


def step(msgs, sigs, pubx, kv, px, py, pinf):
    ver = schnorrsig.verify(msgs, sigs, pubx)
    total = msm_sharded(mesh, LB(kv, MASK16),
                        G.GE(LB(px, MASK16), LB(py, MASK16), pinf))
    gx = F.normalize(G.ge_from_gej(total).x).v
    return ver, gx


tA = time.time()
lows = jax.jit(step).lower(msgs, sigs, pubx, kv, px, py, pinf)
mark("fused trace", tA)
print("  lines:", len(lows.as_text().splitlines()), flush=True)
tA = time.time()
lows.compile()
mark("fused compile", tA)
