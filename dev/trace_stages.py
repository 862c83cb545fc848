"""Stage-by-stage trace timing for the dryrun verify graph."""
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

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import dataclasses
from secp256k1_zkp_tpu import config as _cfg
_cfg.set_config(dataclasses.replace(_cfg.config(), jnp_window=1))

from secp256k1_zkp_tpu.modules import schnorrsig
from secp256k1_zkp_tpu.ops import ecmult, field as F, group as G, \
    scalar as S, sha256 as H
from secp256k1_zkp_tpu.ops.limb import LB, MASK16
from secp256k1_zkp_tpu.parallel.mesh import make_mesh, BATCH_AXIS

t0 = time.time()


def mark(msg, tA):
    print(f"[{time.time()-t0:7.1f}s] {msg}: {time.time()-tA:.1f}s",
          flush=True)


mesh = make_mesh(8)
shard = NamedSharding(mesh, P(BATCH_AXIS))
msgs = jax.device_put(jnp.zeros((8, 32), jnp.uint8), shard)
sigs = jax.device_put(jnp.zeros((8, 64), jnp.uint8), shard)
pubx = jax.device_put(jnp.zeros((8, 32), jnp.uint8), shard)

# 0) warm up jit machinery with a trivial traced+lowered fn
tA = time.time()
jax.jit(lambda x: x + 1).lower(msgs)
mark("warmup trivial", tA)

# 1) tagged hash alone
tA = time.time()
low = jax.jit(lambda m: H.tagged_hash_bytes("BIP0340/challenge", m)).lower(
    jnp.zeros((8, 96), jnp.uint8))
mark("tagged_hash trace", tA)
print("   lines:", len(low.as_text().splitlines()))

# 2) lift_x alone
tA = time.time()
low = jax.jit(schnorrsig.lift_x).lower(pubx)
mark("lift_x trace", tA)
print("   lines:", len(low.as_text().splitlines()))

# 3) ecmult alone
k = LB(jnp.zeros((8, 16), jnp.uint32), MASK16)
pt = G.GE(LB(jnp.zeros((8, 16), jnp.uint32), MASK16),
          LB(jnp.zeros((8, 16), jnp.uint32), MASK16),
          jnp.zeros((8,), bool))
tA = time.time()
low = jax.jit(ecmult.ecmult).lower(k, k, pt)
mark("ecmult trace", tA)
print("   lines:", len(low.as_text().splitlines()))

# 4) ge_from_gej alone
pj = G.GEJ(LB(jnp.zeros((8, 16), jnp.uint32), MASK16),
           LB(jnp.zeros((8, 16), jnp.uint32), MASK16),
           LB(jnp.zeros((8, 16), jnp.uint32), MASK16),
           jnp.zeros((8,), bool))
tA = time.time()
low = jax.jit(G.ge_from_gej).lower(pj)
mark("ge_from_gej trace", tA)
print("   lines:", len(low.as_text().splitlines()))

# 5) full verify
tA = time.time()
low = jax.jit(schnorrsig.verify).lower(msgs, sigs, pubx)
mark("verify trace", tA)
print("   lines:", len(low.as_text().splitlines()))
