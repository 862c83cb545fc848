"""cProfile the verify trace to find the Python-side bottleneck."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    "--xla_backend_optimization_level=0 "
    "--xla_llvm_disable_expensive_passes=true")
os.environ["SECP_TPU_JNP_WINDOW"] = "1"
sys.path.insert(0, "/root/repo")

import gc
gc.disable()

import cProfile
import pstats
import time

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import dataclasses
from secp256k1_zkp_tpu import config as _cfg
_cfg.set_config(dataclasses.replace(_cfg.config(), jnp_window=1))

from secp256k1_zkp_tpu.modules import schnorrsig
from secp256k1_zkp_tpu.parallel.mesh import make_mesh, BATCH_AXIS

mesh = make_mesh(8)
shard = NamedSharding(mesh, P(BATCH_AXIS))
msgs = jax.device_put(jnp.zeros((8, 32), jnp.uint8), shard)
sigs = jax.device_put(jnp.zeros((8, 64), jnp.uint8), shard)
pubx = jax.device_put(jnp.zeros((8, 32), jnp.uint8), shard)

t0 = time.time()
prof = cProfile.Profile()
prof.enable()
lowered = jax.jit(schnorrsig.verify).lower(msgs, sigs, pubx)
prof.disable()
print(f"trace+lower: {time.time()-t0:.1f}s", flush=True)
st = pstats.Stats(prof)
st.sort_stats("cumulative").print_stats(40)
