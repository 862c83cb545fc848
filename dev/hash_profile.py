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

import cProfile
import pstats

import jax
import jax.numpy as jnp
from secp256k1_zkp_tpu.ops import sha256 as H

jax.jit(lambda x: x + 1).lower(jnp.zeros((8,), jnp.uint8))  # warm

m = jnp.zeros((8, 96), jnp.uint8)
t0 = time.time()
prof = cProfile.Profile()
prof.enable()
low = jax.jit(lambda m: H.tagged_hash_bytes("BIP0340/challenge", m)).lower(m)
prof.disable()
print(f"trace: {time.time()-t0:.1f}s", flush=True)
st = pstats.Stats(prof)
st.sort_stats("cumulative").print_stats(30)
st.sort_stats("tottime").print_stats(20)
