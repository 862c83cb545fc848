import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    "--xla_backend_optimization_level=0 "
    "--xla_llvm_disable_expensive_passes=true")
sys.path.insert(0, "/root/repo")
import gc
gc.disable()

import numpy as np
import jax
import jax.numpy as jnp

print("default_backend:", jax.default_backend(), flush=True)
print("devices:", jax.devices()[:3], "n =", len(jax.devices()), flush=True)

t0 = time.time()
from secp256k1_zkp_tpu.ops import sha256 as H
print(f"import sha256: {time.time()-t0:.2f}s", flush=True)
print("_K devices:", H._K.devices(), flush=True)

t0 = time.time()
np.asarray(H._K)
print(f"_value(_K): {time.time()-t0:.2f}s", flush=True)

m = jnp.zeros((8, 96), jnp.uint8)
t0 = time.time()
low = jax.jit(lambda m: H.tagged_hash_bytes("BIP0340/challenge", m)).lower(m)
print(f"tagged_hash lower: {time.time()-t0:.2f}s", flush=True)
