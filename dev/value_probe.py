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

t0 = time.time()


def mark(s, tA):
    print(f"[{time.time()-t0:7.1f}] {s}: {time.time()-tA:.2f}s", flush=True)


tA = time.time()
k = jnp.asarray(np.arange(64, dtype=np.uint32))
mark("asarray", tA)

tA = time.time()
np.asarray(k)
mark("np.asarray(k) [_value]", tA)

tA = time.time()
low = jax.jit(lambda m: m + k).lower(jnp.zeros((64,), jnp.uint32))
mark("lower with captured jax const", tA)

# now a fresh constant (not yet fetched)
k2 = jnp.asarray(np.arange(128, dtype=np.uint32))
tA = time.time()
low = jax.jit(lambda m: m + k2).lower(jnp.zeros((128,), jnp.uint32))
mark("lower with fresh jax const", tA)

# scan over a fresh jax const
k3 = jnp.asarray(np.arange(64, dtype=np.uint32))
tA = time.time()
low = jax.jit(
    lambda m: jax.lax.scan(lambda c, x: (c + x, None), m, k3)[0]
).lower(jnp.uint32(0))
mark("lower scan over fresh jax const", tA)
