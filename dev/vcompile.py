import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
    "--xla_backend_optimization_level=0 "
    "--xla_llvm_disable_expensive_passes=true "
    "--xla_cpu_use_thunk_runtime=false")
os.environ["SECP_TPU_JNP_WINDOW"] = "1"
sys.path.insert(0, "/root/repo")
import gc; gc.disable()
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
jax.config.update("jax_platforms", "cpu")
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
tA = time.time()
lowv = jax.jit(schnorrsig.verify).lower(msgs, sigs, pubx)
print(f"trace {time.time()-tA:.1f}s lines {len(lowv.as_text().splitlines())}", flush=True)
tA = time.time()
cv = lowv.compile()
print(f"compile {time.time()-tA:.1f}s", flush=True)
tA = time.time()
np.asarray(cv(msgs, sigs, pubx))
print(f"execute {time.time()-tA:.1f}s", flush=True)
