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
from secp256k1_zkp_tpu.ops import field as F, group as G
from secp256k1_zkp_tpu.ops.limb import LB, MASK16
from secp256k1_zkp_tpu.parallel.mesh import make_mesh, BATCH_AXIS
from secp256k1_zkp_tpu.parallel.msm_sharded import msm_sharded
t0 = time.time()
def mark(m, tA): print(f"[{time.time()-t0:7.1f}] {m}: {time.time()-tA:.1f}s", flush=True)
mesh = make_mesh(8)
shard = NamedSharding(mesh, P(BATCH_AXIS))
msgs = jax.device_put(jnp.zeros((8, 32), jnp.uint8), shard)
sigs = jax.device_put(jnp.zeros((8, 64), jnp.uint8), shard)
pubx = jax.device_put(jnp.zeros((8, 32), jnp.uint8), shard)
kv = jax.device_put(jnp.zeros((8, 16), jnp.uint32), shard)
px = jax.device_put(jnp.ones((8, 16), jnp.uint32), shard)
py = jax.device_put(jnp.ones((8, 16), jnp.uint32), shard)
pinf = jax.device_put(jnp.zeros(8, bool), shard)

tA = time.time()
lowv = jax.jit(schnorrsig.verify).lower(msgs, sigs, pubx)
mark("verify trace", tA)
tA = time.time()
cv = lowv.compile()
mark("verify compile", tA)
tA = time.time()
out = np.asarray(cv(msgs, sigs, pubx))
mark("verify execute", tA)

def msm_leg(kv, px, py, pinf):
    total = msm_sharded(mesh, LB(kv, MASK16),
                        G.GE(LB(px, MASK16), LB(py, MASK16), pinf))
    return F.normalize(G.ge_from_gej(total).x).v
tA = time.time()
lowm = jax.jit(msm_leg).lower(kv, px, py, pinf)
mark("msm trace", tA)
tA = time.time()
cm = lowm.compile()
mark("msm compile", tA)
tA = time.time()
out = np.asarray(cm(kv, px, py, pinf))
mark("msm execute", tA)
