import os, sys, time, collections, traceback
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
    "--xla_backend_optimization_level=0 "
    "--xla_llvm_disable_expensive_passes=true")
os.environ["SECP_TPU_JNP_WINDOW"] = "1"
sys.path.insert(0, "/root/repo")
import gc; gc.disable()
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
jax.config.update("jax_platforms", "cpu")
import dataclasses
from secp256k1_zkp_tpu import config as _cfg
_cfg.set_config(dataclasses.replace(_cfg.config(), jnp_window=1))
from secp256k1_zkp_tpu.ops import limb as L
counts = collections.Counter()
orig = L.Mod.norm_weak
def counted(self, a):
    st = traceback.extract_stack()
    # find first repo frame above limb.py
    key = "?"
    for fr in reversed(st[:-1]):
        if "secp256k1_zkp_tpu" in fr.filename and "limb.py" not in fr.filename:
            key = f"{os.path.basename(fr.filename)}:{fr.name}"
            break
    counts[key] += 1
    return orig(self, a)
L.Mod.norm_weak = counted
from secp256k1_zkp_tpu.modules import schnorrsig
from secp256k1_zkp_tpu.parallel.mesh import make_mesh, BATCH_AXIS
mesh = make_mesh(8)
shard = NamedSharding(mesh, P(BATCH_AXIS))
msgs = jax.device_put(jnp.zeros((8, 32), jnp.uint8), shard)
sigs = jax.device_put(jnp.zeros((8, 64), jnp.uint8), shard)
pubx = jax.device_put(jnp.zeros((8, 32), jnp.uint8), shard)
jax.jit(schnorrsig.verify).lower(msgs, sigs, pubx)
tot = sum(counts.values())
print("total norm_weak calls traced:", tot)
for k, v in counts.most_common(25):
    print(f"{v:5d} {k}")
