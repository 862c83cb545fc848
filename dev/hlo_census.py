import os, sys, time, re, collections
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
low = jax.jit(schnorrsig.verify).lower(msgs, sigs, pubx)
txt = low.as_text()
print("lines:", len(txt.splitlines()))
# count ops and function sizes
ops = collections.Counter(re.findall(r"stablehlo\.\w+", txt))
for op, n in ops.most_common(15):
    print(f"{n:7d} {op}")
# function sizes
funcs = re.findall(r"func\.func (?:private )?@(\S+)\(", txt)
sizes = {}
cur = None; cnt = 0
for line in txt.splitlines():
    m = re.search(r"func\.func (?:private )?@(\S+)\(", line)
    if m:
        if cur: sizes[cur] = cnt
        cur = m.group(1); cnt = 0
    cnt += 1
if cur: sizes[cur] = cnt
print("\nlargest funcs:")
for k, v in sorted(sizes.items(), key=lambda kv: -kv[1])[:15]:
    print(f"{v:7d} {k}")
