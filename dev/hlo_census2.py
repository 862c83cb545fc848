import os, sys, re, collections
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
from secp256k1_zkp_tpu.modules import schnorrsig
from secp256k1_zkp_tpu.parallel.mesh import make_mesh, BATCH_AXIS
mesh = make_mesh(8)
shard = NamedSharding(mesh, P(BATCH_AXIS))
msgs = jax.device_put(jnp.zeros((8, 32), jnp.uint8), shard)
sigs = jax.device_put(jnp.zeros((8, 64), jnp.uint8), shard)
pubx = jax.device_put(jnp.zeros((8, 32), jnp.uint8), shard)
txt = jax.jit(schnorrsig.verify).lower(msgs, sigs, pubx).as_text()
cur, cnt, ops = None, 0, collections.Counter()
funcs = {}
for line in txt.splitlines():
    m = re.search(r"func\.func (?:private )?@(\S+)\(", line)
    if m:
        if cur: funcs[cur] = (cnt, ops)
        cur, cnt, ops = m.group(1), 0, collections.Counter()
    cnt += 1
    mo = re.search(r"stablehlo\.\w+", line)
    if mo: ops[mo.group(0)] += 1
if cur: funcs[cur] = (cnt, ops)
for k, (n, ops) in sorted(funcs.items(), key=lambda kv: -kv[1][0])[:4]:
    print(f"\n=== {k}: {n} lines")
    for op, c in ops.most_common(10):
        print(f"  {c:6d} {op}")
