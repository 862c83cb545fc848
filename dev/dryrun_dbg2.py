import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")
import gc
gc.disable()
import __graft_entry__
__graft_entry__._setup_jax()
import jax, jax.numpy as jnp
import dataclasses
from secp256k1_zkp_tpu import config as _cfg
_cfg.set_config(dataclasses.replace(_cfg.config(), jnp_window=1))
print("default_backend:", jax.default_backend(), flush=True)
from secp256k1_zkp_tpu.modules import schnorrsig
from secp256k1_zkp_tpu.ops import sha256 as H
print("_K devices:", H._K.devices(), flush=True)
x = jnp.zeros((4,), jnp.uint32)
print("fresh zeros devices:", x.devices(), flush=True)
