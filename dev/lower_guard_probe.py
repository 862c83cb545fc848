"""Round-5 probe: find where verify_tpu lowering stalls (BENCH_r04 rc=124).

Stage-by-stage timing with flushed prints; transfer_guard("disallow")
turns implicit device->host fetches into errors naming the site.
"""
import faulthandler
import os
import sys
import time
faulthandler.dump_traceback_later(90, exit=True)

t_start = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter()-t_start:7.1f}s] {msg}", flush=True)


import numpy as np
log("numpy imported")
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/secp_tpu_jax_cache"))
log(f"jax imported, backend about to init")
log(f"backend = {jax.default_backend()} devices={jax.devices()}")

sys.path.insert(0, "/root/repo")
from secp256k1_zkp_tpu.modules import ecdsa
log("ecdsa module imported")

import jax.numpy as jnp
from secp256k1_zkp_tpu.ops import group as G
from secp256k1_zkp_tpu.ops.limb import LB, MASK16
log("ops imported")

B = 256
rng = np.random.default_rng(0)
msgs = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
sigs = jnp.asarray(rng.integers(0, 256, (B, 64), dtype=np.uint8))
pkx = jnp.asarray(rng.integers(0, 0xFFFF, (B, 16), dtype=np.int64).astype(np.uint32))
pky = jnp.asarray(rng.integers(0, 0xFFFF, (B, 16), dtype=np.int64).astype(np.uint32))
pk = G.GE(LB(pkx, MASK16), LB(pky, MASK16), jnp.zeros((B,), bool))
log("inputs placed on device")

with jax.transfer_guard("disallow"):
    log("tracing (jit.trace)...")
    try:
        traced = jax.jit(ecdsa.verify_tpu).trace(msgs, sigs, pk)
        log("trace done")
        lowered = traced.lower()
        log("LOWER OK (no fetches)")
    except Exception:
        log("EXCEPTION:")
        import traceback
        traceback.print_exc()
