"""Round-5: measure Python trace time of each Pallas sub-jit (the
BENCH_r04 stall is trace-time, not device fetches — see lower_guard_probe)."""
import os
import sys
import time

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"  # trace cost is backend-independent
import jax
import jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

B = 16384
TB = 4096


def t(name, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{name:40s} {time.perf_counter()-t0:7.2f}s", flush=True)
    return out


from secp256k1_zkp_tpu.ops import pallas_gen as PGEN
from secp256k1_zkp_tpu.ops import pallas_group as PG
from secp256k1_zkp_tpu.ops import pallas_field as PF
from secp256k1_zkp_tpu.ops import pallas_scalar as PS

digs37 = jnp.zeros((37, B), jnp.uint32)
digs52 = jnp.zeros((52, B), jnp.uint32)
l16 = jnp.zeros((16, B), jnp.uint32)
misc = jnp.zeros((4, B), jnp.uint32)

t("gen_call(w7 comb).trace", lambda: PGEN._gen_call(TB).trace(digs37))
t("glv_call.trace", lambda: PG._ecmult_glv_call(TB, True, 2).trace(
    digs52, l16, l16, misc, l16, l16, l16, l16))
t("lift_x.trace", lambda: jax.jit(PF.lift_x_tpu).trace(l16))
t("glv_split.trace", lambda: jax.jit(PS.glv_split_tpu).trace(l16))
t("affine_xy.trace", lambda: PGEN._affine_xy_call(TB).trace(l16, l16, l16))
t("muladd_n.trace", lambda: PGEN._muladd_n_call(TB).trace(
    l16, l16, l16, jnp.zeros((1, B), jnp.uint32)))
