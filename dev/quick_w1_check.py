"""Fast correctness check of the window=1 Shamir ecmult + scan reduce."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    "--xla_backend_optimization_level=0 "
    "--xla_llvm_disable_expensive_passes=true")
os.environ["SECP_TPU_JNP_WINDOW"] = "1"
sys.path.insert(0, "/root/repo")
import gc
gc.disable()

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from secp256k1_zkp_tpu.ops import ecmult, field as F, group as G, msm
from secp256k1_zkp_tpu.ops.limb import LB, MASK16, limbs_to_int_np
from secp256k1_zkp_tpu.utils import hostcurve

rng = np.random.default_rng(5)
B = 4
u1s = [int.from_bytes(rng.bytes(32), "big") % hostcurve.N for _ in range(B)]
u2s = [int.from_bytes(rng.bytes(32), "big") % hostcurve.N for _ in range(B)]
# include edge cases: u2 = 0, P = G (so G+P = 2G), generic
u1s[0], u2s[0] = 0, 0
pts = [hostcurve.G] + [hostcurve.mul(i + 2) for i in range(B - 1)]


def to_lb(vals):
    return LB(jnp.asarray(np.array(
        [[(v >> (16 * i)) & 0xFFFF for i in range(16)] for v in vals],
        np.uint32)), MASK16)


u1 = to_lb(u1s)
u2 = to_lb(u2s)
P = G.GE(to_lb([p[0] for p in pts]), to_lb([p[1] for p in pts]),
         jnp.zeros(B, bool))

out = jax.jit(ecmult.ecmult)(u1, u2, P)
aff = G.ge_from_gej(out)
xs = np.asarray(F.normalize(aff.x).v)
infs = np.asarray(out.inf)
for i in range(B):
    e = hostcurve.add(hostcurve.mul(u1s[i]),
                      hostcurve.mul(u2s[i], pts[i]))
    if e is hostcurve.INF:
        assert infs[i], f"lane {i}: expected inf"
    else:
        got = limbs_to_int_np(xs[i])
        assert got == e[0], f"lane {i}: {hex(got)} != {hex(e[0])}"
print("shamir1 ecmult ok")

# tree reduce via scan
n = 8
ks = [i + 1 for i in range(n)]
pp = [hostcurve.mul(3 * i + 2) for i in range(n)]
prods = [hostcurve.mul(k, p) for k, p in zip(ks, pp)]
expect = None
for pr in prods:
    expect = hostcurve.add(expect, pr)
Pj = G.GEJ(to_lb([p[0] for p in prods]), to_lb([p[1] for p in prods]),
           LB(jnp.broadcast_to(
               jnp.zeros(16, jnp.uint32).at[0].set(1), (n, 16)), MASK16),
           jnp.zeros(n, bool))
red = jax.jit(msm._tree_reduce)(Pj)
ra = G.ge_from_gej(red)
gx = limbs_to_int_np(np.asarray(F.normalize(ra.x).v))
assert gx == expect[0], f"{hex(gx)} != {hex(expect[0])}"
print("scan tree_reduce ok")
