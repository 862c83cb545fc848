#!/usr/bin/env python
"""Internal microbenchmarks — the analog of src/bench_internal.c:441-474
and src/bench_ecmult.c: per-primitive-op timings on the attached device.

Prints one `name,us_per_op,Mops_per_s` line per primitive (CSV, like
the reference's bench table).  Every op is batched over B lanes, so
"op" means one lane's worth of work; the timing discipline is a chained
lax.fori_loop (each iteration consumes the last result, re-normalized
so the carry pytree structure is fixed) so XLA cannot dead-code or
reorder the chain — the same role as the reference's accumulating
loops (src/bench_internal.c:98-110).  Field/scalar rows therefore
include one normalize; subtract the `*_normalize` row to isolate.

Env: SECP_TPU_BENCH_BATCH (default 16384), SECP_TPU_BENCH_REPS (default
32 chained iterations), SECP_TPU_BENCH_FILTER substring filter.
"""

import os
import time

import numpy as np

B = int(os.environ.get("SECP_TPU_BENCH_BATCH", "16384"))
REPS = int(os.environ.get("SECP_TPU_BENCH_REPS", "32"))
FILT = os.environ.get("SECP_TPU_BENCH_FILTER", "")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/secp_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from secp256k1_zkp_tpu.ops import field as F
    from secp256k1_zkp_tpu.ops import group as G
    from secp256k1_zkp_tpu.ops import scalar as S
    from secp256k1_zkp_tpu.ops import sha256 as H
    from secp256k1_zkp_tpu.ops.limb import LB, MASK16

    rng = np.random.default_rng(7)

    def rand_limb():
        v = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64)
        v[:, 15] &= 0x7FFF
        return LB(jnp.asarray(v.astype(np.uint32)), MASK16)

    a, b = rand_limb(), rand_limb()
    gx, gy = rand_limb(), rand_limb()

    def bench(name, fn, x):
        if FILT and FILT not in name:
            return

        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, REPS, lambda _, c: fn(c), x)

        def fence(out):
            # np.asarray of one leaf: the only real fence over the
            # tunnel (docs/PERF.md "Measurement discipline")
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf)

        fence(run(x))  # compile + warm
        t0 = time.perf_counter()
        fence(run(x))
        dt = time.perf_counter() - t0
        n_ops = B * REPS
        print(f"{name},{dt / n_ops * 1e6:.5f},{n_ops / dt / 1e6:.2f}",
              flush=True)

    print("op,us_per_op,Mops_per_s")
    nrm = F.normalize
    bench("field_normalize", nrm, a)
    bench("field_mul", lambda x: nrm(F.mul(x, b)), a)
    bench("field_sqr", lambda x: nrm(F.sqr(x)), a)
    bench("field_inv", F.inv, a)
    bench("field_sqrt", lambda x: F.sqrt(x)[0], a)
    bench("scalar_mul", lambda x: S.normalize(S.mul(x, b)), a)
    bench("scalar_inv", S.inv, a)
    bench("sha256_compress",
          lambda st: H.compress(st, jnp.broadcast_to(
              jnp.arange(16, dtype=jnp.uint32), (B, 16))),
          jnp.broadcast_to(jnp.asarray(H._INIT), (B, 8)) + 0)

    aff = G.GE(gx, gy, jnp.zeros(B, bool))
    start = G.gej_from_ge(aff)

    def renorm(p):
        return G.GEJ(nrm(p.x), nrm(p.y), nrm(p.z), p.inf)

    bench("gej_double", lambda p: renorm(G.gej_double(p)), start)
    bench("gej_add_ge", lambda p: renorm(G.gej_add_ge(p, aff)), start)
    bench("gej_add", lambda p: renorm(G.gej_add(p, G.gej_from_ge(aff))),
          start)

    if jax.default_backend() not in ("cpu",):
        from secp256k1_zkp_tpu.ops import pallas_gen as PGEN
        bench("ecmult_gen_kernel(k*G)",
              lambda kt: PGEN.ecmult_gen_tpu(kt)[0], jnp.transpose(a.v))


if __name__ == "__main__":
    main()
