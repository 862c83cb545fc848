#!/usr/bin/env python
"""Multi-device MSM weak-scaling efficiency (BASELINE.md: >= 85% at
N >= 2 hosts).

Runs the point-sharded Pippenger MSM (parallel/msm_sharded.py) on
meshes of 1, 2, 4, ... devices with a FIXED per-device point count and
reports efficiency(N) = T(1) / T(N) — perfect weak scaling holds T(N)
flat because each device's bucket work is constant and only the
log2(N)-round EC-add tree reduction grows.

On real multi-chip hardware (`jax.devices()` > 1) this is the
deployment metric.  On a single-chip or CPU host it falls back to a
virtual device mesh (XLA_FLAGS=--xla_force_host_platform_device_count),
where all "devices" share the same cores: the number then measures the
sharding machinery's overhead (collective layout, reduction tree), not
ICI bandwidth — still the regression guard for the communication path,
and labeled `virtual: true` in the output.

Prints one JSON line per mesh size plus a summary efficiency line.
"""

import json
import os
import sys
import time

PER_DEV = int(os.environ.get("SECP_TPU_SCALE_POINTS", "4096"))
MAX_DEV = int(os.environ.get("SECP_TPU_SCALE_DEVICES", "8"))


def main():
    import jax
    virtual = False
    if os.environ.get("_SECP_SCALE_CHILD"):
        # The axon plugin out-prioritizes the JAX_PLATFORMS env var
        # (docs/PERF.md "round-4 findings" #1): the child must pin the
        # platform in-process BEFORE any backend query, or it sees the
        # single tunneled TPU again and bails.
        virtual = True
        jax.config.update("jax_platforms", "cpu")
    if jax.device_count() < 2:
        # re-exec under a virtual CPU mesh
        if os.environ.get("_SECP_SCALE_CHILD"):
            print("no multi-device backend", file=sys.stderr)
            return
        os.environ["_SECP_SCALE_CHILD"] = "1"
        os.environ["JAX_PLATFORMS"] = "cpu"
        # compile-small engines for the XLA:CPU virtual mesh (same
        # rationale as the dryrun, __graft_entry__.py)
        os.environ.setdefault("SECP_TPU_JNP_WINDOW", "1")
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={MAX_DEV}"
            " --xla_backend_optimization_level=1"
            " --xla_llvm_disable_expensive_passes=true").strip()
        os.execv(sys.executable, [sys.executable] + sys.argv)

    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/secp_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from secp256k1_zkp_tpu.ops import group as G
    from secp256k1_zkp_tpu.ops.limb import LB, MASK16
    from secp256k1_zkp_tpu.parallel.mesh import make_mesh, BATCH_AXIS
    from secp256k1_zkp_tpu.parallel.msm_sharded import msm_sharded

    rng = np.random.default_rng(11)
    times = {}
    sizes = []
    n = 1
    while n <= min(MAX_DEV, jax.device_count()):
        sizes.append(n)
        n *= 2

    for nd in sizes:
        npts = PER_DEV * nd
        ks_np = rng.integers(0, 1 << 16, (npts, 16), dtype=np.int64
                             ).astype(np.uint32)
        ks_np[:, 15] &= 0x7FFF
        px = rng.integers(0, 1 << 16, (npts, 16), dtype=np.int64
                          ).astype(np.uint32)
        py = rng.integers(0, 1 << 16, (npts, 16), dtype=np.int64
                          ).astype(np.uint32)
        # random (x, y) are not on-curve; the group law is on-curve-
        # agnostic arithmetic, so timings are identical and setup is
        # cheap (correctness of msm_sharded is tests/test_msm.py's job)
        mesh = make_mesh(nd)
        shard = NamedSharding(mesh, P(BATCH_AXIS))
        ks = LB(jax.device_put(jnp.asarray(ks_np), shard), MASK16)
        pts = G.GE(LB(jax.device_put(jnp.asarray(px), shard), MASK16),
                   LB(jax.device_put(jnp.asarray(py), shard), MASK16),
                   jax.device_put(jnp.zeros(npts, bool), shard))
        fn = jax.jit(lambda k, p, m=mesh: msm_sharded(m, k, p))
        np.asarray(fn(ks, pts).x.v)  # compile + warm (true fence)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(ks, pts)
        np.asarray(out.x.v)
        dt = (time.perf_counter() - t0) / reps
        times[nd] = dt
        print(json.dumps({
            "metric": "msm_sharded_time", "devices": nd,
            "points": npts, "value": round(dt * 1e3, 3), "unit": "ms",
            "virtual": virtual}), file=sys.stderr)

    # Batch-sharded verify weak scaling (the "dp" lane analog): one
    # valid (msg, sig, px) tiled to PER_DEV lanes per device — the
    # dataflow is fixed (branch-free lanes), so timing is input-
    # independent and one host-side signature suffices.
    from secp256k1_zkp_tpu.modules import schnorrsig
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import oracle
    from secp256k1_zkp_tpu.utils import hostcurve
    d = 0x1111111111111111111111111111111111111111111111111111111111111111
    msg = b"\x07" * 32
    sig = oracle.schnorr_sign(msg, d)
    px = oracle.point_mul(d, oracle.G)[0].to_bytes(32, "big")
    use_pallas = jax.default_backend() not in ("cpu",)
    vfn_inner = schnorrsig.verify_tpu if use_pallas else schnorrsig.verify
    vtimes = {}
    for nd in sizes:
        B = PER_DEV * nd
        mesh = make_mesh(nd)
        shard = NamedSharding(mesh, P(BATCH_AXIS))
        msgs = jax.device_put(jnp.asarray(
            np.tile(np.frombuffer(msg, np.uint8), (B, 1))), shard)
        sigs = jax.device_put(jnp.asarray(
            np.tile(np.frombuffer(sig, np.uint8), (B, 1))), shard)
        pxs = jax.device_put(jnp.asarray(
            np.tile(np.frombuffer(px, np.uint8), (B, 1))), shard)
        vfn = jax.jit(vfn_inner)
        assert np.asarray(vfn(msgs, sigs, pxs)).all()  # compile+check
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = vfn(msgs, sigs, pxs)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        vtimes[nd] = dt
        print(json.dumps({
            "metric": "verify_sharded_time", "devices": nd,
            "lanes": B, "value": round(dt * 1e3, 3), "unit": "ms",
            "virtual": virtual}), file=sys.stderr)

    def _eff(ts):
        """Weak-scaling efficiency T(1)/T(N) — except on a VIRTUAL
        mesh, where all devices share one host core, so perfect weak
        scaling shows T(N) = N*T(1) and the meaningful number is the
        work-normalized N*T(1)/T(N) (sharding-machinery overhead
        only; labeled virtual:true)."""
        if virtual:
            return sizes[-1] * ts[sizes[0]] / ts[sizes[-1]]
        return ts[sizes[0]] / ts[sizes[-1]]

    if len(sizes) > 1:
        eff = _eff(times)
        row = {
            "metric": "msm_weak_scaling_efficiency",
            "value": round(eff, 4),
            "unit": f"T(1)/T({sizes[-1]}), {PER_DEV} pts/device",
            "virtual": virtual,
            "vs_baseline": round(eff / 0.85, 4)}
        print(json.dumps(row))
        veff = _eff(vtimes)
        vrow = {
            "metric": "verify_weak_scaling_efficiency",
            "value": round(veff, 4),
            "unit": f"T(1)/T({sizes[-1]}), {PER_DEV} lanes/device",
            "virtual": virtual,
            "vs_baseline": round(veff / 0.85, 4)}
        print(json.dumps(vrow))
        # committed per-round artifact so the scaling trend is visible
        # even when only virtual meshes are reachable (VERDICT r2 w4)
        with open(os.environ.get("SECP_TPU_SCALING_OUT",
                                 "bench_scaling_latest.json"), "w") as f:
            json.dump({"rows": [
                {"devices": nd, "msm_ms": round(times[nd] * 1e3, 3),
                 "verify_ms": round(vtimes[nd] * 1e3, 3)}
                for nd in sizes], "msm": row, "verify": vrow}, f,
                indent=1)


if __name__ == "__main__":
    main()
