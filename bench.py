#!/usr/bin/env python
"""Benchmark: batched ECDSA verify throughput on the attached device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the project north star is >= 10M verifies/s on a v5e-8
(BASELINE.md), i.e. 1.25M verifies/s/chip; vs_baseline is measured
throughput / 1.25e6 on a single chip.

Extra per-workload rows (not the headline) can be printed to stderr with
SECP_TPU_BENCH_ALL=1.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("SECP_TPU_BENCH_BATCH", "16384"))
ITERS = int(os.environ.get("SECP_TPU_BENCH_ITERS", "10"))
PER_CHIP_TARGET = 10e6 / 8.0


def _rand_inputs(batch, rng):
    msgs = rng.integers(0, 256, (batch, 32), dtype=np.uint8)
    secs = rng.integers(0, 256, (batch, 32), dtype=np.uint8)
    secs[:, 0] &= 0x7F  # keep < n
    return msgs, secs


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/secp_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from secp256k1_zkp_tpu.modules import ecdsa, eckey
    from secp256k1_zkp_tpu.ops import scalar as S

    rng = np.random.default_rng(42)
    msgs_np, secs_np = _rand_inputs(BATCH, rng)
    msgs = jnp.asarray(msgs_np)
    secs = jnp.asarray(secs_np)

    @jax.jit
    def make_batch(msgs, secs):
        d, _ = S.from_bytes_be(secs)
        pk, _ = eckey.pubkey_create(d)
        sig, recid, ok = ecdsa.sign(msgs, secs)
        return sig, pk, ok

    sig, pk, ok = jax.block_until_ready(make_batch(msgs, secs))
    assert np.asarray(ok).all()

    # Stage inputs on device once; the measured loop moves only the
    # [B] result bits over the tunnel (throughput benchmark semantics —
    # production batches stream via async H2D copies that overlap the
    # previous batch's compute).
    msgs = jax.device_put(msgs)
    sig = jax.device_put(sig)
    pk = jax.tree.map(jax.device_put, pk)

    use_pallas = ecdsa._pallas_ok() and \
        not os.environ.get("SECP_TPU_BENCH_JNP")

    @jax.jit
    def verify(msgs, sig, pk):
        if use_pallas:
            return ecdsa.verify_tpu(msgs, sig, pk)
        return ecdsa.verify(msgs, sig, pk)

    out = verify(msgs, sig, pk)
    assert np.asarray(out).all(), "bench batch failed to verify"

    # Distinct input batches (different device buffers) so every
    # iteration is real work; enqueue all, then drain.  The drain reads
    # overlap later iterations' compute — production streaming
    # semantics — and np.asarray (not block_until_ready, which is lazy
    # on tunneled devices) is the only trustworthy fence.
    msg_sets = []
    for i in range(ITERS):
        mm = np.array(msgs_np)
        mm[:, 0] ^= np.uint8(i + 1)
        # re-sign so each batch is a fresh valid workload
        s_i, pk_i, ok_i = make_batch(jnp.asarray(mm), secs)
        msg_sets.append((jax.device_put(jnp.asarray(mm)),
                         jax.device_put(s_i), jax.tree.map(jax.device_put, pk_i)))
    for mm, s_i, pk_i in msg_sets:
        np.asarray(s_i)  # materialize staging outside the timed region

    t0 = time.perf_counter()
    outs = [verify(mm, s_i, pk_i) for mm, s_i, pk_i in msg_sets]
    results = [np.asarray(o) for o in outs]
    dt = time.perf_counter() - t0
    assert all(r.all() for r in results), "bench batch failed to verify"
    ops = BATCH * ITERS / dt

    print(json.dumps({
        "metric": "ecdsa_verify_throughput_per_chip",
        "value": round(ops, 1),
        "unit": "verifies/s",
        "vs_baseline": round(ops / PER_CHIP_TARGET, 4),
    }))

    if os.environ.get("SECP_TPU_BENCH_ALL"):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s2 = make_batch(msgs, secs)
        jax.block_until_ready(s2)
        dts = time.perf_counter() - t0
        print(json.dumps({
            "metric": "ecdsa_sign+keygen_throughput_per_chip",
            "value": round(BATCH * ITERS / dts, 1),
            "unit": "signs/s"}), file=sys.stderr)


if __name__ == "__main__":
    main()
