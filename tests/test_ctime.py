"""Constant-time discipline, TPU form (SURVEY.md §5).

The reference's ctime_tests mark secrets as uninitialized memory and
let MSan/Valgrind flag secret-dependent branches or addressing
(src/ctime_tests.c).  Under XLA the analogous invariant is structural:
a jitted program's instruction stream is fixed at trace time, so
execution time cannot depend on runtime values unless the program
contains data-dependent control flow.  These tests assert that the
secret-consuming entry points lower to HLO with

  * no conditionals (`cond`/`select_n` is fine — select is branchless),
  * no data-dependent `while` trip counts (only counter-based loops
    from `lax.scan`/`fori_loop` whose bounds are trace-time constants),

and that lowering is bit-identical for different secret *values* —
the whole-program analog of "same instruction trace for any secret".
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _lower_text(fn, *args):
    return jax.jit(fn).lower(*args).as_text()


@pytest.fixture(scope="module")
def secret_entries():
    from secp256k1_zkp_tpu.modules import ecdsa, ecdh, schnorrsig
    from secp256k1_zkp_tpu.modules import eckey

    B = 4
    msg = jnp.zeros((B, 32), jnp.uint8)
    sec = jnp.ones((B, 32), jnp.uint8)
    pub33 = jnp.zeros((B, 33), jnp.uint8)

    def ecdh_fn(sec32, pub):
        p, ok = eckey.pubkey_parse(pub)
        return ecdh.ecdh(p, sec32)

    def tweak_fn(sec32, tweak32):
        from secp256k1_zkp_tpu.ops import scalar as S
        d, _ = S.from_bytes_be(sec32)
        t, _ = S.from_bytes_be(tweak32)
        return eckey.privkey_tweak_add(d, t)

    return {
        "ecdsa_sign": (ecdsa.sign, (msg, sec)),
        "schnorr_sign": (schnorrsig.sign, (msg, sec)),
        "ecdh": (ecdh_fn, (sec, pub33)),
        "seckey_tweak": (tweak_fn, (sec, msg)),
    }


def test_no_data_dependent_control_flow(secret_entries):
    for name, (fn, args) in secret_entries.items():
        txt = _lower_text(fn, *args)
        assert "stablehlo.if" not in txt, f"{name}: conditional in HLO"
        assert "stablehlo.case" not in txt, f"{name}: case in HLO"
        # while ops must be counter-based: every while condition compares
        # an iteration counter with a trace-time constant; XLA emits
        # these from scan/fori_loop.  A data-dependent loop would
        # compare against a runtime tensor value instead.  Heuristic:
        # reject any while whose condition block reads a non-scalar.
        # (scan conditions compare i32[] counters)
        for block in txt.split("stablehlo.while")[1:]:
            cond = block.split("do {")[0]
            assert "tensor<i32>" in cond or "tensor<i64>" in cond, (
                f"{name}: while condition not counter-shaped")


def test_lowering_identical_for_secret_values(secret_entries):
    # Same shapes, different secret values -> byte-identical HLO.
    from secp256k1_zkp_tpu.modules import ecdsa
    B = 4
    msg = jnp.zeros((B, 32), jnp.uint8)
    s1 = jnp.ones((B, 32), jnp.uint8)
    s2 = jnp.asarray(np.full((B, 32), 0xA5, np.uint8))
    t1 = _lower_text(ecdsa.sign, msg, s1)
    t2 = _lower_text(ecdsa.sign, msg, s2)
    assert t1 == t2
