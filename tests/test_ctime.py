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

    # wider secret-consuming sweep, mirroring the reference's ctime
    # coverage list (src/ctime_tests.c:53-82): keygen, recovery,
    # ellswift, s2c/anti-exfil, adaptor encrypt/decrypt, musig.
    from secp256k1_zkp_tpu.modules import (ecdsa_adaptor, ecdsa_s2c,
                                           ellswift, extrakeys, musig,
                                           recovery)

    def keypair_fn(sec32):
        return extrakeys.keypair_create(sec32)

    def recovery_fn(msg32, sec32):
        return recovery.sign_recoverable(msg32, sec32)

    def ellswift_create_fn(sec32, aux32):
        return ellswift.create(sec32, aux32)

    def ellswift_xdh_fn(ell_a, ell_b, sec32):
        return ellswift.xdh(ell_a, ell_b, sec32, party_a=True)

    def s2c_fn(msg32, sec32, data32):
        return ecdsa_s2c.sign(msg32, sec32, data32)

    def adaptor_encrypt_fn(sec32, enc33, msg32):
        ek, _ = eckey.pubkey_parse(enc33)
        return ecdsa_adaptor.encrypt(sec32, ek, msg32)

    def adaptor_decrypt_fn(deckey32, adaptor162):
        return ecdsa_adaptor.decrypt(deckey32, adaptor162)

    def musig_fn(sec32, secrand32, msg32, pub33):
        from secp256k1_zkp_tpu.ops import scalar as S
        d, _ = S.from_bytes_be(sec32)
        pk, _ = eckey.pubkey_create(d)
        pk2, _ = eckey.pubkey_parse(pub33)
        _, cache, _ = musig.pubkey_agg([pk, pk2])
        secnonce, pubnonce, _ = musig.nonce_gen(
            secrand32, pk, sec32=sec32, msg32=msg32)
        aggnonce = musig.nonce_agg([pubnonce, pubnonce])
        session = musig.nonce_process(aggnonce, msg32, cache)
        return musig.partial_sign(secnonce, d, pk, cache, session)

    ell64 = jnp.zeros((B, 64), jnp.uint8)
    adaptor162 = jnp.zeros((B, 162), jnp.uint8)
    # a valid parseable compressed point (the generator)
    from secp256k1_zkp_tpu.utils import hostcurve
    g33 = bytes([2 + (hostcurve.G[1] & 1)]) + hostcurve.G[0].to_bytes(32,
                                                                      "big")
    gpt = jnp.asarray(np.tile(np.frombuffer(g33, np.uint8), (B, 1)))

    return {
        "ecdsa_sign": (ecdsa.sign, (msg, sec)),
        "schnorr_sign": (schnorrsig.sign, (msg, sec)),
        "ecdh": (ecdh_fn, (sec, gpt)),
        "seckey_tweak": (tweak_fn, (sec, msg)),
        "keypair_create": (keypair_fn, (sec,)),
        "recovery_sign": (recovery_fn, (msg, sec)),
        "ellswift_create": (ellswift_create_fn, (sec, msg)),
        "ellswift_xdh": (ellswift_xdh_fn, (ell64, ell64, sec)),
        "s2c_sign": (s2c_fn, (msg, sec, msg)),
        "adaptor_encrypt": (adaptor_encrypt_fn, (sec, gpt, msg)),
        "adaptor_decrypt": (adaptor_decrypt_fn, (sec, adaptor162)),
        "musig_partial_sign": (musig_fn, (sec, msg, msg, gpt)),
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
    # Same shapes, different input values -> byte-identical HLO, over
    # the FULL secret-consuming sweep (the program a secret flows
    # through is the same program for every secret — the strongest
    # whole-pipeline constant-time claim; reference bar:
    # src/ctime_tests.c:53-82 runs valgrind over every such API).
    for name, (fn, args) in secret_entries.items():
        alt = tuple(
            jnp.asarray(np.full(a.shape, 0xA5, np.asarray(a).dtype))
            if np.asarray(a).dtype == np.uint8 else a
            for a in args)
        t1 = _lower_text(fn, *args)
        t2 = _lower_text(fn, *alt)
        assert t1 == t2, f"{name}: lowering depends on input values"
