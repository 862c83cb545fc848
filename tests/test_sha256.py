"""SHA256 / tagged hash / HMAC / RFC6979 parity vs hashlib & the oracle
(mirrors run_sha256_* tests, src/tests.c:643-933)."""

import hashlib
import hmac as hmac_mod

import jax
import jax.numpy as jnp
import numpy as np

from secp256k1_zkp_tpu.ops import sha256 as H

import oracle


def b2a(bs_list):
    return jnp.asarray(np.array([list(b) for b in bs_list], dtype=np.uint8))


def words_np(x):
    return np.asarray(x)


def digest_bytes(words):
    w = np.asarray(words)
    out = []
    for row in w.reshape(-1, 8):
        out.append(b"".join(int(v).to_bytes(4, "big") for v in row))
    return out


def test_sha256_32bytes(rng):
    msgs = [rng.bytes(32) for _ in range(8)]
    got = digest_bytes(jax.jit(H.sha256_bytes)(b2a(msgs)))
    assert got == [hashlib.sha256(m).digest() for m in msgs]


def test_sha256_lengths(rng):
    for L in (0, 1, 55, 56, 63, 64, 65, 96, 128, 130):
        msgs = [rng.bytes(L) for _ in range(3)]
        arr = jnp.asarray(np.array([list(b) for b in msgs],
                                   dtype=np.uint8).reshape(3, L))
        got = digest_bytes(jax.jit(H.sha256_bytes)(arr))
        assert got == [hashlib.sha256(m).digest() for m in msgs], L


def test_sha256_words(rng):
    msgs = [rng.bytes(96) for _ in range(4)]
    words = jax.jit(H.bytes32_to_words)(
        b2a([m[:32] for m in msgs]))
    w_full = jnp.concatenate(
        [jax.jit(H.bytes32_to_words)(b2a([m[i:i + 32] for m in msgs]))
         for i in (0, 32, 64)], axis=-1)
    got = digest_bytes(jax.jit(H.sha256_words)(w_full))
    assert got == [hashlib.sha256(m).digest() for m in msgs]


def test_tagged_hash(rng):
    msgs = [rng.bytes(96) for _ in range(4)]
    arr = jnp.asarray(np.array([list(b) for b in msgs], dtype=np.uint8))
    got = digest_bytes(jax.jit(
        lambda a: H.tagged_hash_bytes("BIP0340/challenge", a))(arr))
    assert got == [oracle.tagged_hash("BIP0340/challenge", m) for m in msgs]


def test_hmac(rng):
    keys = [rng.bytes(32) for _ in range(4)]
    msgs = [rng.bytes(33) for _ in range(4)]
    kw = jax.jit(H.bytes32_to_words)(b2a(keys))
    arr = jnp.asarray(np.array([list(b) for b in msgs], dtype=np.uint8))
    got = digest_bytes(jax.jit(H.hmac_sha256_bytes)(kw, arr))
    assert got == [hmac_mod.new(k, m, hashlib.sha256).digest()
                   for k, m in zip(keys, msgs)]


def test_rfc6979(rng):
    secs = [rng.bytes(32) for _ in range(4)]
    msgs = [rng.bytes(32) for _ in range(4)]
    kw = jnp.concatenate([jax.jit(H.bytes32_to_words)(b2a(secs)),
                          jax.jit(H.bytes32_to_words)(b2a(msgs))], axis=-1)

    @jax.jit
    def gen2(kw):
        d = H.RFC6979(kw)
        return d.generate32(), d.generate32()

    o1, o2 = gen2(kw)
    exp1 = [oracle.rfc6979_nonce(s, m, counter=0)
            for s, m in zip(secs, msgs)]
    exp2 = [oracle.rfc6979_nonce(s, m, counter=1)
            for s, m in zip(secs, msgs)]
    assert digest_bytes(o1) == exp1
    assert digest_bytes(o2) == exp2
