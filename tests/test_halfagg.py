"""Schnorr half-aggregation parity (mirrors
modules/schnorrsig_halfagg/tests_impl.h)."""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from secp256k1_zkp_tpu.modules import halfagg

import oracle


def oracle_aggregate(triples):
    """triples: list of (msg32, pubx, sig64). Returns aggsig bytes."""
    th = oracle.sha256(b"HalfAgg/randomizer")
    transcript = th + th
    s_acc = 0
    rs = b""
    for i, (m, px, sig) in enumerate(triples):
        r = sig[:32]
        s = int.from_bytes(sig[32:], "big")
        transcript += r + px.to_bytes(32, "big") + m
        if i == 0:
            z = 1
        else:
            z = int.from_bytes(hashlib.sha256(transcript).digest(),
                               "big") % oracle.N
        s_acc = (s_acc + z * s) % oracle.N
        rs += r
    return rs + s_acc.to_bytes(32, "big")


def b2a(bs):
    return jnp.asarray(np.array([list(b) for b in bs], dtype=np.uint8))


def make_batch(rng, n_aggs, n):
    msgs = np.zeros((n_aggs, n, 32), np.uint8)
    pubx = np.zeros((n_aggs, n, 32), np.uint8)
    sigs = np.zeros((n_aggs, n, 64), np.uint8)
    aggs = []
    for a in range(n_aggs):
        triples = []
        for i in range(n):
            d = int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
            m = rng.bytes(32)
            sig = oracle.schnorr_sign(m, d)
            px = oracle.point_mul(d, oracle.G)[0]
            if oracle.point_mul(d, oracle.G)[1] & 1:
                pass
            triples.append((m, px, sig))
            msgs[a, i] = np.frombuffer(m, np.uint8)
            pubx[a, i] = np.frombuffer(px.to_bytes(32, "big"), np.uint8)
            sigs[a, i] = np.frombuffer(sig, np.uint8)
        aggs.append(oracle_aggregate(triples))
    return msgs, pubx, sigs, aggs


def test_aggregate_matches_oracle_and_verifies(rng):
    n = 3
    msgs, pubx, sigs, expected = make_batch(rng, 2, n)
    agg, ok = jax.jit(lambda m, p, s: halfagg.aggregate(m, p, s, n))(
        jnp.asarray(msgs), jnp.asarray(pubx), jnp.asarray(sigs))
    assert np.asarray(ok).all()
    got = np.asarray(agg)
    for a in range(2):
        assert bytes(got[a]) == expected[a]

    vok = jax.jit(lambda m, p, a: halfagg.aggverify(m, p, a, n))(
        jnp.asarray(msgs), jnp.asarray(pubx), agg)
    assert np.asarray(vok).all()

    # tampering must fail: flip one bit of s
    bad = got.copy()
    bad[:, -1] ^= 1
    vbad = jax.jit(lambda m, p, a: halfagg.aggverify(m, p, a, n))(
        jnp.asarray(msgs), jnp.asarray(pubx), jnp.asarray(bad))
    assert not np.asarray(vbad).any()

    # swapped messages must fail
    msgs2 = msgs.copy()
    msgs2[:, 0], msgs2[:, 1] = msgs[:, 1], msgs[:, 0]
    vswap = jax.jit(lambda m, p, a: halfagg.aggverify(m, p, a, n))(
        jnp.asarray(msgs2), jnp.asarray(pubx), agg)
    assert not np.asarray(vswap).any()


def test_single_sig_aggregate(rng):
    """n=1: aggsig = r || s and verification equals plain BIP-340."""
    msgs, pubx, sigs, expected = make_batch(rng, 2, 1)
    agg, ok = jax.jit(lambda m, p, s: halfagg.aggregate(m, p, s, 1))(
        jnp.asarray(msgs), jnp.asarray(pubx), jnp.asarray(sigs))
    assert np.asarray(ok).all()
    got = np.asarray(agg)
    for a in range(2):
        assert bytes(got[a]) == bytes(sigs[a, 0])  # z_0 = 1
    vok = jax.jit(lambda m, p, a: halfagg.aggverify(m, p, a, 1))(
        jnp.asarray(msgs), jnp.asarray(pubx), agg)
    assert np.asarray(vok).all()
