"""ECDSA sign/verify/recover parity vs the oracle (mirrors the "ecdsa"
registry + recovery module tests, src/tests.c, SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from secp256k1_zkp_tpu.modules import ecdsa, eckey
from secp256k1_zkp_tpu.ops import field as F, group as G
from secp256k1_zkp_tpu.ops.limb import LB, MASK16, limbs_to_int_np

import oracle


def b2a(bs):
    return jnp.asarray(np.array([list(b) for b in bs], dtype=np.uint8))


def mk_lb(vals):
    return LB(jnp.asarray(np.array(
        [[(v >> (16 * i)) & 0xFFFF for i in range(16)] for v in vals],
        dtype=np.uint32)), MASK16)


def mk_ge(pts):
    return G.GE(mk_lb([p[0] for p in pts]), mk_lb([p[1] for p in pts]),
                jnp.zeros(len(pts), bool))


def setup(rng, n=6):
    secs = [int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
            for _ in range(n)]
    msgs = [rng.bytes(32) for _ in range(n)]
    pubs = [oracle.point_mul(d, oracle.G) for d in secs]
    return secs, msgs, pubs


def test_sign_matches_oracle(rng):
    secs, msgs, pubs = setup(rng)
    sig64, recid, ok = jax.jit(ecdsa.sign)(
        b2a(msgs), b2a([s.to_bytes(32, "big") for s in secs]))
    assert np.asarray(ok).all()
    sigs = np.asarray(sig64)
    recids = np.asarray(recid)
    for i, (d, m) in enumerate(zip(secs, msgs)):
        r, s, rid = oracle.ecdsa_sign(m, d)
        got_r = int.from_bytes(bytes(sigs[i, :32]), "big")
        got_s = int.from_bytes(bytes(sigs[i, 32:]), "big")
        assert (got_r, got_s, int(recids[i])) == (r, s, rid)


def test_sign_verify_roundtrip(rng):
    secs, msgs, pubs = setup(rng)
    sec_b = b2a([s.to_bytes(32, "big") for s in secs])
    msg_b = b2a(msgs)

    @jax.jit
    def go(msg_b, sec_b, pub):
        sig64, recid, ok = ecdsa.sign(msg_b, sec_b)
        good = ecdsa.verify(msg_b, sig64, pub)
        # wrong message must fail
        bad = ecdsa.verify(msg_b[::-1], sig64, pub)
        return ok, good, bad

    ok, good, bad = go(msg_b, sec_b, mk_ge(pubs))
    assert np.asarray(ok).all()
    assert np.asarray(good).all()
    assert not np.asarray(bad).any()


def test_verify_oracle_sigs_and_rejections(rng):
    secs, msgs, pubs = setup(rng, 4)
    sigs = [oracle.ecdsa_sign(m, d)[:2] for m, d in zip(msgs, secs)]
    sig64 = b2a([r.to_bytes(32, "big") + s.to_bytes(32, "big")
                 for r, s in sigs])
    ok = jax.jit(ecdsa.verify)(b2a(msgs), sig64, mk_ge(pubs))
    assert np.asarray(ok).all()

    # high-S must be rejected (low-S rule, secp256k1.c:498)
    sig_hi = b2a([r.to_bytes(32, "big") + (oracle.N - s).to_bytes(32, "big")
                  for r, s in sigs])
    ok = jax.jit(ecdsa.verify)(b2a(msgs), sig_hi, mk_ge(pubs))
    assert not np.asarray(ok).any()

    # zero r or s must be rejected
    sig_z = b2a([b"\x00" * 32 + s.to_bytes(32, "big") for r, s in sigs])
    ok = jax.jit(ecdsa.verify)(b2a(msgs), sig_z, mk_ge(pubs))
    assert not np.asarray(ok).any()


def test_recover(rng):
    secs, msgs, pubs = setup(rng, 4)
    sec_b = b2a([s.to_bytes(32, "big") for s in secs])
    msg_b = b2a(msgs)

    @jax.jit
    def go(msg_b, sec_b):
        sig64, recid, ok = ecdsa.sign(msg_b, sec_b)
        q, rok = ecdsa.recover(msg_b, sig64, recid)
        return q, rok & ok

    q, ok = go(msg_b, sec_b)
    assert np.asarray(ok).all()
    xs = np.asarray(F.normalize(q.x).v)
    ys = np.asarray(F.normalize(q.y).v)
    for i, pub in enumerate(pubs):
        assert (limbs_to_int_np(xs[i]), limbs_to_int_np(ys[i])) == pub


def test_pubkey_create_parse_serialize(rng):
    secs, msgs, pubs = setup(rng, 4)
    sec_b = b2a([s.to_bytes(32, "big") for s in secs])

    @jax.jit
    def go(sec_b):
        pk, ok = eckey.pubkey_create(sec_b2lb(sec_b))
        comp = eckey.pubkey_serialize(pk, compressed=True)
        uncomp = eckey.pubkey_serialize(pk, compressed=False)
        pk2, ok2 = eckey.pubkey_parse(comp)
        pk3, ok3 = eckey.pubkey_parse(uncomp)
        return pk, comp, uncomp, ok & ok2 & ok3, pk2, pk3

    def sec_b2lb(b):
        from secp256k1_zkp_tpu.ops import scalar as S
        x, _ = S.from_bytes_be(b)
        return x

    pk, comp, uncomp, ok, pk2, pk3 = go(sec_b)
    assert np.asarray(ok).all()
    comp = np.asarray(comp)
    for i, (x, y) in enumerate(pubs):
        exp = bytes([2 + (y & 1)]) + x.to_bytes(32, "big")
        assert bytes(comp[i]) == exp
    for q in (pk2, pk3):
        xs = np.asarray(F.normalize(q.x).v)
        ys = np.asarray(F.normalize(q.y).v)
        for i, pub in enumerate(pubs):
            assert (limbs_to_int_np(xs[i]), limbs_to_int_np(ys[i])) == pub


def test_tweaks(rng):
    from secp256k1_zkp_tpu.ops import scalar as S
    secs, msgs, pubs = setup(rng, 4)
    tweaks = [int.from_bytes(rng.bytes(32), "big") % oracle.N
              for _ in range(4)]

    @jax.jit
    def go(d, t, p):
        s_add, ok1 = eckey.privkey_tweak_add(d, t)
        s_mul, ok2 = eckey.privkey_tweak_mul(d, t)
        p_add, ok3 = eckey.pubkey_tweak_add(p, t)
        p_mul, ok4 = eckey.pubkey_tweak_mul(p, t)
        return s_add, s_mul, p_add, p_mul, ok1 & ok2 & ok3 & ok4

    s_add, s_mul, p_add, p_mul, ok = go(mk_lb(secs), mk_lb(tweaks),
                                        mk_ge(pubs))
    assert np.asarray(ok).all()
    sa = [limbs_to_int_np(r) for r in np.asarray(s_add.v)]
    sm = [limbs_to_int_np(r) for r in np.asarray(s_mul.v)]
    assert sa == [(d + t) % oracle.N for d, t in zip(secs, tweaks)]
    assert sm == [(d * t) % oracle.N for d, t in zip(secs, tweaks)]
    for q, exp_fn in ((p_add, lambda p, t: oracle.point_add(
            p, oracle.point_mul(t, oracle.G))),
            (p_mul, lambda p, t: oracle.point_mul(t, p))):
        xs = np.asarray(F.normalize(q.x).v)
        for i, (p, t) in enumerate(zip(pubs, tweaks)):
            assert limbs_to_int_np(xs[i]) == exp_fn(p, t)[0]


def test_recovery_module_roundtrip(rng):
    """Recoverable-signature module surface: serialize/parse compact,
    convert, recover (mirrors modules/recovery tests)."""
    from secp256k1_zkp_tpu.modules import recovery

    secs, msgs, pubs = setup(rng, 4)
    sec_b = b2a([s.to_bytes(32, "big") for s in secs])
    msg_b = b2a(msgs)

    @jax.jit
    def go(msg_b, sec_b):
        sig64, recid, ok = recovery.sign_recoverable(msg_b, sec_b)
        sig65 = recovery.serialize_compact(sig64, recid)
        s64, rid, pok = recovery.parse_compact(sig65)
        q, rok = recovery.recover(msg_b, s64, rid)
        std = recovery.to_standard(s64, rid)
        vok = ecdsa.verify(msg_b, std, q)
        return q, ok & pok & rok & vok, sig65

    q, ok, sig65 = go(msg_b, sec_b)
    assert np.asarray(ok).all()
    xs = np.asarray(F.normalize(q.x).v)
    for i, pub in enumerate(pubs):
        assert limbs_to_int_np(xs[i]) == pub[0]

    # parity with the host oracle recover
    s65 = np.asarray(sig65)
    for i in range(len(secs)):
        r = int.from_bytes(bytes(s65[i, :32].tolist()), "big")
        s = int.from_bytes(bytes(s65[i, 32:64].tolist()), "big")
        rid = int(s65[i, 64])
        got = oracle.ecdsa_recover(msgs[i], r, s, rid)
        assert got == pubs[i]

    # invalid recid rejected
    bad65 = s65.copy()
    bad65[:, 64] = 7
    _, _, pok = recovery.parse_compact(jnp.asarray(bad65))
    assert not np.asarray(pok).any()
