"""MuSig2 (BIP-327) vector conformance + end-to-end session tests
(mirrors modules/musig/tests_impl.h, vectors from the reference's
generated vectors.h — same data the C tests consume)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from secp256k1_zkp_tpu.modules import eckey, musig, schnorrsig
from secp256k1_zkp_tpu.ops import field as F, group as G, scalar as S
from secp256k1_zkp_tpu.ops.limb import LB, MASK16

import musig_vectors
import oracle

pytestmark = pytest.mark.skipif(not musig_vectors.available(),
                                reason="musig vectors not available")


@pytest.fixture(scope="module")
def vec():
    return musig_vectors.load()


def b2a(bs):
    return jnp.asarray(np.array([list(b) for b in bs], dtype=np.uint8))


def parse_pks(ser33_list):
    pk, ok = jax.jit(eckey.pubkey_parse)(b2a(ser33_list))
    assert np.asarray(ok).all()
    return pk


def lane(pk: G.GE, i):
    return G.GE(LB(pk.x.v[i], MASK16), LB(pk.y.v[i], MASK16), pk.inf[i])


def test_key_agg_valid(vec):
    v = vec["key_agg"]
    for case in v["valid"]:
        pks = [parse_pks([v["pubkeys"][i]]) for i in case["indices"]]
        agg_x, cache, ok = jax.jit(musig.pubkey_agg)(pks)
        assert np.asarray(ok).all()
        assert bytes(np.asarray(agg_x)[0]) == case["expected"]


def test_key_agg_tweak_errors(vec):
    v = vec["key_agg"]
    # error cases 3/4 are tweak failures (tweak = n, or x-only tweak that
    # leads to infinity); cases 0-2 are unparseable pubkeys.
    for case in v["error"][:3]:
        bad = [v["pubkeys"][i] for i in case["indices"]]
        _, ok = jax.jit(eckey.pubkey_parse)(b2a(bad))
        assert not np.asarray(ok).all()
    for case in v["error"][3:]:
        pks = [parse_pks([v["pubkeys"][i]]) for i in case["indices"]]
        _, cache, ok0 = jax.jit(musig.pubkey_agg)(pks)
        assert np.asarray(ok0).all()
        t_idx = case["tweak_indices"][0]
        xonly = bool(case["is_xonly"][0])
        tw = b2a([v["tweaks"][t_idx]])
        _, _, ok = jax.jit(
            lambda c, t, xo=xonly: musig.pubkey_tweak_add(c, t, xo))(
            cache, tw)
        assert not np.asarray(ok).all()


def test_nonce_gen(vec):
    for case in vec["nonce_gen"]:
        pk, pk_ok = jax.jit(eckey.pubkey_parse)(b2a([case["pk"]]))
        assert np.asarray(pk_ok).all()
        kwargs = {}
        args = dict(
            session_secrand32=b2a([case["rand"]]),
            pk=pk,
            sec32=b2a([case["sk"]]) if case["sk"] else None,
            msg32=b2a([case["msg"]]) if case["msg"] else None,
            agg_pk32=b2a([case["aggpk"]]) if case["aggpk"] else None,
            extra32=b2a([case["extra"]]) if case["extra"] else None,
        )
        secnonce, pubnonce, ok = jax.jit(
            lambda **kw: musig.nonce_gen(**kw))(**args)
        assert np.asarray(ok).all()
        k1, k2, _ = secnonce
        got_sec = (bytes(np.asarray(S.to_bytes_be(k1))[0])
                   + bytes(np.asarray(S.to_bytes_be(k2))[0])
                   + case["pk"])
        assert got_sec == case["expected_secnonce"]
        got_pub = bytes(np.asarray(
            jax.jit(musig.pubnonce_serialize)(pubnonce))[0])
        assert got_pub == case["expected_pubnonce"]


def test_nonce_agg(vec):
    v = vec["nonce_agg"]
    for case in v["valid"]:
        pns = []
        for i in case["indices"]:
            pn, ok = jax.jit(musig.pubnonce_parse)(b2a([v["pnonces"][i]]))
            assert np.asarray(ok).all()
            pns.append(pn)
        agg = jax.jit(lambda a, b: musig.nonce_agg([a, b]))(pns[0], pns[1])
        ser = bytes(np.asarray(jax.jit(musig.pubnonce_serialize)(agg))[0])
        assert ser == case["expected"]
    for case in v["error"]:
        bad = False
        for i in case["indices"]:
            _, ok = jax.jit(musig.pubnonce_parse)(b2a([v["pnonces"][i]]))
            bad = bad or not bool(np.asarray(ok).all())
        assert bad


def _sv_setup(vec):
    sv = vec["sign_verify_raw"]
    return {
        "sk": bytes(sv[0]),
        "pubkeys": [bytes(p) for p in sv[1]],
        "secnonces": [bytes(s) for s in sv[2]],
        "pubnonces": [bytes(p) for p in sv[3]],
        "aggnonces": [bytes(a) for a in sv[4]],
        "msgs": [bytes(m) for m in sv[5]],
        "valid": [{"key_indices": c[1][:c[0]], "aggnonce_index": c[2],
                   "msg_index": c[3], "signer_index": c[4],
                   "expected": bytes(c[5])} for c in sv[6]],
    }


def test_sign_vectors(vec):
    sv = _sv_setup(vec)
    sk = sv["sk"]
    # secnonce[0] = k1(32) || k2(32) || ser33 pk? (reference secnonce data
    # is 64 bytes of k + 64-byte ge; the vectors store k1||k2||pk33)
    secn = sv["secnonces"][0]
    k1b, k2b, pk33 = secn[:32], secn[32:64], secn[64:]

    for case in sv["valid"]:
        pks = [parse_pks([sv["pubkeys"][i]]) for i in case["key_indices"]]
        agg_x, cache, ok = jax.jit(musig.pubkey_agg)(pks)
        assert np.asarray(ok).all()

        aggnonce, an_ok = jax.jit(musig.pubnonce_parse)(
            b2a([sv["aggnonces"][case["aggnonce_index"]]]))
        assert np.asarray(an_ok).all()
        msg = b2a([sv["msgs"][case["msg_index"]]])

        session = jax.jit(musig.nonce_process)(aggnonce, msg, cache)

        k1, _ = S.from_bytes_be(b2a([k1b]))
        k2, _ = S.from_bytes_be(b2a([k2b]))
        nonce_pk, _ = jax.jit(eckey.pubkey_parse)(b2a([pk33]))
        d, _ = S.from_bytes_be(b2a([sk]))
        signer_pk = pks[case["signer_index"]]

        psig, ok = jax.jit(musig.partial_sign)(
            (k1, k2, nonce_pk), d, signer_pk, cache, session)
        assert np.asarray(ok).all()
        got = bytes(np.asarray(S.to_bytes_be(psig))[0])
        assert got == case["expected"], case

        # and partial verification succeeds.  The signer is always
        # participant 0's key/nonce (reordered via key_indices), so the
        # signer's own pubnonce is pubnonces[0] — matching the
        # reference harness (tests_impl.h:1064-1065), NOT
        # pubnonces[signer_index].
        pn, _ = jax.jit(musig.pubnonce_parse)(b2a([sv["pubnonces"][0]]))
        vok = jax.jit(musig.partial_sig_verify)(
            psig, pn, signer_pk, cache, session)
        assert np.asarray(vok).all(), case


def test_tweak_vectors(vec):
    tw = vec["tweak_raw"]
    sk = bytes(tw[0])
    secn = bytes(tw[1])
    aggn = bytes(tw[2])
    msg = bytes(tw[3])
    pubkeys = [bytes(p) for p in tw[4]]
    pubnonces = [bytes(p) for p in tw[5]]
    tweaks = [bytes(t) for t in tw[6]]
    valid = [{"key_indices": c[1][:c[0]], "nonce_indices": c[3][:c[2]],
              "tweak_indices": c[5][:c[4]], "is_xonly": c[6],
              "signer_index": c[7], "expected": bytes(c[8])}
             for c in tw[7]]

    k1b, k2b, pk33 = secn[:32], secn[32:64], secn[64:]
    for case in valid:
        pks = [parse_pks([pubkeys[i]]) for i in case["key_indices"]]
        agg_x, cache, ok = jax.jit(musig.pubkey_agg)(pks)
        assert np.asarray(ok).all()
        for j, t_idx in enumerate(case["tweak_indices"]):
            xonly = bool(case["is_xonly"][j])
            _, cache, t_ok = jax.jit(
                lambda c, t, xo=xonly: musig.pubkey_tweak_add(c, t, xo))(
                cache, b2a([tweaks[t_idx]]))
            assert np.asarray(t_ok).all()

        aggnonce, _ = jax.jit(musig.pubnonce_parse)(b2a([aggn]))
        session = jax.jit(musig.nonce_process)(aggnonce, b2a([msg]), cache)

        k1, _ = S.from_bytes_be(b2a([k1b]))
        k2, _ = S.from_bytes_be(b2a([k2b]))
        nonce_pk, _ = jax.jit(eckey.pubkey_parse)(b2a([pk33]))
        d, _ = S.from_bytes_be(b2a([sk]))
        signer_pk = pks[case["signer_index"]]

        psig, ok = jax.jit(musig.partial_sign)(
            (k1, k2, nonce_pk), d, signer_pk, cache, session)
        assert np.asarray(ok).all()
        assert bytes(np.asarray(S.to_bytes_be(psig))[0]) == \
            case["expected"], case
        # signer's pubnonce = pubnonces[nonce_indices[signer_index]]
        # (tests_impl.h:1189)
        pn, _ = jax.jit(musig.pubnonce_parse)(
            b2a([pubnonces[case["nonce_indices"][case["signer_index"]]]]))
        vok = jax.jit(musig.partial_sig_verify)(
            psig, pn, signer_pk, cache, session)
        assert np.asarray(vok).all(), case


def test_sig_agg_vectors(vec):
    sa = vec["sig_agg_raw"]
    pubkeys = [bytes(p) for p in sa[0]]
    tweaks = [bytes(t) for t in sa[1]]
    psigs = [bytes(p) for p in sa[2]]
    msg = bytes(sa[3])
    valid = [{"key_indices": c[1][:c[0]], "tweak_indices": c[3][:c[2]],
              "is_xonly": c[4], "aggnonce": bytes(c[5]),
              "psig_indices": c[7][:c[6]], "expected": bytes(c[8])}
             for c in sa[4]]
    for case in valid:
        pks = [parse_pks([pubkeys[i]]) for i in case["key_indices"]]
        agg_x, cache, ok = jax.jit(musig.pubkey_agg)(pks)
        for j, t_idx in enumerate(case["tweak_indices"]):
            xonly = bool(case["is_xonly"][j])
            _, cache, _ = jax.jit(
                lambda c, t, xo=xonly: musig.pubkey_tweak_add(c, t, xo))(
                cache, b2a([tweaks[t_idx]]))
        aggnonce, _ = jax.jit(musig.pubnonce_parse)(b2a([case["aggnonce"]]))
        session = jax.jit(musig.nonce_process)(aggnonce, b2a([msg]), cache)
        parts = []
        for i in case["psig_indices"]:
            p, _ = S.from_bytes_be(b2a([psigs[i]]))
            parts.append(p)
        sig64 = jax.jit(lambda s, *ps: musig.partial_sig_agg(s, list(ps)))(
            session, *parts)
        assert bytes(np.asarray(sig64)[0]) == case["expected"], case


def test_end_to_end_2of2(rng):
    """Full 2-of-2 session: keygen, nonces, sign, aggregate, verify with
    plain BIP-340 verification (musig tests_impl.h scenario)."""
    n = 2
    secs = [int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
            for _ in range(n)]
    pubs = [oracle.point_mul(d, oracle.G) for d in secs]
    msg = rng.bytes(32)

    pks = [parse_pks([bytes([2 + (p[1] & 1)]) + p[0].to_bytes(32, "big")])
           for p in pubs]
    agg_x, cache, ok = jax.jit(musig.pubkey_agg)(pks)
    assert np.asarray(ok).all()

    secnonces, pubnonces = [], []
    for i in range(n):
        sn, pn, ok = jax.jit(
            lambda r, pk, s, m, a: musig.nonce_gen(r, pk, s, m, a))(
            b2a([rng.bytes(32)]), pks[i],
            b2a([secs[i].to_bytes(32, "big")]), b2a([msg]), agg_x)
        assert np.asarray(ok).all()
        secnonces.append(sn)
        pubnonces.append(pn)

    aggnonce = jax.jit(lambda a, b: musig.nonce_agg([a, b]))(
        pubnonces[0], pubnonces[1])
    session = jax.jit(musig.nonce_process)(aggnonce, b2a([msg]), cache)

    psigs = []
    for i in range(n):
        d, _ = S.from_bytes_be(b2a([secs[i].to_bytes(32, "big")]))
        psig, ok = jax.jit(musig.partial_sign)(
            secnonces[i], d, pks[i], cache, session)
        assert np.asarray(ok).all()
        vok = jax.jit(musig.partial_sig_verify)(
            psig, pubnonces[i], pks[i], cache, session)
        assert np.asarray(vok).all()
        psigs.append(psig)

    sig64 = jax.jit(lambda s, a, b: musig.partial_sig_agg(s, [a, b]))(
        session, psigs[0], psigs[1])
    final = jax.jit(schnorrsig.verify)(b2a([msg]), sig64, agg_x)
    assert np.asarray(final).all()
