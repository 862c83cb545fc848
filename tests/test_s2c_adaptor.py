"""Sign-to-contract / anti-exfil + ECDSA adaptor signature differential
tests vs the reference C library (bit-exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from secp256k1_zkp_tpu.modules import ecdsa_adaptor as ada
from secp256k1_zkp_tpu.modules import ecdsa_s2c as s2c
from secp256k1_zkp_tpu.ops import field as F, group as G
from secp256k1_zkp_tpu.ops.limb import LB, MASK16

import coracle
import oracle

pytestmark = pytest.mark.skipif(not coracle.available(),
                                reason="reference C oracle unavailable")


def mk_ge(pts):
    mk = lambda vals: LB(jnp.asarray(np.array(
        [[(v >> (16 * i)) & 0xFFFF for i in range(16)] for v in vals],
        dtype=np.uint32)), MASK16)
    return G.GE(mk([p[0] for p in pts]), mk([p[1] for p in pts]),
                jnp.zeros(len(pts), bool))


def b2a(bs):
    return jnp.asarray(np.array([list(b) for b in bs], dtype=np.uint8))


def ser(pt):
    return bytes([2 + (pt[1] & 1)]) + pt[0].to_bytes(32, "big")


@pytest.fixture(scope="module")
def ref():
    return coracle.Ref()


def test_s2c_sign_bitexact(rng, ref):
    n = 2
    secs = [int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
            for _ in range(n)]
    msgs = [rng.bytes(32) for _ in range(n)]
    datas = [rng.bytes(32) for _ in range(n)]
    sec_b = b2a([s.to_bytes(32, "big") for s in secs])

    sig64, opening, ok = jax.jit(s2c.sign)(b2a(msgs), sec_b, b2a(datas))
    assert np.asarray(ok).all()
    sigs = np.asarray(sig64)
    op_ser = np.asarray(jax.jit(s2c._ser33)(opening))
    for i in range(n):
        exp = ref.ecdsa_s2c_sign(msgs[i], secs[i].to_bytes(32, "big"),
                                 datas[i])
        assert exp is not None
        assert bytes(sigs[i]) == exp[0], f"lane {i} sig"
        assert bytes(op_ser[i]) == exp[1], f"lane {i} opening"
        assert ref.ecdsa_s2c_verify_commit(bytes(sigs[i]), datas[i],
                                           exp[1])

    # our verify_commit accepts, and rejects wrong data
    vok = jax.jit(s2c.verify_commit)(sig64, b2a(datas), opening)
    assert np.asarray(vok).all()
    vbad = jax.jit(s2c.verify_commit)(sig64, b2a(datas[::-1]), opening)
    assert not np.asarray(vbad).any()

    # anti-exfil end-to-end
    pubs = [oracle.point_mul(d, oracle.G) for d in secs]
    host_ok = jax.jit(s2c.anti_exfil_host_verify)(
        sig64, b2a(msgs), mk_ge(pubs), b2a(datas), opening)
    assert np.asarray(host_ok).all()


def test_adaptor_roundtrip_bitexact(rng, ref):
    n = 2
    secs = [int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
            for _ in range(n)]
    deckeys = [int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
               for _ in range(n)]
    msgs = [rng.bytes(32) for _ in range(n)]
    encpts = [oracle.point_mul(y, oracle.G) for y in deckeys]
    pubs = [oracle.point_mul(d, oracle.G) for d in secs]
    sec_b = b2a([s.to_bytes(32, "big") for s in secs])
    deck_b = b2a([y.to_bytes(32, "big") for y in deckeys])

    a162, ok = jax.jit(ada.encrypt)(sec_b, mk_ge(encpts), b2a(msgs))
    assert np.asarray(ok).all()
    a_np = np.asarray(a162)
    for i in range(n):
        exp = ref.adaptor_encrypt(secs[i].to_bytes(32, "big"),
                                  ser(encpts[i]), msgs[i])
        assert exp is not None
        assert bytes(a_np[i]) == exp, f"lane {i} adaptor sig"
        assert ref.adaptor_verify(bytes(a_np[i]), ser(pubs[i]), msgs[i],
                                  ser(encpts[i]))

    vok = jax.jit(ada.verify)(a162, mk_ge(pubs), b2a(msgs),
                              mk_ge(encpts))
    assert np.asarray(vok).all()
    # wrong message fails
    vbad = jax.jit(ada.verify)(a162, mk_ge(pubs), b2a(msgs[::-1]),
                               mk_ge(encpts))
    assert not np.asarray(vbad).any()

    sig64, dok = jax.jit(ada.decrypt)(deck_b, a162)
    assert np.asarray(dok).all()
    sigs = np.asarray(sig64)
    for i in range(n):
        exp_sig = ref.adaptor_decrypt(deckeys[i].to_bytes(32, "big"),
                                      bytes(a_np[i]))
        assert bytes(sigs[i]) == exp_sig, f"lane {i} decrypted sig"
        # decrypted signature is a valid ECDSA signature
        r = int.from_bytes(exp_sig[:32], "big")
        s = int.from_bytes(exp_sig[32:], "big")
        assert oracle.ecdsa_verify(msgs[i], pubs[i], r, s)

    dec32, rok = jax.jit(ada.recover)(sig64, a162, mk_ge(encpts))
    assert np.asarray(rok).all()
    dec_np = np.asarray(dec32)
    for i in range(n):
        assert int.from_bytes(bytes(dec_np[i]), "big") == deckeys[i]
