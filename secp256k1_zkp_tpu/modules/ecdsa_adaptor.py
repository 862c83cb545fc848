"""ECDSA adaptor signatures (DLC primitive), batched for TPU.

Counterpart of src/modules/ecdsa_adaptor/{main_impl.h, dleq_impl.h} and
include/secp256k1_ecdsa_adaptor.h: encrypt (pre-sign), verify, decrypt,
recover, with DLEQ equality proofs and the hardened BIP340-style nonce
function (tags "ECDSAadaptor/non", "ECDSAadaptor/aux", "DLEQ").

Adaptor signatures are 162 bytes: R(33) || R'(33) || s'(32) ||
dleq_e(32) || dleq_s(32).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import ecmult
from ..ops import field as F
from ..ops import group as G
from ..ops import scalar as S
from ..ops import sha256 as H


def _ser33(p: G.GE):
    pre = jnp.where(F.is_odd(p.y), 3, 2).astype(jnp.uint8)[..., None]
    return jnp.concatenate([pre, F.to_bytes_be(F.normalize(p.x))], axis=-1)


def _nonce(tag: str, key32, pk33, msg32, aux32=None):
    """Hardened nonce (nonce_function_ecdsa_adaptor_impl,
    main_impl.h:93): tagged(key[^aux-hash] || pk33 || msg)."""
    key = key32
    if aux32 is not None:
        mask = H.words_to_bytes32(
            H.tagged_hash_bytes("ECDSAadaptor/aux", aux32))
        key = jnp.bitwise_xor(key, mask)
    msg = jnp.concatenate([key, pk33, msg32], axis=-1)
    return H.words_to_bytes32(H.tagged_hash_bytes(tag, msg))


def _dleq_challenge(gen2: G.GE, r1: G.GE, r2: G.GE, p1: G.GE, p2: G.GE):
    """tagged(DLEQ)(p1||gen2||p2||r1||r2) (dleq_impl.h:62)."""
    msg = jnp.concatenate([_ser33(p1), _ser33(gen2), _ser33(p2),
                           _ser33(r1), _ser33(r2)], axis=-1)
    e_b = H.words_to_bytes32(H.tagged_hash_bytes("DLEQ", msg))
    e, _ = S.from_bytes_be(e_b)
    return e


def dleq_prove(sk, p1: G.GE, gen2: G.GE, p2: G.GE, aux32=None,
               table=None):
    """DLEQ proof that log_G(p1) == log_gen2(p2) == sk (dleq_impl.h:89).
    Returns (s, e, ok)."""
    # nonce: k = tagged(DLEQ)(sk32 || gen2_33 || sha256(p1_33||p2_33))
    sk32 = S.to_bytes_be(S.normalize(sk))
    pmsg = jnp.concatenate([_ser33(p1), _ser33(p2)], axis=-1)
    buf = H.words_to_bytes32(H.sha256_bytes(pmsg))
    k_b = _nonce("DLEQ", sk32, _ser33(gen2), buf, aux32)
    k, _ = S.from_bytes_be(k_b)
    ok = ~S.is_zero(k)
    r1 = G.ge_from_gej(ecmult.ecmult_gen(k, table))
    r2 = G.ge_from_gej(ecmult.ecmult_const(k, gen2))
    e = _dleq_challenge(gen2, r1, r2, p1, p2)
    s = S.normalize(S.add(S.mul(e, sk), k))
    return s, e, ok


def dleq_verify(s, e, p1: G.GE, gen2: G.GE, p2: G.GE, table=None):
    """dleq_impl.h:138."""
    neg_e = S.normalize(S.neg(S.FN.norm_if_needed(e)))
    r1j = ecmult.ecmult(s, neg_e, p1, table)            # sG - eP1
    t1 = ecmult.ecmult_const(neg_e, p2)                 # -e P2
    t2 = ecmult.ecmult_const(s, gen2)                   # s gen2
    r2j = G.gej_add(t2, t1)
    ok = ~r1j.inf & ~r2j.inf
    r1 = G.ge_from_gej(r1j)
    r2 = G.ge_from_gej(r2j)
    e_exp = _dleq_challenge(gen2, r1, r2, p1, p2)
    return ok & S.eq(e_exp, e)


def encrypt(sec32, enckey: G.GE, msg32, aux32=None, table=None):
    """Adaptor "encrypted" pre-signature (ecdsa_adaptor_encrypt,
    main_impl.h:152).  Returns (adaptor_sig162, ok)."""
    d, d_ovf = S.from_bytes_be(sec32)
    ok = ~d_ovf & ~S.is_zero(d)

    k_b = _nonce("ECDSAadaptor/non", sec32, _ser33(enckey), msg32, aux32)
    k, _ = S.from_bytes_be(k_b)
    ok = ok & ~S.is_zero(k)

    R = G.ge_from_gej(ecmult.ecmult_const(k, enckey))    # R = k*Y
    Rp = G.ge_from_gej(ecmult.ecmult_gen(k, table))      # R' = k*G

    dleq_s, dleq_e, p_ok = dleq_prove(k, Rp, enckey, R, aux32, table)
    ok = ok & p_ok

    sigr, _ = S.from_bytes_be(F.to_bytes_be(F.normalize(R.x)))
    ok = ok & ~S.is_zero(sigr)
    m, _ = S.from_bytes_be(msg32)
    sp = S.normalize(S.mul(S.inv(k), S.add(m, S.mul(sigr, d))))
    ok = ok & ~S.is_zero(sp)

    sig = jnp.concatenate(
        [_ser33(R), _ser33(Rp), S.to_bytes_be(sp),
         S.to_bytes_be(S.normalize(dleq_e)),
         S.to_bytes_be(S.normalize(dleq_s))], axis=-1)
    sig = jnp.where(ok[..., None], sig, jnp.zeros_like(sig))
    return sig, ok


def _parse162(adaptor162):
    from . import eckey
    R, r_ok = eckey.pubkey_parse(adaptor162[..., 0:33])
    sigr, _ = S.from_bytes_be(adaptor162[..., 1:33])
    Rp, rp_ok = eckey.pubkey_parse(adaptor162[..., 33:66])
    sp, sp_ovf = S.from_bytes_be(adaptor162[..., 66:98])
    e, _ = S.from_bytes_be(adaptor162[..., 98:130])
    s, s_ovf = S.from_bytes_be(adaptor162[..., 130:162])
    ok = r_ok & rp_ok & ~sp_ovf & ~s_ovf & ~S.is_zero(sigr) \
        & ~S.is_zero(sp)
    return R, sigr, Rp, sp, e, s, ok


def verify(adaptor162, pub: G.GE, msg32, enckey: G.GE, table=None):
    """main_impl.h:313: DLEQ verify + R' == s'^-1 (m G + R.x X)."""
    R, sigr, Rp, sp, e, s, ok = _parse162(adaptor162)
    ok = ok & dleq_verify(s, e, Rp, enckey, R, table)
    m, _ = S.from_bytes_be(msg32)
    sn = S.inv(sp)
    u1 = S.mul(sn, m)
    u2 = S.mul(sn, sigr)
    derived = ecmult.ecmult(u1, u2, pub, table)
    ok = ok & ~derived.inf & ~pub.inf & ~enckey.inf
    diff = G.gej_add_ge(G.gej_neg(derived), Rp)
    return ok & diff.inf


def decrypt(deckey32, adaptor162):
    """sig = (R.x, s' * y^-1, low-S) (main_impl.h:360).
    Returns (sig64, ok)."""
    y, y_ovf = S.from_bytes_be(deckey32)
    _, sigr, _, sp, _, _, p_ok = _parse162(adaptor162)
    ok = ~y_ovf & ~S.is_zero(y) & p_ok
    s = S.normalize(S.mul(S.inv(y), sp))
    s = S.select(S.is_high(s), S.normalize(S.neg(s)), s)
    sig64 = jnp.concatenate([S.to_bytes_be(S.normalize(sigr)),
                             S.to_bytes_be(s)], axis=-1)
    sig64 = jnp.where(ok[..., None], sig64, jnp.zeros_like(sig64))
    return sig64, ok


def recover(sig64, adaptor162, enckey: G.GE, table=None):
    """Extract the decryption key from a completed signature
    (main_impl.h:400).  Returns (deckey32, ok)."""
    _, adaptor_sigr, _, sp, _, _, p_ok = _parse162(adaptor162)
    r, r_ovf = S.from_bytes_be(sig64[..., :32])
    s, s_ovf = S.from_bytes_be(sig64[..., 32:])
    ok = p_ok & ~r_ovf & ~s_ovf & S.eq(adaptor_sigr, r) & ~S.is_zero(s)
    y = S.normalize(S.mul(S.inv(s), sp))
    # ECDSA malleability: accept y or -y by comparing Y = y*G with enckey
    yj = ecmult.ecmult_gen(y, table)
    Ye = G.ge_from_gej(yj)
    match = F.eq(Ye.x, enckey.x) & F.eq(Ye.y, enckey.y)
    neg_match = F.eq(Ye.x, enckey.x) & ~match
    y = S.select(neg_match, S.normalize(S.neg(y)), y)
    ok = ok & (match | neg_match) & ~yj.inf & ~enckey.inf
    out = S.to_bytes_be(y)
    return jnp.where(ok[..., None], out, jnp.zeros_like(out)), ok
