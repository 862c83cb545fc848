"""ECDSA sign-to-contract (s2c) and anti-exfil (anti-klepto), batched.

Counterpart of src/modules/ecdsa_s2c/main_impl.h and the eccommit core
(src/eccommit_impl.h): the signature nonce point commits to 32 bytes of
data via R = R_orig + H_tag(s2c/ecdsa/point, ser33(R_orig)||data)*G; the
nonce itself derives from RFC6979 with extra input
H_tag(s2c/ecdsa/data, data) so the host can later verify no bias was
sneaked in (anti-exfil protocol, main_impl.h:131-199).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import ecmult
from ..ops import field as F
from ..ops import group as G
from ..ops import scalar as S
from ..ops import sha256 as H
from .ecdsa import _pick_nonce


def _ser33(p: G.GE):
    pre = jnp.where(F.is_odd(p.y), 3, 2).astype(jnp.uint8)[..., None]
    return jnp.concatenate([pre, F.to_bytes_be(F.normalize(p.x))], axis=-1)


def ec_commit_tweak(pub: G.GE, data32):
    """H_tag(s2c/ecdsa/point, ser33(pub) || data) as a scalar
    (ec_commit_tweak, src/eccommit_impl.h:28)."""
    msg = jnp.concatenate([_ser33(pub), data32], axis=-1)
    t_b = H.words_to_bytes32(H.tagged_hash_bytes("s2c/ecdsa/point", msg))
    t, ovf = S.from_bytes_be(t_b)
    return t, ~ovf & ~pub.inf


def ec_commit(pub: G.GE, data32, table=None):
    """pub + H(pub,data)*G (ec_commit, src/eccommit_impl.h:42).
    Returns (GE, ok)."""
    t, ok = ec_commit_tweak(pub, data32)
    cj = G.gej_add_ge(ecmult.ecmult_gen(t, table), pub)
    return G.ge_from_gej(cj), ok & ~cj.inf


def rfc6979_extra(msg32, sec32, extra32, counter_rounds: int = 2):
    """RFC6979 with 96-byte keydata sec||msg||extra
    (nonce_function_rfc6979 with ndata, secp256k1.c:519)."""
    kw = jnp.concatenate([H.bytes32_to_words(sec32),
                          H.bytes32_to_words(msg32),
                          H.bytes32_to_words(extra32)], axis=-1)
    drbg = H.RFC6979(kw)
    return jnp.stack([drbg.generate32() for _ in range(counter_rounds)],
                     axis=0)


def sign(msg32, sec32, s2c_data32, table=None):
    """s2c-aware ECDSA sign (ecdsa_s2c_sign, main_impl.h:56).

    Returns (sig64, opening GE (= R_orig), ok)."""
    d, d_ovf = S.from_bytes_be(sec32)
    d_ok = ~d_ovf & ~S.is_zero(d)

    ndata = H.words_to_bytes32(
        H.tagged_hash_bytes("s2c/ecdsa/data", s2c_data32))
    k, k_ok = _pick_nonce(rfc6979_extra(msg32, sec32, ndata))

    # opening: R_orig = k*G
    rj = ecmult.ecmult_gen(k, table)
    R_orig = G.ge_from_gej(rj)
    R_orig = G.GE(F.normalize(R_orig.x), F.normalize(R_orig.y), R_orig.inf)

    # tweak nonce (ec_commit_seckey, eccommit_impl.h:53)
    t, t_ok = ec_commit_tweak(R_orig, s2c_data32)
    k2 = S.normalize(S.add(k, t))
    k_ok = k_ok & t_ok & ~S.is_zero(k2)

    # standard ecdsa_sig_sign with nonce k2
    rj2 = ecmult.ecmult_gen(k2, table)
    R = G.ge_from_gej(rj2)
    r, _ = S.from_bytes_be(F.to_bytes_be(F.normalize(R.x)))
    m, _ = S.from_bytes_be(msg32)
    kinv = S.inv(k2)
    s = S.normalize(S.mul(kinv, S.add(m, S.mul(r, d))))
    high = S.is_high(s)
    s = S.select(high, S.normalize(S.neg(s)), s)
    ok = d_ok & k_ok & ~S.is_zero(r) & ~S.is_zero(s)
    sig64 = jnp.concatenate([S.to_bytes_be(r), S.to_bytes_be(s)], axis=-1)
    sig64 = jnp.where(ok[..., None], sig64, jnp.zeros_like(sig64))
    return sig64, R_orig, ok


def verify_commit(sig64, data32, opening: G.GE, table=None):
    """Check sig.r == x(opening + H(opening,data)*G) mod n
    (ecdsa_s2c_verify_commit, main_impl.h:88)."""
    commit, ok = ec_commit(opening, data32, table)
    # x as scalar, overflow NOT checked (see reference comment)
    x_b = F.to_bytes_be(F.normalize(commit.x))
    x_s, _ = S.from_bytes_be(x_b)
    r, _ = S.from_bytes_be(sig64[..., :32])
    return ok & S.eq(r, x_s)


def anti_exfil_host_commit(rand32):
    """rand_commitment = H_tag(s2c/ecdsa/data, rand32)
    (main_impl.h:131)."""
    return H.words_to_bytes32(
        H.tagged_hash_bytes("s2c/ecdsa/data", rand32))


def anti_exfil_signer_commit(msg32, sec32, rand_commitment32, table=None):
    """Signer's nonce commitment R_orig = k*G with
    k = rfc6979(msg, sec, extra=rand_commitment) (main_impl.h:146).
    Returns (GE opening, ok)."""
    k, k_ok = _pick_nonce(
        rfc6979_extra(msg32, sec32, rand_commitment32))
    rj = ecmult.ecmult_gen(k, table)
    R = G.ge_from_gej(rj)
    return G.GE(F.normalize(R.x), F.normalize(R.y), R.inf), k_ok


def anti_exfil_sign(msg32, sec32, host_data32, table=None):
    """= s2c sign with the host's data (main_impl.h:181)."""
    sig64, _, ok = sign(msg32, sec32, host_data32, table)
    return sig64, ok


def anti_exfil_host_verify(sig64, msg32, pub: G.GE, host_data32,
                           opening: G.GE, table=None):
    """Commitment check + plain ECDSA verify (main_impl.h:185)."""
    from . import ecdsa as ecdsa_mod
    return verify_commit(sig64, host_data32, opening, table) & \
        ecdsa_mod.verify(msg32, sig64, pub, table)
