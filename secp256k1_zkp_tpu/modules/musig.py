"""MuSig2 (BIP-327) multi-signatures, batched for TPU.

Counterpart of the reference musig module (src/modules/musig/
keyagg_impl.h, session_impl.h; include/secp256k1_musig.h):

* key aggregation with coefficients (keyagg_impl.h:102-215), second-key
  rule, EC/x-only tweaking of the keyagg cache (:230-275)
* nonce generation (MuSig/aux + MuSig/nonce tagged hashes with the BIP's
  length-prefixed writes, session_impl.h:292-420), nonce aggregation,
  nonce processing (MuSig/noncecoef, :537-640)
* partial signing / verification / aggregation (:642-807), including
  adaptor-point support in nonce_process.

Differences from the C API shape: everything is batched over a leading
session axis; the signer count per call is static; caches and sessions
are pytrees of tensors rather than opaque byte blobs; failures are `ok`
lane masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ecmult
from ..ops import field as F
from ..ops import group as G
from ..ops import scalar as S
from ..ops import sha256 as H
from ..ops.limb import LB, MASK16


@jax.tree_util.register_pytree_node_class
class KeyaggCache:
    """pk: aggregate point (pre-tweak-parity), second_pk (inf if none),
    pks_hash [...,32] u8, parity_acc bool, tweak scalar.
    Mirrors keyagg_cache_internal (keyagg_impl.h:20-29)."""

    __slots__ = ("pk", "second_pk", "pks_hash", "parity_acc", "tweak")

    def __init__(self, pk, second_pk, pks_hash, parity_acc, tweak):
        self.pk, self.second_pk = pk, second_pk
        self.pks_hash, self.parity_acc, self.tweak = \
            pks_hash, parity_acc, tweak

    def tree_flatten(self):
        return (self.pk, self.second_pk, self.pks_hash, self.parity_acc,
                self.tweak), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


@jax.tree_util.register_pytree_node_class
class Session:
    """fin_nonce_parity bool, fin_nonce [...,32] u8, noncecoef scalar,
    challenge scalar, s_part scalar (musig_session_internal)."""

    __slots__ = ("fin_nonce_parity", "fin_nonce", "noncecoef", "challenge",
                 "s_part")

    def __init__(self, fin_nonce_parity, fin_nonce, noncecoef, challenge,
                 s_part):
        self.fin_nonce_parity = fin_nonce_parity
        self.fin_nonce = fin_nonce
        self.noncecoef = noncecoef
        self.challenge = challenge
        self.s_part = s_part

    def tree_flatten(self):
        return (self.fin_nonce_parity, self.fin_nonce, self.noncecoef,
                self.challenge, self.s_part), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


def _ser33(p: G.GE):
    """Compressed serialization; infinity lanes -> 33 zero bytes
    (musig_ge_serialize_ext, session_impl.h:24)."""
    pre = jnp.where(F.is_odd(p.y), 3, 2).astype(jnp.uint8)[..., None]
    out = jnp.concatenate([pre, F.to_bytes_be(p.x)], axis=-1)
    return jnp.where(p.inf[..., None], jnp.zeros_like(out), out)


def _ge_eq(a: G.GE, b: G.GE):
    both_inf = a.inf & b.inf
    eq = F.eq(a.x, b.x) & F.eq(a.y, b.y) & ~a.inf & ~b.inf
    return both_inf | eq


# ---------------------------------------------------------------------------
# Key aggregation
# ---------------------------------------------------------------------------


def keyagg_coef(cache: KeyaggCache, pk: G.GE) -> LB:
    """Coefficient: 1 if pk == second_pk else
    H_tag(KeyAgg coefficient, pks_hash || ser33(pk))
    (keyagg_impl.h:102-131)."""
    msg = jnp.concatenate([cache.pks_hash, _ser33(pk)], axis=-1)
    hb = H.words_to_bytes32(H.tagged_hash_bytes("KeyAgg coefficient", msg))
    coef, _ = S.from_bytes_be(hb)
    is_second = _ge_eq(pk, cache.second_pk) & ~cache.second_pk.inf
    return S.select(is_second, S.one(coef.batch_shape), coef)


def pubkey_agg(pubkeys: list[G.GE]):
    """Aggregate n pubkeys -> (agg_pk_x32, KeyaggCache, ok)
    (musig_pubkey_agg, keyagg_impl.h:157-215)."""
    n = len(pubkeys)
    assert n > 0
    batch = pubkeys[0].batch_shape
    ok = jnp.ones(batch, bool)
    for p in pubkeys:
        ok = ok & ~p.inf

    # second_pk: first key (i>=1) different from pubkeys[0]
    second = G.ge_infinity(batch)
    found = jnp.zeros(batch, bool)
    for i in range(1, n):
        diff = ~_ge_eq(pubkeys[0], pubkeys[i])
        take = diff & ~found
        second = G.ge_select(take, pubkeys[i], second)
        found = found | diff

    # pks_hash = tagged(KeyAgg list, ser33_0 || ... || ser33_{n-1})
    msg = jnp.concatenate([_ser33(p) for p in pubkeys], axis=-1)
    pks_hash = H.words_to_bytes32(H.tagged_hash_bytes("KeyAgg list", msg))

    cache0 = KeyaggCache(G.ge_infinity(batch), second, pks_hash,
                         jnp.zeros(batch, bool), S.zero(batch))
    acc = G.gej_infinity(batch)
    for p in pubkeys:
        coef = keyagg_coef(cache0, p)
        acc = G.gej_add(acc, ecmult.ecmult_const(coef, p))
    aggp = G.ge_from_gej(acc)
    aggp = G.GE(F.normalize(aggp.x), F.normalize(aggp.y), aggp.inf)
    ok = ok & ~acc.inf
    cache = KeyaggCache(aggp, second, pks_hash, jnp.zeros(batch, bool),
                        S.zero(batch))
    return F.to_bytes_be(aggp.x), cache, ok


def pubkey_get(cache: KeyaggCache) -> G.GE:
    return cache.pk


def pubkey_tweak_add(cache: KeyaggCache, tweak32, xonly: bool,
                     table=None):
    """EC or x-only tweak of the keyagg cache (keyagg_impl.h:230-268).
    Returns (output_pubkey GE, new cache, ok)."""
    t, t_ovf = S.from_bytes_be(tweak32)
    pk = cache.pk
    parity_acc = cache.parity_acc
    tweak_acc = cache.tweak
    if xonly:
        flip = F.is_odd(pk.y)
        pk = G.ge_select(flip, G.ge_neg(pk), pk)
        parity_acc = parity_acc ^ flip
        tweak_acc = S.select(flip, S.normalize(S.neg(tweak_acc)),
                             S.normalize(tweak_acc))
    tweak_acc = S.normalize(S.add(tweak_acc, t))
    tj = ecmult.ecmult_gen(t, table)
    newpk_j = G.gej_add_ge(tj, pk)
    newpk = G.ge_from_gej(newpk_j)
    newpk = G.GE(F.normalize(newpk.x), F.normalize(newpk.y), newpk.inf)
    ok = ~t_ovf & ~newpk_j.inf
    return newpk, KeyaggCache(newpk, cache.second_pk, cache.pks_hash,
                              parity_acc, tweak_acc), ok


# ---------------------------------------------------------------------------
# Nonces
# ---------------------------------------------------------------------------


def _len_prefixed(parts, prefix_size, data, data_len):
    """The BIP's length-prefixed write (nonce_function_musig_helper):
    (prefix_size-1) zero bytes, 1 length byte, then data (or len 0)."""
    batch = parts[0].shape[:-1]
    if prefix_size > 1:
        parts.append(jnp.zeros((*batch, prefix_size - 1), jnp.uint8))
    if data is None:
        parts.append(jnp.zeros((*batch, 1), jnp.uint8))
    else:
        parts.append(jnp.full((*batch, 1), data_len, jnp.uint8))
        parts.append(data)
    return parts


def nonce_gen(session_secrand32, pk: G.GE, sec32=None, msg32=None,
              agg_pk32=None, extra32=None, table=None,
              allow_zero_secrand: bool = False):
    """MuSig2 nonce generation (musig_nonce_gen, session_impl.h:345-420).

    Returns (secnonce (k1, k2, pk), pubnonce (R1, R2), ok).
    ``allow_zero_secrand`` skips the all-zero defense check (used by the
    counter-mode variant, which feeds a be64 counter)."""
    batch = session_secrand32.shape[:-1]
    if allow_zero_secrand:
        ok = jnp.ones(batch, bool)
    else:
        ok = ~jnp.all(session_secrand32 == 0, axis=-1)

    if sec32 is not None:
        aux = H.words_to_bytes32(
            H.tagged_hash_bytes("MuSig/aux", session_secrand32))
        rand = jnp.bitwise_xor(aux, sec32)
    else:
        rand = session_secrand32

    parts = [rand]
    parts = _len_prefixed(parts, 1, _ser33(pk), 33)
    parts = _len_prefixed(parts, 1, agg_pk32, 32)
    mp = jnp.full((*batch, 1), 1 if msg32 is not None else 0, jnp.uint8)
    parts.append(mp)
    if msg32 is not None:
        parts = _len_prefixed(parts, 8, msg32, 32)
    parts = _len_prefixed(parts, 4, extra32, 32)
    base = jnp.concatenate(parts, axis=-1)

    ks = []
    for i in range(2):
        msg = jnp.concatenate(
            [base, jnp.full((*batch, 1), i, jnp.uint8)], axis=-1)
        kb = H.words_to_bytes32(H.tagged_hash_bytes("MuSig/nonce", msg))
        k, _ = S.from_bytes_be(kb)
        ks.append(k)
        ok = ok & ~S.is_zero(k)

    r1 = G.ge_from_gej(ecmult.ecmult_gen(ks[0], table))
    r2 = G.ge_from_gej(ecmult.ecmult_gen(ks[1], table))
    secnonce = (ks[0], ks[1], pk)
    pubnonce = (G.GE(F.normalize(r1.x), F.normalize(r1.y), r1.inf),
                G.GE(F.normalize(r2.x), F.normalize(r2.y), r2.inf))
    return secnonce, pubnonce, ok


def nonce_agg(pubnonces: list[tuple[G.GE, G.GE]]):
    """Sum the two nonce slots across signers (musig_nonce_agg,
    session_impl.h:270).  Infinity sums are kept as infinity lanes (the
    reference serializes them as zeros)."""
    out = []
    for slot in range(2):
        acc = G.gej_from_ge(pubnonces[0][slot])
        for pn in pubnonces[1:]:
            acc = G.gej_add_ge(acc, pn[slot])
        a = G.ge_from_gej(acc)
        out.append(G.GE(F.normalize(a.x), F.normalize(a.y), a.inf))
    return out[0], out[1]


def pubnonce_serialize(pn):
    return jnp.concatenate([_ser33(pn[0]), _ser33(pn[1])], axis=-1)


def pubnonce_parse(b66):
    """66 bytes -> ((GE, GE), ok). All-zero halves parse as infinity
    (aggnonce only; plain pubnonce_parse rejects them in the reference —
    callers can check the inf masks)."""
    from . import eckey
    out = []
    ok = None
    for slot in range(2):
        b = b66[..., 33 * slot:33 * (slot + 1)]
        is_zero = jnp.all(b == 0, axis=-1)
        p, p_ok = eckey.pubkey_parse(b)
        p = G.GE(p.x, p.y, jnp.where(is_zero, True, p.inf))
        slot_ok = p_ok | is_zero
        out.append(p)
        ok = slot_ok if ok is None else (ok & slot_ok)
    return (out[0], out[1]), ok


def nonce_process(aggnonce, msg32, cache: KeyaggCache, adaptor=None):
    """Compute the session (musig_nonce_process, session_impl.h:588).

    aggnonce: (GE, GE) with inf masks; adaptor: optional GE."""
    agg_pk32 = F.to_bytes_be(cache.pk.x)
    r0, r1 = aggnonce
    if adaptor is not None:
        t = G.gej_add_ge(G.gej_from_ge(r0), adaptor)
        a = G.ge_from_gej(t)
        r0 = G.GE(F.normalize(a.x), F.normalize(a.y), a.inf)

    # noncehash b = tagged(MuSig/noncecoef, ser_ext(r0)||ser_ext(r1)||
    #                      agg_pk32 || msg32)
    msg = jnp.concatenate([_ser33(r0), _ser33(r1), agg_pk32, msg32],
                          axis=-1)
    b_bytes = H.words_to_bytes32(H.tagged_hash_bytes("MuSig/noncecoef",
                                                     msg))
    b, _ = S.from_bytes_be(b_bytes)

    # fin = r0 + b*r1 (G substituted if infinity)
    fin_j = G.gej_add_ge(ecmult.ecmult_const(b, r1), r0)
    fin = G.ge_from_gej(fin_j)
    gpt = G.generator(fin.batch_shape)
    fin = G.ge_select(fin_j.inf, gpt, fin)
    fin_x = F.normalize(fin.x)
    fin_parity = F.is_odd(F.normalize(fin.y))
    fin_nonce = F.to_bytes_be(fin_x)

    # challenge e = BIP340 challenge(fin_nonce, agg_pk32, msg)
    ch_msg = jnp.concatenate([fin_nonce, agg_pk32, msg32], axis=-1)
    e_b = H.words_to_bytes32(H.tagged_hash_bytes("BIP0340/challenge",
                                                 ch_msg))
    e, _ = S.from_bytes_be(e_b)

    # s_part = +- e * tweak
    et = S.normalize(S.mul(e, cache.tweak))
    s_part = S.select(F.is_odd(cache.pk.y), S.normalize(S.neg(et)), et)
    return Session(fin_parity, fin_nonce, b, e, s_part)


# ---------------------------------------------------------------------------
# Partial signatures
# ---------------------------------------------------------------------------


def partial_sign(secnonce, d: LB, pk: G.GE, cache: KeyaggCache,
                 session: Session):
    """(psig scalar, ok) (musig_partial_sign, session_impl.h:647)."""
    k1, k2, nonce_pk = secnonce
    ok = _ge_eq(nonce_pk, pk) & ~S.is_zero(k1) & ~S.is_zero(k2) \
        & ~S.is_zero(d)

    flip_d = F.is_odd(cache.pk.y) ^ cache.parity_acc
    sk = S.select(flip_d, S.normalize(S.neg(d)), S.normalize(d))
    mu = keyagg_coef(cache, pk)
    sk = S.mul(sk, mu)

    k1 = S.select(session.fin_nonce_parity,
                  S.normalize(S.neg(k1)), S.normalize(k1))
    k2 = S.select(session.fin_nonce_parity,
                  S.normalize(S.neg(k2)), S.normalize(k2))

    s = S.mul(session.challenge, sk)
    s = S.add(s, S.add(k1, S.mul(session.noncecoef, k2)))
    return S.normalize(s), ok


def partial_sig_verify(psig: LB, pubnonce, pk: G.GE, cache: KeyaggCache,
                       session: Session):
    """Verify one partial signature (session_impl.h:716)."""
    r0, r1 = pubnonce
    rj = G.gej_add_ge(ecmult.ecmult_const(session.noncecoef, r1), r0)

    mu = keyagg_coef(cache, pk)
    e = S.mul(session.challenge, mu)
    flip = F.is_odd(cache.pk.y) ^ cache.parity_acc
    e = S.select(flip, S.normalize(S.neg(e)), e)

    neg_s = S.normalize(S.neg(S.FN.norm_if_needed(psig)))
    tmp = ecmult.ecmult(neg_s, e, pk)    # -s*G + e*mu*P
    rj = G.gej_select(session.fin_nonce_parity, G.gej_neg(rj), rj)
    total = G.gej_add(tmp, rj)
    return total.inf


def partial_sig_agg(session: Session, psigs: list[LB]):
    """sig64 = fin_nonce || (s_part + sum psigs)
    (musig_partial_sig_agg, session_impl.h:778)."""
    s = session.s_part
    for p in psigs:
        s = S.add(s, p)
    s = S.normalize(s)
    return jnp.concatenate([session.fin_nonce, S.to_bytes_be(s)], axis=-1)


# ---------------------------------------------------------------------------
# Key sorting (host-side; counterpart of secp256k1_ec_pubkey_sort which
# uses the DoS-safe hsort, src/hsort.h — on host a plain sort of the
# 33-byte serializations suffices and matches its ordering)
# ---------------------------------------------------------------------------


def pubkey_sort_host(ser33_list: list[bytes]) -> list[int]:
    """Returns the permutation indices sorting keys lexicographically by
    compressed serialization (BIP-327 KeySort)."""
    return sorted(range(len(ser33_list)), key=lambda i: ser33_list[i])


# ---------------------------------------------------------------------------
# Adaptor support (modules/musig/adaptor_impl.h)
# ---------------------------------------------------------------------------


def nonce_parity(session: Session):
    """The final nonce's Y parity (musig_nonce_parity,
    adaptor_impl.h:18)."""
    return session.fin_nonce_parity


def adapt(pre_sig64, sec_adaptor32, parity):
    """Turn a pre-signature into a valid BIP-340 signature:
    s = pre_s + (-1)^parity * t (musig_adapt, adaptor_impl.h:31).
    Returns (sig64, ok)."""
    s, s_ovf = S.from_bytes_be(pre_sig64[..., 32:])
    t, t_ovf = S.from_bytes_be(sec_adaptor32)
    par = jnp.asarray(parity, bool)
    t = S.select(par, S.normalize(S.neg(t)), t)
    s2 = S.normalize(S.add(s, t))
    sig = jnp.concatenate([pre_sig64[..., :32], S.to_bytes_be(s2)], axis=-1)
    return sig, ~s_ovf & ~t_ovf


def extract_adaptor(sig64, pre_sig64, parity):
    """Recover the secret adaptor t = (-1)^(1-parity) * (pre_s - s)
    (musig_extract_adaptor, adaptor_impl.h:72). Returns (t32, ok)."""
    s, s_ovf = S.from_bytes_be(sig64[..., 32:])
    ps, ps_ovf = S.from_bytes_be(pre_sig64[..., 32:])
    t = S.normalize(S.add(S.normalize(S.neg(s)), ps))
    par = jnp.asarray(parity, bool)
    t = S.select(~par, S.normalize(S.neg(t)), t)
    return S.to_bytes_be(S.normalize(t)), ~s_ovf & ~ps_ovf


# ---------------------------------------------------------------------------
# Codec / convenience parity (include/secp256k1_musig.h)
# ---------------------------------------------------------------------------

aggnonce_serialize = pubnonce_serialize
aggnonce_parse = pubnonce_parse


def partial_sig_serialize(psig: LB):
    """Scalar -> 32 bytes (musig_partial_sig_serialize)."""
    return S.to_bytes_be(S.normalize(S.FN.norm_if_needed(psig)))


def partial_sig_parse(b32):
    """32 bytes -> (scalar, ok); rejects overflow
    (musig_partial_sig_parse, session_impl.h:244)."""
    s, ovf = S.from_bytes_be(b32)
    return s, ~ovf


def nonce_gen_counter(nonrepeating_cnt: int, sec32, pk: G.GE, msg32=None,
                      agg_pk32=None, extra32=None, table=None):
    """Counter-mode nonce generation (musig_nonce_gen_counter,
    session_impl.h:465): session_secrand = be64(cnt) || zeros, keypair
    required (sec+pk)."""
    batch = sec32.shape[:-1]
    buf = np.zeros(32, np.uint8)
    buf[:8] = np.frombuffer(int(nonrepeating_cnt).to_bytes(8, "big"),
                            np.uint8)
    secrand = jnp.broadcast_to(jnp.asarray(buf), (*batch, 32))
    return nonce_gen(secrand, pk, sec32=sec32, msg32=msg32,
                     agg_pk32=agg_pk32, extra32=extra32, table=table,
                     allow_zero_secrand=True)
