"""Address whitelisting ring signatures, batched for TPU.

Counterpart of src/modules/whitelist/{whitelist_impl.h, main_impl.h}
(include/secp256k1_whitelist.h): an Abe–Ohkubo–Suzuki-style one-ring
Borromean signature over combined keys
L_i = online_i + H(kG of (offline_i + sub))*(offline_i + sub).

Signature envelope: 1 byte n_keys + 32*(n_keys+1) (host codec).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import ecmult
from ..ops import field as F
from ..ops import group as G
from ..ops import scalar as S
from ..ops import sha256 as H
from ..ops.limb import LB, MASK16
from . import borromean

MAX_KEYS = 255


def _ser33(p: G.GE):
    pre = jnp.where(F.is_odd(p.y), 3, 2).astype(jnp.uint8)[..., None]
    return jnp.concatenate([pre, F.to_bytes_be(F.normalize(p.x))], axis=-1)


def _hash_pubkey_scalar(p: G.GE):
    """scalar(SHA256(ser33(p))) (whitelist_hash_pubkey).
    Returns (scalar, ok)."""
    h = H.words_to_bytes32(H.sha256_bytes(_ser33(p)))
    t, ovf = S.from_bytes_be(h)
    return t, ~ovf & ~S.is_zero(t) & ~p.inf


def compute_keys_and_message(online: list[G.GE], offline: list[G.GE],
                             sub: G.GE, table=None):
    """(msg32, keys list[GE], ok) (whitelist_compute_keys_and_message)."""
    n = len(online)
    parts = [_ser33(sub)]
    keys = []
    ok = ~sub.inf
    for i in range(n):
        parts.append(_ser33(offline[i]))
        parts.append(_ser33(online[i]))
        tw_j = G.gej_add_ge(G.gej_from_ge(offline[i]), sub)
        tw_aff = G.ge_from_gej(tw_j)
        t, t_ok = _hash_pubkey_scalar(tw_aff)
        ok = ok & t_ok
        tweaked = ecmult.ecmult_const(t, tw_aff)
        kj = G.gej_add_ge(tweaked, online[i])
        a = G.ge_from_gej(kj)
        keys.append(G.GE(F.normalize(a.x), F.normalize(a.y), a.inf))
        ok = ok & ~kj.inf
    msg32 = H.words_to_bytes32(H.sha256_bytes(
        jnp.concatenate(parts, axis=-1)))
    return msg32, keys, ok


def compute_tweaked_privkey(online_sec32, summed_sec32, table=None):
    """skey = online + H((summed)*G)*summed
    (whitelist_compute_tweaked_privkey). Returns (scalar, ok)."""
    sk, sk_ovf = S.from_bytes_be(summed_sec32)
    ok = ~sk_ovf & ~S.is_zero(sk)
    pj = ecmult.ecmult_gen(sk, table)
    t, t_ok = _hash_pubkey_scalar(G.ge_from_gej(pj))
    ok = ok & t_ok
    on, on_ovf = S.from_bytes_be(online_sec32)
    ok = ok & ~on_ovf & ~S.is_zero(on)
    return S.normalize(S.add(S.mul(sk, t), on)), ok


def _nonces(msg32, sec: LB, n: int):
    """Nonce + per-key s values from RFC6979 with the index-XORed message
    (main_impl.h:44-80; single counter round — retries are
    cryptographically unreachable and surfaced via ok)."""
    from .ecdsa import rfc6979_nonce
    sec32 = S.to_bytes_be(S.normalize(sec))
    non_b = H.words_to_bytes32(rfc6979_nonce(msg32, sec32, 1)[0])
    non, ovf = S.from_bytes_be(non_b)
    ok = ~ovf & ~S.is_zero(non)
    s_list = []
    s_bytes = []
    for i in range(n):
        x0 = np.zeros(32, np.uint8)
        x0[0] = (i + 1) & 0xFF
        x0[1] = ((i + 1) >> 8) & 0xFF
        m_i = jnp.bitwise_xor(msg32, jnp.asarray(x0))
        s_b = H.words_to_bytes32(rfc6979_nonce(m_i, sec32, 1)[0])
        s, s_ovf = S.from_bytes_be(s_b)
        ok = ok & ~s_ovf & ~S.is_zero(s)
        s_list.append(s)
        s_bytes.append(s_b)
    return non, s_list, ok


def sign(online: list[G.GE], offline: list[G.GE], sub: G.GE,
         online_sec32, summed_sec32, index, table=None):
    """(e0 [...,32], s_bytes [..., 32n], ok); index: [...] int32
    (whitelist_sign, main_impl.h:15)."""
    n = len(online)
    msg32, keys, ok = compute_keys_and_message(online, offline, sub,
                                               table)
    sec, k_ok = compute_tweaked_privkey(online_sec32, summed_sec32, table)
    ok = ok & k_ok
    non, s_list, n_ok = _nonces(msg32, sec, n)
    ok = ok & n_ok
    e0, s_out, b_ok = borromean.sign([non], [sec], s_list, keys, [n],
                                     [index], msg32, table)
    ok = ok & b_ok
    s_bytes = jnp.concatenate([S.to_bytes_be(S.normalize(s))
                               for s in s_out], axis=-1)
    return e0, s_bytes, ok


def verify(online: list[G.GE], offline: list[G.GE], sub: G.GE,
           e0, s_bytes, table=None):
    """whitelist_verify (main_impl.h:103)."""
    n = len(online)
    msg32, keys, ok = compute_keys_and_message(online, offline, sub,
                                               table)
    s_list = []
    for i in range(n):
        s, ovf = S.from_bytes_be(s_bytes[..., 32 * i:32 * (i + 1)])
        ok = ok & ~ovf & ~S.is_zero(s)
        s_list.append(s)
    return ok & borromean.verify(e0, s_list, keys, [n], msg32, table)


def signature_serialize(n_keys: int, e0: bytes, s: bytes) -> bytes:
    """1-byte n_keys + e0 + s values (whitelist_signature_serialize)."""
    return bytes([n_keys]) + e0 + s


def signature_parse(data: bytes):
    if len(data) < 1:
        return None
    n = data[0]
    if n > MAX_KEYS or len(data) != 1 + 32 * (n + 1):
        return None
    return n, data[1:33], data[33:]
