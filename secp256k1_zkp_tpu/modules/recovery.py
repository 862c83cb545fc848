"""Recoverable ECDSA (65-byte signature = r||s||recid), batched for TPU.

Counterpart of the reference recovery module
(include/secp256k1_recovery.h, src/modules/recovery/main_impl.h).
The recovery kernel itself (Q = r^-1*(s*R - m*G)) lives in
``modules/ecdsa.recover`` (main_impl.h:87-121); this module adds the
recoverable-signature representation and API parity:

* :func:`sign_recoverable`      — ecdsa_sign_recoverable (main_impl.h:141)
* :func:`recover`               — ecdsa_recover (main_impl.h:170)
* parse/serialize compact 64+recid (main_impl.h:35-67)
* :func:`to_standard`           — ecdsa_recoverable_signature_convert
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import group as G
from . import ecdsa


def sign_recoverable(msg32, sec32, table=None):
    """Deterministic RFC6979 recoverable sign.

    Returns (sig64 [..., 64] uint8, recid [...] int32, ok [...] bool) —
    the compact form of secp256k1_ecdsa_sign_recoverable
    (modules/recovery/main_impl.h:141)."""
    return ecdsa.sign(msg32, sec32, table=table)


def serialize_compact(sig64, recid):
    """(sig64, recid) -> [..., 65] uint8: r||s||recid
    (recoverable_signature_serialize_compact, main_impl.h:56)."""
    rid = jnp.asarray(recid, jnp.uint8)[..., None]
    return jnp.concatenate([jnp.asarray(sig64, jnp.uint8), rid], axis=-1)


def parse_compact(sig65):
    """[..., 65] -> (sig64, recid, ok).  ok False on r/s overflow or
    recid outside 0..3 (parse_compact, main_impl.h:35)."""
    sig65 = jnp.asarray(sig65, jnp.uint8)
    sig64 = sig65[..., :64]
    recid = sig65[..., 64].astype(jnp.int32)
    _, _, ok = ecdsa.sig_parse_compact(sig64)
    return sig64, recid, ok & (recid >= 0) & (recid <= 3)


def to_standard(sig64, recid):
    """Drop the recovery id (recoverable_signature_convert,
    main_impl.h:69)."""
    del recid
    return sig64


def recover(msg32, sig64, recid, table=None):
    """Recover the signing pubkey -> (GE, ok)
    (secp256k1_ecdsa_recover, main_impl.h:170)."""
    q, ok = ecdsa.recover(msg32, sig64, recid, table=table)
    return q, ok & ~q.inf


def recover_verify_consistency(msg32, sig64, recid, pub: G.GE, table=None):
    """Convenience: recovered key equals the expected pubkey (the
    round-trip property the reference tests assert)."""
    q, ok = recover(msg32, sig64, recid, table=table)
    from ..ops import field as F
    same = F.eq(q.x, pub.x) & F.eq(q.y, pub.y) & (q.inf == pub.inf)
    return ok & same
