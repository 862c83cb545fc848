"""x-only public keys, keypairs and BIP-340 tweaks, batched.

Counterpart of the reference extrakeys module
(include/secp256k1_extrakeys.h:47-240, src/modules/extrakeys/main_impl.h).
Keypairs are (seckey scalar, full pubkey GE) pairs of tensors; the x-only
view discards y and tracks parity, exactly like the reference's
keypair_xonly_pub (main_impl.h:176).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import ecmult
from ..ops import field as F
from ..ops import group as G
from ..ops import scalar as S
from ..ops.limb import LB
from . import schnorrsig


def xonly_pubkey_parse(px32):
    """x-only bytes -> (GE with even y, ok) (cf. xonly_pubkey_parse,
    main_impl.h:23)."""
    return schnorrsig.lift_x(px32)


def xonly_pubkey_serialize(p: G.GE):
    return F.to_bytes_be(p.x)


def xonly_pubkey_from_pubkey(p: G.GE):
    """(xonly GE, parity) — negates y to even (main_impl.h:57)."""
    parity = F.is_odd(p.y)
    y = F.normalize(F.select(parity, F.neg(p.y), F.FP.norm_if_needed(p.y)))
    return G.GE(p.x, y, p.inf), parity


def keypair_create(sec32, table=None):
    """(d scalar, pubkey GE, ok) (cf. keypair_create, main_impl.h:144)."""
    d, d_ovf = S.from_bytes_be(sec32)
    ok = ~d_ovf & ~S.is_zero(d)
    pj = ecmult.ecmult_gen(d, table)
    return d, G.ge_from_gej(pj), ok


def xonly_pubkey_tweak_add(p_even: G.GE, tweak32, table=None):
    """Q = P + t*G on an even-y base (cf. xonly_pubkey_tweak_add,
    main_impl.h:91). Returns (GE, ok)."""
    t, t_ovf = S.from_bytes_be(tweak32)
    tj = ecmult.ecmult_gen(t, table)
    q = G.gej_add_ge(tj, p_even)
    ok = ~t_ovf & ~q.inf & ~p_even.inf
    return G.ge_from_gej(q), ok


def xonly_pubkey_tweak_add_check(out_x32, out_parity, p_even: G.GE,
                                 tweak32, table=None):
    """Check serialized tweaked key matches (main_impl.h:112)."""
    q, ok = xonly_pubkey_tweak_add(p_even, tweak32, table)
    qx = F.to_bytes_be(q.x)
    parity = F.is_odd(q.y)
    match = jnp.all(qx == out_x32, axis=-1) & (parity == (out_parity == 1))
    return ok & match


def keypair_xonly_tweak_add(d: LB, p: G.GE, tweak32, table=None):
    """Tweak a keypair: negate d if pub has odd y, then add t
    (cf. keypair_xonly_tweak_add, main_impl.h:228).
    Returns (d', pub' GE, ok)."""
    parity = F.is_odd(p.y)
    d_even = S.select(parity, S.normalize(S.neg(d)), S.normalize(d))
    p_even, _ = xonly_pubkey_from_pubkey(p)
    t, t_ovf = S.from_bytes_be(tweak32)
    d2 = S.normalize(S.add(d_even, t))
    q, ok = xonly_pubkey_tweak_add(p_even, tweak32, table)
    ok = ok & ~t_ovf & ~S.is_zero(d2)
    return d2, q, ok


def keypair_sec(d: LB):
    """Extract the secret key bytes (secp256k1_keypair_sec,
    main_impl.h:198)."""
    return S.to_bytes_be(S.normalize(S.FN.norm_if_needed(d)))


def keypair_pub(p: G.GE):
    """Extract the full public key (secp256k1_keypair_pub,
    main_impl.h:207)."""
    return p


def keypair_xonly_pub(p: G.GE):
    """(x-only GE, parity) view of a keypair's pubkey
    (secp256k1_keypair_xonly_pub, main_impl.h:216)."""
    return xonly_pubkey_from_pubkey(p)


def xonly_pubkey_cmp(a: G.GE, b: G.GE):
    """Lexicographic compare of the 32-byte x-only serializations ->
    [-1, 0, 1] per lane (secp256k1_xonly_pubkey_cmp, main_impl.h:38)."""
    sa = jnp.asarray(xonly_pubkey_serialize(a), jnp.int32)
    sb = jnp.asarray(xonly_pubkey_serialize(b), jnp.int32)
    diff = sa - sb
    nz = diff != 0
    first = jnp.argmax(nz, axis=-1)
    any_nz = jnp.any(nz, axis=-1)
    d = jnp.take_along_axis(diff, first[..., None], axis=-1)[..., 0]
    return jnp.where(any_nz, jnp.sign(d), 0)
