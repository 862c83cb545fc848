"""Schnorr half-aggregation, batched for TPU.

Counterpart of the reference schnorrsig_halfagg module
(src/modules/schnorrsig_halfagg/main_impl.h;
include/secp256k1_schnorrsig_halfagg.h): n BIP-340 signatures compress
to 32*(n+1) bytes.  Randomizers z_i are chained tagged hashes
("HalfAgg/randomizer") over the transcript r_0||pk_0||m_0||...; z_0 = 1.

Batched over aggregates; n (signatures per aggregate) is static.
The verifier computes rhs = sum z_i*(R_i + e_i*P_i) — a natural MSM
(SURVEY.md §7.1 step 8 routes this through the sharded MSM engine for
large n; the per-entry form below is used for small n).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import ecmult
from ..ops import field as F
from ..ops import group as G
from ..ops import scalar as S
from ..ops import sha256 as H
from . import schnorrsig


def aggregate(msgs32, pubx32, sigs64, n: int):
    """Aggregate n signatures -> (aggsig [..., 32*(n+1)] uint8, ok).

    msgs32/pubx32: [..., n, 32]; sigs64: [..., n, 64].
    (schnorrsig_aggregate, main_impl.h:104)."""
    batch = msgs32.shape[:-2]
    stream = H.Sha256Stream(batch, tag="HalfAgg/randomizer")
    s_acc = S.zero(batch)
    rs = []
    for i in range(n):
        r_i = sigs64[..., i, :32]
        stream.write(jnp.concatenate(
            [r_i, pubx32[..., i, :], msgs32[..., i, :]], axis=-1))
        s_i, _ = S.from_bytes_be(sigs64[..., i, 32:])
        if i == 0:
            term = s_i
        else:
            z_b = H.words_to_bytes32(stream.finalize_words())
            z_i, _ = S.from_bytes_be(z_b)
            term = S.mul(z_i, s_i)
        s_acc = S.FN.norm_weak(S.add(s_acc, term))
        rs.append(r_i)
    out = jnp.concatenate(rs + [S.to_bytes_be(S.normalize(s_acc))], axis=-1)
    return out, jnp.ones(batch, bool)


def aggverify(msgs32, pubx32, aggsig, n: int, table=None):
    """Verify a half-aggregate (schnorrsig_aggverify, main_impl.h:108).

    Returns a bool lane mask.  The rhs sum_i z_i*R_i + (z_i e_i)*P_i is
    computed as ONE MSM over 2n points (SURVEY.md §7.1 step 8): only
    the chained z transcripts are sequential in i; all 2n scalar
    multiplications run together through ops.msm.ecmult_multi —
    bucketed Pippenger for a single aggregate, the shared-doubling
    windowed engine when aggregates themselves are batched."""
    from ..ops import msm
    from ..ops.limb import LB, MASK16

    batch = msgs32.shape[:-2]
    stream = H.Sha256Stream(batch, tag="HalfAgg/randomizer")
    ok = jnp.ones(batch, bool)
    ks, px, py, pinf = [], [], [], []
    for i in range(n):
        r_i = aggsig[..., 32 * i:32 * (i + 1)]
        pk_i = pubx32[..., i, :]
        m_i = msgs32[..., i, :]
        P_i, p_ok = schnorrsig.lift_x(pk_i)
        stream.write(jnp.concatenate([r_i, pk_i, m_i], axis=-1))
        # R_i = lift_x(r_i) with EVEN y (ge_set_xo_var(..., 0))
        R_i, r_ok = schnorrsig.lift_x(r_i)
        ok = ok & p_ok & r_ok
        e_b = H.words_to_bytes32(H.tagged_hash_bytes(
            "BIP0340/challenge",
            jnp.concatenate([r_i, pk_i, m_i], axis=-1)))
        e_i, _ = S.from_bytes_be(e_b)
        if i == 0:
            z_i = S.one(batch)
        else:
            z_b = H.words_to_bytes32(stream.finalize_words())
            z_i, _ = S.from_bytes_be(z_b)
        ks += [S.normalize(z_i), S.normalize(S.mul(z_i, e_i))]
        px += [R_i.x, P_i.x]
        py += [R_i.y, P_i.y]
        pinf += [R_i.inf, P_i.inf]

    # MSM axis leads; trailing axes are the (optional) aggregate batch —
    # ecmult_multi handles both (shared-doubling windowed engine when a
    # batch axis is present, bucketed Pippenger for single aggregates).
    ks_all = LB(jnp.stack([k.v for k in ks], axis=0), MASK16)
    pts_all = G.GE(LB(jnp.stack([F.normalize(x).v for x in px], axis=0),
                      MASK16),
                   LB(jnp.stack([F.normalize(y).v for y in py], axis=0),
                      MASK16),
                   jnp.stack(pinf, axis=0))
    rhs = msm.ecmult_multi(ks_all, pts_all)
    s, s_ovf = S.from_bytes_be(aggsig[..., 32 * n:32 * (n + 1)])
    ok = ok & ~s_ovf
    lhs = ecmult.ecmult_gen(s, table)
    return ok & G.gej_eq(lhs, rhs)


def inc_aggregate(aggsig_old, msgs32, pubx32, new_sigs64, n_before: int,
                  n_new: int):
    """Incrementally extend a half-aggregate (schnorrsig_inc_aggregate,
    main_impl.h:19): replays the transcript over the n_before old
    entries (r's from aggsig_old), then absorbs n_new raw signatures.

    msgs32/pubx32 cover ALL n_before+n_new entries ([..., n, 32]);
    new_sigs64: [..., n_new, 64].  Returns (aggsig [..., 32*(n+1)], ok).
    """
    n = n_before + n_new
    batch = msgs32.shape[:-2]
    stream = H.Sha256Stream(batch, tag="HalfAgg/randomizer")
    for i in range(n_before):
        stream.write(jnp.concatenate(
            [aggsig_old[..., 32 * i:32 * (i + 1)], pubx32[..., i, :],
             msgs32[..., i, :]], axis=-1))
    if n_before > 0:
        s_acc, _ = S.from_bytes_be(
            aggsig_old[..., 32 * n_before:32 * (n_before + 1)])
    else:
        s_acc = S.zero(batch)
    rs = [aggsig_old[..., 32 * i:32 * (i + 1)] for i in range(n_before)]
    for i in range(n_before, n):
        j = i - n_before
        r_i = new_sigs64[..., j, :32]
        stream.write(jnp.concatenate(
            [r_i, pubx32[..., i, :], msgs32[..., i, :]], axis=-1))
        s_i, _ = S.from_bytes_be(new_sigs64[..., j, 32:])
        if i == 0:
            term = s_i
        else:
            z_b = H.words_to_bytes32(stream.finalize_words())
            z_i, _ = S.from_bytes_be(z_b)
            term = S.mul(z_i, s_i)
        s_acc = S.FN.norm_weak(S.add(s_acc, term))
        rs.append(r_i)
    out = jnp.concatenate(rs + [S.to_bytes_be(S.normalize(s_acc))], axis=-1)
    return out, jnp.ones(batch, bool)
