"""Borromean ring signatures, batched for TPU.

Counterpart of src/modules/rangeproof/borromean_impl.h.  Two TPU-shape
re-designs versus the C loops:

* The reference's sign loops have data-dependent bounds (j = secidx+1..;
  j < secidx) — here every member runs with lane masks selecting whether
  the hash chain advances, so the dataflow is uniform across lanes.
* The (ring, member) double loop is a single ``lax.scan`` over the flat
  member axis with ring boundaries handled by static per-step flags, so
  the compiled program contains ONE double-scalar-mult body instead of
  npub copies (critical on compile-time-bound hosts; npub is up to 128).

Ring layout (nrings, rsizes) is static; secidx is per-lane data.
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


def _ser33_pubkey(p: G.GE):
    """eckey_pubkey_serialize33: 0x02/03 prefix + x."""
    pre = jnp.where(F.is_odd(p.y), 3, 2).astype(jnp.uint8)[..., None]
    return jnp.concatenate([pre, F.to_bytes_be(F.normalize(p.x))], axis=-1)


def _borromean_hash_dyn(m32, e_bytes33, elen_is_32, ridx, eidx):
    """H(e || m || be32(ridx) || be32(eidx)) (borromean_impl.h:23) with
    traced ridx/eidx and a 32- or 33-byte e (static selector)."""
    batch = m32.shape[:-1]
    ridx = jnp.asarray(ridx, jnp.uint32)
    eidx = jnp.asarray(eidx, jnp.uint32)

    def be32(x):
        return jnp.stack(
            [(x >> 24) & 0xFF, (x >> 16) & 0xFF, (x >> 8) & 0xFF,
             x & 0xFF], axis=-1).astype(jnp.uint8)

    tail = jnp.concatenate(
        [jnp.broadcast_to(be32(ridx), (*batch, 4)),
         jnp.broadcast_to(be32(eidx), (*batch, 4))], axis=-1)
    e = e_bytes33[..., :32] if elen_is_32 else e_bytes33
    msg = jnp.concatenate([e, m32, tail], axis=-1)
    return H.words_to_bytes32(H.sha256_bytes(msg))


def _flat_meta(rsizes):
    """Static per-member metadata for the scan."""
    ring_id, eidx, is_last, ring_size = [], [], [], []
    for i, rs in enumerate(rsizes):
        for j in range(rs):
            ring_id.append(i)
            eidx.append(j)
            is_last.append(j == rs - 1)
            ring_size.append(rs)
    return (np.array(ring_id, np.int32), np.array(eidx, np.int32),
            np.array(is_last), np.array(ring_size, np.int32))


def _stack_scalars(xs):
    return jnp.stack([S.FN.norm_if_needed(x).v for x in xs], axis=0)


def _stack_ge(ps):
    return (jnp.stack([F.FP.norm_if_needed(p.x).v for p in ps], 0),
            jnp.stack([F.FP.norm_if_needed(p.y).v for p in ps], 0),
            jnp.stack([p.inf for p in ps], 0))


def verify(e0, s_list, pubs, rsizes, m32, table=None,
           return_evalues=False):
    """Batched borromean verify (borromean_impl.h:53) as one scan.

    Returns ok mask, or (ok, evalues [npub, ...] stacked scalars)."""
    batch = m32.shape[:-1]
    ring_id, eidx, is_last, _ = _flat_meta(rsizes)
    sv = _stack_scalars(s_list)
    px, py, pinf = _stack_ge(pubs)
    npub = len(ring_id)
    nrings = len(rsizes)

    zero33 = jnp.zeros((*batch, 33), jnp.uint8)

    def body(carry, xs):
        ens_v, ok = carry
        s_v, x_v, y_v, inf, rid, eid, last, rid_next = xs
        ens = LB(ens_v, MASK16)
        s_j = LB(s_v, MASK16)
        pub = G.GE(LB(x_v, MASK16), LB(y_v, MASK16), inf)
        ok = ok & ~S.is_zero(s_j) & ~S.is_zero(ens) & ~inf
        rg = ecmult.ecmult(s_j, ens, pub, table)
        ok = ok & ~rg.inf
        ser = _ser33_pubkey(G.ge_from_gej(rg))
        # next ens: within ring -> H(ser(33B), rid, eid+1); at ring end ->
        # H(e0(32B), rid+1, 0) for the next ring.
        h_mid = _borromean_hash_dyn(m32, ser, False, rid, eid + 1)
        h_ring = _borromean_hash_dyn(
            m32, jnp.concatenate([e0, zero33[..., :1]], axis=-1), True,
            rid_next, 0)
        h = jnp.where(last, h_ring, h_mid)
        new_ens, ovf = S.from_bytes_be(h)
        # overflow of a *used* challenge fails (borromean_impl.h:76); the
        # value computed after the final member is never used.
        used = ~(last & (rid_next == nrings))
        ok = ok & (~ovf | ~used)
        return (new_ens.v, ok), (ser, ens_v)

    # initial ens for ring 0
    h0 = _borromean_hash_dyn(m32, jnp.concatenate(
        [e0, zero33[..., :1]], axis=-1), True, 0, 0)
    ens0, ovf0 = S.from_bytes_be(h0)
    ok0 = jnp.ones(batch, bool) & ~ovf0

    rid_next = np.concatenate([ring_id[1:], [nrings]]).astype(np.int32)
    xs = (sv, px, py, pinf,
          jnp.asarray(ring_id), jnp.asarray(eidx), jnp.asarray(is_last),
          jnp.asarray(rid_next))
    (_, ok), (sers, ens_vals) = jax.lax.scan(body, (ens0.v, ok0), xs)

    # e0 check: concat ring-final serializations + m
    last_idx = np.nonzero(is_last)[0]
    parts = [jnp.moveaxis(sers, 0, 0)[i] for i in last_idx] + [m32]
    e0_check = H.words_to_bytes32(H.sha256_bytes(
        jnp.concatenate(parts, axis=-1)))
    ok = ok & jnp.all(e0_check == e0, axis=-1)
    if return_evalues:
        return ok, [LB(ens_vals[i], MASK16) for i in range(npub)]
    return ok


def sign(k, sec, s_list, pubs, rsizes, secidx, m32, table=None):
    """Batched borromean sign (borromean_impl.h:106), scan-structured.

    k/sec: lists[nrings] of scalars; s_list: flat list[npub] of forged
    sigs; pubs: flat list[npub] of GE; secidx: list[nrings] of [...]
    int arrays.  Returns (e0 [...,32] bytes, s_out flat list, ok)."""
    nrings = len(rsizes)
    batch = m32.shape[:-1]
    ring_id, eidx, is_last, _ = _flat_meta(rsizes)
    sv = _stack_scalars(s_list)
    px, py, pinf = _stack_ge(pubs)
    secidx_flat = jnp.stack(
        [jnp.asarray(secidx[i]) for i in range(nrings)], 0)  # [nrings,...]

    # ---- Phase 1: forward chains from R_i = k_i*G (scan over members,
    # skipping j == 0; chain advances where eidx > secidx).
    kj = [ecmult.ecmult_gen(k[i], table) for i in range(nrings)]
    ok = jnp.ones(batch, bool)
    for K in kj:
        ok = ok & ~K.inf
    k_sers = jnp.stack([_ser33_pubkey(G.ge_from_gej(K)) for K in kj], 0)

    def p1_body(carry, xs):
        tmp, ok = carry
        s_v, x_v, y_v, inf, rid, eid, last, sidx, kser = xs
        # at member 0: reset tmp to ser(k_i * G)
        tmp = jnp.where(eid == 0, kser, tmp)
        e_b = _borromean_hash_dyn(m32, tmp, False, rid, eid)
        e, e_ovf = S.from_bytes_be(e_b)
        pub = G.GE(LB(x_v, MASK16), LB(y_v, MASK16), inf)
        rg = ecmult.ecmult(LB(s_v, MASK16), e, pub, table)
        ser = _ser33_pubkey(G.ge_from_gej(rg))
        adv = eid > sidx
        tmp = jnp.where(adv[..., None], ser, tmp)
        ok = ok & jnp.where(adv, ~S.is_zero(e) & ~e_ovf & ~rg.inf, True)
        return (tmp, ok), tmp

    xs1 = (sv, px, py, pinf, jnp.asarray(ring_id), jnp.asarray(eidx),
           jnp.asarray(is_last),
           secidx_flat[np.array(ring_id)],
           k_sers[np.array(ring_id)])
    tmp0 = jnp.zeros((*batch, 33), jnp.uint8)
    (_, ok), tmps_all = jax.lax.scan(p1_body, (tmp0, ok), xs1)
    last_idx = np.nonzero(is_last)[0]
    parts = [tmps_all[i] for i in last_idx] + [m32]
    e0 = H.words_to_bytes32(H.sha256_bytes(
        jnp.concatenate(parts, axis=-1)))

    # ---- Phase 2: backward fill from e0; chain advances while
    # eidx < secidx; capture e at secidx; close the ring.
    zero33 = jnp.zeros((*batch, 1), jnp.uint8)
    e0_33 = jnp.concatenate([e0, zero33], axis=-1)

    def p2_body(carry, xs):
        ens_v, e_at_sec_v, ok = carry
        s_v, x_v, y_v, inf, rid, eid, last, sidx = xs
        # ring start: ens = H(e0, rid, 0)
        h_start = _borromean_hash_dyn(m32, e0_33, True, rid, 0)
        ens_start, st_ovf = S.from_bytes_be(h_start)
        start = eid == 0
        ens = S.select(start, ens_start, LB(ens_v, MASK16))
        ok = ok & jnp.where(start, ~S.is_zero(ens_start) & ~st_ovf, True)
        e_at_sec = S.select(start & (sidx == 0), ens,
                            LB(e_at_sec_v, MASK16))
        pub = G.GE(LB(x_v, MASK16), LB(y_v, MASK16), inf)
        rg = ecmult.ecmult(LB(s_v, MASK16), ens, pub, table)
        ser = _ser33_pubkey(G.ge_from_gej(rg))
        h = _borromean_hash_dyn(m32, ser, False, rid, eid + 1)
        new_ens, ne_ovf = S.from_bytes_be(h)
        adv = (~last) & (eid < sidx)
        ens2 = S.select(adv, new_ens, ens)
        ok = ok & jnp.where(adv, ~S.is_zero(new_ens) & ~ne_ovf & ~rg.inf,
                            True)
        hit = (eid + 1) == sidx
        e_at_sec = S.select(hit & ~last, ens2, e_at_sec)
        return (ens2.v, e_at_sec.v, ok), e_at_sec.v

    xs2 = (sv, px, py, pinf, jnp.asarray(ring_id), jnp.asarray(eidx),
           jnp.asarray(is_last), secidx_flat[np.array(ring_id)])
    zero_s = S.zero(batch)
    (_, _, ok), e_at_sec_all = jax.lax.scan(
        p2_body, (zero_s.v, zero_s.v, ok), xs2)

    # close each ring: s[secidx] = k_i - e_at_sec * sec_i
    s_out = list(s_list)
    count = 0
    for i in range(nrings):
        e_i = LB(e_at_sec_all[count + rsizes[i] - 1], MASK16)
        s_true = S.normalize(S.add(k[i], S.neg(S.FN.norm_if_needed(
            S.mul(e_i, sec[i])))))
        ok = ok & ~S.is_zero(s_true)
        for j in range(rsizes[i]):
            sel = secidx[i] == j
            s_out[count + j] = S.select(
                sel, s_true, S.FN.norm_if_needed(s_out[count + j]))
        count += rsizes[i]
    return e0, s_out, ok
