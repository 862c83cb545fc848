"""NUMS generators (Shallue–van de Woestijne hash-to-curve) and Pedersen
commitments, batched for TPU.

Counterpart of the reference generator/pedersen module
(src/modules/generator/main_impl.h, pedersen_impl.h;
include/secp256k1_generator.h):

* :func:`svdw` — the Fouque–Tibouchi/SvdW map (main_impl.h:94-202),
  re-derived as a mask/select dataflow (the reference's cmov chain maps
  1:1 onto lane selects).
* :func:`generator_generate` / ``_blinded`` — H = svdw(SHA256("1st
  generation: "||key)) + svdw(SHA256("2nd generation: "||key)) [+ b*G]
  (main_impl.h:204-264).
* :func:`pedersen_commit` — commit = blind*G + value*H
  (pedersen_impl.h:41-49) through ecmult_gen + ecmult_const.
* blind-sum / tally-verify over batches (main_impl.h:330-420).

Serialization: 33 bytes, prefix 10|11 for generators and 8|9 for
commitments, where bit0 = !is_square(y) and y is recovered as the
quadratic-residue root (ge_set_xquad semantics).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import ecmult
from ..ops import field as F
from ..ops import group as G
from ..ops import msm
from ..ops import scalar as S
from ..ops import sha256 as H
from ..ops.limb import LB, MASK16

# SvdW constants: c = sqrt(-3) (principal root), d = (c-1)/2 — computed,
# matching the hardcoded negc/d of main_impl.h:131-132.
_C = pow(F.P - 3, (F.P + 1) // 4, F.P)
_NEGC = F.P - _C
_D = (_C - 1) * pow(2, -1, F.P) % F.P


def svdw(t: LB) -> G.GE:
    """Map a field element to a curve point (never infinity)."""
    t2 = F.sqr(t)
    wd = F.norm_weak(F.add(t2, F.fe(F.B_COEFF + 1)))      # 1 + b + t^2
    x3d = F.norm_weak(F.neg(F.FP.norm_if_needed(F.mul_int(t2, 3))))
    jinv = F.inv(F.mul(wd, x3d))                           # inv(0) = 0
    x1 = F.norm_weak(F.add(F.mul(F.mul(F.mul(F.fe(_NEGC), t2), x3d), jinv),
                           F.fe(_D)))
    x2 = F.norm_weak(F.neg(F.norm_weak(F.add(x1, F.fe(1)))))
    wd3 = F.mul(F.sqr(wd), wd)
    x3 = F.norm_weak(F.add(F.mul(wd3, jinv), F.fe(1)))

    # One batched rhs+sqrt over the three candidates (stacked on a new
    # leading axis): 3x fewer traced ops than three separate sqrt chains.
    xs = LB(jnp.stack([x1.v, x2.v, x3.v], axis=0), MASK16)
    rhs = F.norm_weak(F.add(F.mul(F.sqr(xs), xs), F.fe(F.B_COEFF)))
    ys, qs = F.sqrt(rhs)
    aq, bq = qs[0], qs[1]
    y1 = LB(ys.v[0], ys.bound)
    y2 = LB(ys.v[1], ys.bound)
    y3 = LB(ys.v[2], ys.bound)

    x = F.select(aq, x1, F.select(bq, x2, x3))
    y = F.select(aq, y1, F.select(bq, y2, y3))
    y = F.normalize(y)
    # negation criterion: t odd => negate y (main_impl.h:196-202)
    y = F.normalize(F.select(F.is_odd(F.normalize(t)), F.neg(y), y))
    return G.GE(F.normalize(x), y, jnp.zeros(y.batch_shape, bool))


_PREFIX1 = np.frombuffer(b"1st generation: ", dtype=np.uint8)
_PREFIX2 = np.frombuffer(b"2nd generation: ", dtype=np.uint8)


def generator_generate(key32, blind32=None, table=None):
    """key32 [..., 32] -> (H GE, ok).  With blind32, adds blind*G
    (generator_generate_blinded, main_impl.h:257)."""
    batch = key32.shape[:-1]

    def map_one(prefix):
        pre = jnp.broadcast_to(jnp.asarray(prefix), (*batch, 16))
        msg = jnp.concatenate([pre, key32], axis=-1)
        b32 = H.words_to_bytes32(H.sha256_bytes(msg))
        t, ovf = F.from_bytes_be(b32)
        # fe_set_b32_limit semantics: reject >= p (main_impl.h:228)
        return svdw(t), ~ovf

    p1, ok1 = map_one(_PREFIX1)
    p2, ok2 = map_one(_PREFIX2)
    acc = G.gej_add_ge(G.gej_from_ge(p1), p2)
    ok = ok1 & ok2
    if blind32 is not None:
        b, b_ovf = S.from_bytes_be(blind32)
        bj = ecmult.ecmult_gen(b, table)
        acc = G.gej_add(bj, acc)
        ok = ok & ~b_ovf
    return G.ge_from_gej(acc), ok


def generator_serialize(gen: G.GE):
    """33 bytes: [10 | !is_square(y)] || x  (generator_save)."""
    sq = F.is_square(gen.y)
    pre = jnp.where(sq, 10, 11).astype(jnp.uint8)[..., None]
    return jnp.concatenate([pre, F.to_bytes_be(gen.x)], axis=-1)


def _parse_xquad(b33, lo_prefix):
    prefix = jnp.asarray(b33[..., 0], jnp.uint32)
    x, xovf = F.from_bytes_be(b33[..., 1:])
    y, y_ok = F.sqrt(F.add(F.mul(F.sqr(x), x), F.fe(F.B_COEFF)))
    y = F.normalize(y)
    # principal sqrt is always a QR (p = 7 mod 8); negate if prefix bit0
    odd_bit = (prefix & 1) == 1
    y = F.normalize(F.select(odd_bit, F.neg(y), y))
    ok = ((prefix & 0xFE) == lo_prefix) & ~xovf & y_ok
    return G.GE(x, y, ~ok), ok


def generator_parse(b33):
    return _parse_xquad(b33, 10)


def pedersen_scalar_from_u32_pair(hi, lo):
    """(hi, lo) uint32 [...] -> scalar limbs [..., 16]."""
    hi = jnp.asarray(hi, jnp.uint32)
    lo = jnp.asarray(lo, jnp.uint32)
    z = jnp.zeros((*hi.shape, 16), jnp.uint32)
    z = z.at[..., 0].set(lo & MASK16)
    z = z.at[..., 1].set(lo >> 16)
    z = z.at[..., 2].set(hi & MASK16)
    z = z.at[..., 3].set(hi >> 16)
    return LB(z, MASK16)


def pedersen_commit(blind32, value_hi, value_lo, gen: G.GE, table=None):
    """commit = blind*G + value*H -> (GEJ, ok)
    (pedersen_commit, main_impl.h:309; kernel pedersen_impl.h:41)."""
    b, b_ovf = S.from_bytes_be(blind32)
    v = pedersen_scalar_from_u32_pair(value_hi, value_lo)
    rj = ecmult.ecmult_gen(b, table)
    vj = ecmult.ecmult_const(v, gen)
    cj = G.gej_add(rj, vj)
    ok = ~b_ovf & ~cj.inf
    return cj, ok


def pedersen_commitment_serialize(c: G.GE):
    """33 bytes: [8 | !is_square(y)] || x  (pedersen_commitment_save)."""
    sq = F.is_square(c.y)
    pre = jnp.where(sq, 8, 9).astype(jnp.uint8)[..., None]
    return jnp.concatenate([pre, F.to_bytes_be(c.x)], axis=-1)


def pedersen_commit_tpu(blind32, value_hi, value_lo, gen: G.GE,
                        tb: int | None = None):
    """Batched commit = blind*G + value*H through the fused Pallas GLV
    ecmult + affine/quad-character kernels; returns (commit33, ok).

    Same semantics as pedersen_commit + pedersen_commitment_serialize
    (modules/generator/main_impl.h:309, pedersen_impl.h:41-49); the
    64-bit value needs no lambda split (v < 2^128 is its own magnitude)
    so the digit streams are pure bit-slicing."""
    from ..ops import pallas_field as PF
    from ..ops import pallas_gen as PGEN
    from ..ops import pallas_group as PG
    from ..modules.schnorrsig import _digits_rows_w5, _pad_to

    B = blind32.shape[0]
    if tb is None:
        tb = PF.auto_tb(B)
    b, b_ovf = S.from_bytes_be(blind32)
    v = pedersen_scalar_from_u32_pair(value_hi, value_lo)

    b_t = _pad_to(jnp.transpose(b.v), tb)
    v_t = _pad_to(jnp.transpose(v.v), tb)
    Bp = b_t.shape[-1]
    # u2 = v rides the a1 stream (v < 2^128 needs no lambda split); the
    # blind b*G goes through the fixed-base comb kernel.
    digs = jnp.concatenate(
        [_digits_rows_w5(v_t, 0, 8), jnp.zeros((26, Bp), jnp.uint32)],
        axis=0)
    flags = jnp.zeros((2, Bp), jnp.uint32)
    gjac = PGEN.fixedbase_digits_tpu(PGEN.gen_digits(b_t), tb=tb)
    gx = _pad_to(jnp.transpose(F.normalize(gen.x).v), tb)
    gy = _pad_to(jnp.transpose(F.normalize(gen.y).v), tb)
    pinf = _pad_to(gen.inf, tb, axis=0)
    x, y, z, inf, _ = PG.ecmult_glv_tpu(digs, flags, gx, gy, pinf,
                                        gjac, rx=None, tb=tb)
    xa, ya, sq = PF.affine_meta_tpu(x, y, z, tb=tb)
    xa_b = LB(jnp.transpose(xa)[:B], MASK16)
    pre = jnp.where(sq[:B], 8, 9).astype(jnp.uint8)[..., None]
    commit33 = jnp.concatenate([pre, F.to_bytes_be(xa_b)], axis=-1)
    ok = ~b_ovf & ~inf[:B] & ~gen.inf
    return commit33, ok


def pedersen_commitment_parse(b33):
    return _parse_xquad(b33, 8)


def pedersen_blind_sum(blinds32, npositive: int):
    """sum(first npositive) - sum(rest) over the leading axis
    (pedersen_blind_sum, main_impl.h:330). Returns (blind32, ok)."""
    b, ovf = S.from_bytes_be(blinds32)
    n = blinds32.shape[0]
    acc = S.zero(b.batch_shape[1:])
    for i in range(n):
        x = LB(b.v[i], MASK16)
        if i < npositive:
            acc = S.add(acc, x)
        else:
            acc = S.sub(S.FN.norm_if_needed(acc), x)
        acc = S.FN.norm_weak(acc)
    ok = ~jnp.any(ovf, axis=0)
    return S.to_bytes_be(S.normalize(acc)), ok


def pedersen_blind_generator_blind_sum(values_hi, values_lo,
                                       generator_blinds32, blinding32,
                                       n_inputs: int):
    """Final-factor solve for blinded-generator commitments
    (pedersen_blind_generator_blind_sum, main_impl.h:400-466).

    Inputs along axis 0 (length n_total): 64-bit values as (hi, lo) u32
    pairs, generator blinds r_i, and pedersen blinds r'_i.  Returns
    (new_blinding32 for index n_total-1, ok): the value that makes
    sum_outputs(v_i*r_i + r'_i) - sum_inputs(v_i*r_i + r'_i) = 0.
    """
    r, r_ovf = S.from_bytes_be(generator_blinds32)
    rp, rp_ovf = S.from_bytes_be(blinding32)
    n_total = generator_blinds32.shape[0]
    v = pedersen_scalar_from_u32_pair(values_hi, values_lo)
    addend = S.FN.norm_weak(S.add(S.mul(v, r), rp))   # [n_total, 16]
    sign = jnp.arange(n_total) < n_inputs
    addend = S.select(sign, S.FN.norm_weak(S.neg(addend)), addend)
    total = S.zero(())
    for i in range(n_total):
        total = S.FN.norm_weak(S.add(total, LB(addend.v[i], MASK16)))
    last = LB(rp.v[n_total - 1], MASK16)
    out = S.normalize(S.sub(last, total))
    ok = ~jnp.any(r_ovf) & ~jnp.any(rp_ovf)
    return S.to_bytes_be(out), ok


def pedersen_verify_tally(pos: G.GEJ, neg: G.GEJ):
    """True iff sum(pos lanes) == sum(neg lanes)
    (pedersen_verify_tally, main_impl.h:364)."""
    sp = msm._tree_reduce(pos)
    sn = msm._tree_reduce(neg)
    return G.gej_eq(sp, sn)
