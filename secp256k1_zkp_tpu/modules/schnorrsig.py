"""BIP-340 Schnorr signatures, batched for TPU.

Counterpart of the reference schnorrsig module
(src/modules/schnorrsig/main_impl.h): the BIP-340 default nonce function
with midstate-precomputed tags (:16-92), challenge computation (:106),
sign (:122) and verify (:215).  Also x-only key utilities used here
(extrakeys parity handling, src/modules/extrakeys/main_impl.h).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import ecmult
from ..ops import field as F
from ..ops import group as G
from ..ops import scalar as S
from ..ops import sha256 as H
from ..ops.limb import LB


def _xor_bytes(a, b):
    return jnp.bitwise_xor(a, b)


def keypair_xonly(sec32, table=None, sc=S):
    """Returns (d_even, xonly_x_bytes, pk GE (even-y), parity, ok):
    the BIP-340 keypair with the secret negated to force even y
    (cf. keypair_create + xonly logic, modules/extrakeys/main_impl.h).
    ``sc`` selects the scalar engine (tiny-order under the exhaustive
    harness, SURVEY.md §4.3)."""
    d, d_ovf = sc.from_bytes_be(sec32)
    ok = ~d_ovf & ~sc.is_zero(d)
    pj = ecmult.ecmult_gen(d, table)
    pk = G.ge_from_gej(pj)
    parity = F.is_odd(pk.y)
    d_even = sc.select(parity, sc.normalize(sc.neg(d)), sc.normalize(d))
    pk_even = G.GE(F.normalize(pk.x),
                   F.normalize(F.select(parity, F.neg(pk.y), pk.y)),
                   pk.inf)
    px32 = F.to_bytes_be(pk.x)
    return d_even, px32, pk_even, parity, ok


def sign(msg32, sec32, aux32=None, table=None, sc=S, nonce32=None):
    """BIP-340 sign with the default nonce function
    (modules/schnorrsig/main_impl.h:16-92,122-213).
    Returns (sig64, ok).  ``nonce32`` forces the nonce bytes (the
    analog of a custom noncefp, e.g. the exhaustive harness's
    hardened_nonce_function_smallint); ``sc`` selects the scalar
    engine."""
    batch = msg32.shape[:-1]
    if aux32 is None:
        aux32 = jnp.zeros((*batch, 32), jnp.uint8)
    d, px32, pk, parity, ok = keypair_xonly(sec32, table, sc=sc)

    if nonce32 is None:
        # t = d XOR tagged_hash(BIP0340/aux, aux)
        aux_hash = H.words_to_bytes32(
            H.tagged_hash_bytes("BIP0340/aux", aux32))
        d32 = sc.to_bytes_be(d)
        t = _xor_bytes(d32, aux_hash)

        # rand = tagged_hash(BIP0340/nonce, t || pk_x || msg)
        nonce_msg = jnp.concatenate([t, px32, msg32], axis=-1)
        rand = H.words_to_bytes32(H.tagged_hash_bytes("BIP0340/nonce",
                                                      nonce_msg))
    else:
        rand = nonce32
    k, k_ovf = sc.from_bytes_be(rand)
    k_ok = ~sc.is_zero(k)   # BIP340: k = rand mod n, fail only if 0

    rj = ecmult.ecmult_gen(k, table)
    R = G.ge_from_gej(rj)
    r_parity = F.is_odd(R.y)
    k = sc.select(r_parity, sc.normalize(sc.neg(k)), k)
    rx32 = F.to_bytes_be(R.x)

    # e = tagged_hash(BIP0340/challenge, R.x || pk_x || msg) mod n
    ch_msg = jnp.concatenate([rx32, px32, msg32], axis=-1)
    e_b = H.words_to_bytes32(H.tagged_hash_bytes("BIP0340/challenge",
                                                 ch_msg))
    e, _ = sc.from_bytes_be(e_b)

    s = sc.normalize(sc.add(k, sc.mul(e, d)))
    sig64 = jnp.concatenate([rx32, sc.to_bytes_be(s)], axis=-1)
    ok = ok & k_ok
    sig64 = jnp.where(ok[..., None], sig64, jnp.zeros_like(sig64))
    return sig64, ok


def lift_x(px32, b_coeff: int = F.B_COEFF):
    """BIP-340 lift_x: x bytes -> (GE with even y, ok)."""
    x, xovf = F.from_bytes_be(px32)
    y2 = F.add(F.mul(F.sqr(x), x), F.fe(b_coeff))
    y, y_ok = F.sqrt(y2)
    y = F.normalize(y)
    y = F.normalize(F.select(F.is_odd(y), F.neg(y), y))
    ok = y_ok & ~xovf
    return G.GE(x, y, ~ok), ok


def verify(msg32, sig64, px32, table=None, sc=S,
           b_coeff: int = F.B_COEFF):
    """BIP-340 verify (modules/schnorrsig/main_impl.h:215).
    R = s*G - e*P; accept iff !inf, even y, R.x == r."""
    pk, pk_ok = lift_x(px32, b_coeff)
    rx, rx_ovf = F.from_bytes_be(sig64[..., :32])
    s, s_ovf = sc.from_bytes_be(sig64[..., 32:])

    ch_msg = jnp.concatenate([sig64[..., :32], px32, msg32], axis=-1)
    e_b = H.words_to_bytes32(H.tagged_hash_bytes("BIP0340/challenge",
                                                 ch_msg))
    e, _ = sc.from_bytes_be(e_b)
    neg_e = sc.normalize(sc.neg(e))

    rj = ecmult.ecmult(s, neg_e, pk, table)
    R = G.ge_from_gej(rj)
    ok = (pk_ok & ~rx_ovf & ~s_ovf & ~rj.inf
          & ~F.is_odd(R.y) & F.eq(R.x, rx))
    return ok


def _batch_digest(msgs32, sigs64, pxs32, n):
    """One 32-byte digest binding EVERY batch input — each pk_i, msg_i
    and the full 64-byte sig_i (both r and s halves).

    TPU shape: parallel per-lane leaf hashes + a log2(n) binary tree of
    batched tagged hashes, replacing the reference's serial running
    transcript (halfagg chains every prefix into one hash,
    src/modules/schnorrsig_halfagg/main_impl.h:153-165); both bind the
    whole batch before any randomizer is squeezed out."""
    leaves = H.words_to_bytes32(H.tagged_hash_bytes(
        "BIP0340/batch/leaf",
        jnp.concatenate([pxs32, msgs32, sigs64], axis=-1)))   # [n, 32]
    k = n
    nodes = leaves
    while k > 1:
        if k % 2:
            nodes = jnp.concatenate(
                [nodes, jnp.zeros((1, 32), jnp.uint8)], axis=0)
            k += 1
        pairs = nodes.reshape(k // 2, 64)
        nodes = H.words_to_bytes32(H.tagged_hash_bytes(
            "BIP0340/batch/node", pairs))
        k //= 2
    return nodes[0]                                           # [32]


def _batch_randomizers(msgs32, sigs64, pxs32, seed32, n):
    """128-bit batch randomizers z_i (z_0 = 1):

        z_i = H(tag="BIP0340/batch", seed || root || i) mod 2^128

    where ``root`` is :func:`_batch_digest` over the ENTIRE batch.
    Because root depends on every s_i (and pk_i), no z_i is predictable
    before all signatures are fixed — the unforgeability requirement of
    randomized batch validation (BIP-340; the round-4 per-lane
    derivation z_i = H(seed||m_i||r_i) omitted s and pk and admitted a
    confirmed two-lane cancellation forgery, VERDICT r4).  ``seed32``
    adds caller entropy but is not required for soundness: the
    transcript-derived z is the same discipline as the reference's
    deterministic halfagg randomizers."""
    if seed32 is None:
        seed32 = jnp.zeros((32,), jnp.uint8)
    root = _batch_digest(msgs32, sigs64, pxs32, n)
    idx = jnp.arange(n, dtype=jnp.uint32)
    i_b = jnp.stack([(idx >> 24) & 0xFF, (idx >> 16) & 0xFF,
                     (idx >> 8) & 0xFF, idx & 0xFF],
                    axis=-1).astype(jnp.uint8)
    zmsg = jnp.concatenate(
        [jnp.broadcast_to(seed32, (n, 32)),
         jnp.broadcast_to(root, (n, 32)), i_b], axis=-1)
    digest = H.words_to_bytes32(H.tagged_hash_bytes("BIP0340/batch",
                                                    zmsg))
    z_full, _ = S.from_bytes_be(digest)
    # truncate to 128 bits: zero the high limbs
    zv = z_full.v.at[..., 8:].set(0)
    zv = zv.at[0, :].set(0)
    zv = zv.at[0, 0].set(1)                       # z_0 = 1
    return LB(zv, 0xFFFF)


def batch_verify(msgs32, sigs64, pxs32, seed32=None):
    """All-or-nothing batch verification of n BIP-340 signatures via a
    random linear combination:

        (sum_i z_i s_i) * G  ==  sum_i z_i R_i + sum_i (z_i e_i) P_i

    with independent 128-bit randomizers z_i (z_0 = 1) derived from a
    tagged transcript binding EVERY (pk_i, msg_i, sig_i) — see
    :func:`_batch_randomizers` — the standard Schnorr batch equation
    (upstream's planned batch API; the halfagg verifier,
    modules/schnorrsig_halfagg/main_impl.h:108, is the chained-z
    special case).  Inputs have shape [n, 32]/[n, 64]; returns a scalar
    bool (True iff every signature is valid, except with negligible
    probability).  ~2x faster asymptotically than n independent
    verifies: one n-point MSM of 2n points replaces n double-mults."""
    from ..ops import msm

    n = msgs32.shape[0]
    P, p_ok = lift_x(pxs32)                       # [n]
    rx, rx_ovf = F.from_bytes_be(sigs64[..., :32])
    s, s_ovf = S.from_bytes_be(sigs64[..., 32:])
    R, r_ok = lift_x(sigs64[..., :32])            # even-y lift of r
    ok = jnp.all(p_ok & r_ok & ~rx_ovf & ~s_ovf)

    ch_msg = jnp.concatenate([sigs64[..., :32], pxs32, msgs32], axis=-1)
    e_b = H.words_to_bytes32(H.tagged_hash_bytes("BIP0340/challenge",
                                                 ch_msg))
    e, _ = S.from_bytes_be(e_b)
    z = _batch_randomizers(msgs32, sigs64, pxs32, seed32, n)

    # sum_i z_i s_i mod n: a column-sum of canonical 16-bit limbs stays
    # exact in uint32 for <= 2^15 terms, so sum hierarchically: chunk
    # column-sums, normalize each, then one outer column-sum (removes
    # the round-1 n <= 32768 cap; any n up to 2^30 now works).
    zs = S.normalize(S.mul(z, s))
    CH = 32768
    if n <= CH:
        ssum = S.FN.norm_weak(LB(zs.v.sum(axis=0), n * 0xFFFF))
    else:
        parts = [S.normalize(S.FN.norm_weak(LB(
            zs.v[off:off + CH].sum(axis=0),
            min(CH, n - off) * 0xFFFF))).v
            for off in range(0, n, CH)]
        ssum = S.FN.norm_weak(LB(jnp.stack(parts).sum(axis=0),
                                 len(parts) * 0xFFFF))

    ze = S.normalize(S.mul(z, e))
    pts = G.GE(LB(jnp.concatenate([R.x.v, P.x.v], axis=0), 0xFFFF),
               LB(jnp.concatenate([R.y.v, P.y.v], axis=0), 0xFFFF),
               jnp.concatenate([R.inf, P.inf], axis=0))
    ks = LB(jnp.concatenate([S.normalize(z).v, ze.v], axis=0), 0xFFFF)
    rhs = msm.ecmult_multi(ks, pts)
    lhs = ecmult.ecmult_gen(ssum)
    return ok & G.gej_eq(lhs, rhs)


def _pad_to(v, mult, axis=-1):
    b = v.shape[axis]
    pad = (-b) % mult
    if pad == 0:
        return v
    widths = [(0, 0)] * v.ndim
    widths[axis] = (0, pad)
    return jnp.pad(v, widths)


def _digits_rows_w5(t, lo, hi):
    """[16, B] limb-major -> [26, B] MSB-first signed-w5 digits of limbs
    [lo, hi) (one 128-bit half); same encoding as the kernels
    (pallas_scalar.recode_w5: mag | sign<<8)."""
    from ..ops.pallas_scalar import recode_w5
    return jnp.stack(recode_w5([t[i] for i in range(lo, hi)]), axis=0)




def keypair_xonly_tpu(sec32, tb: int | None = None, blind=None):
    """TPU keypair: d*G via the fixed-base kernel + one affine kernel.
    Returns (d_even LB, px32, parity, ok) — the kernel-path subset of
    :func:`keypair_xonly` (no full GE; sign only needs x and parity)."""
    from ..ops import pallas_field as PF
    from ..ops import pallas_gen as PGEN

    B = sec32.shape[0]
    if tb is None:
        tb = PF.auto_tb(B)
    d, d_ovf = S.from_bytes_be(sec32)
    ok = ~d_ovf & ~S.is_zero(d)
    d_t = _pad_to(jnp.transpose(d.v), tb)
    x, y, z = PGEN.ecmult_gen_tpu(d_t, tb=tb, blind=blind)
    xa, ya = PGEN.affine_xy_tpu(x, y, z, tb=tb)
    parity = (ya[0, :B] & 1) == 1
    d_even = S.select(parity, S.normalize(S.neg(d)), S.normalize(d))
    px32 = F.to_bytes_be(LB(jnp.transpose(xa)[:B], 0xFFFF))
    return d_even, px32, parity, ok


def sign_tpu(msg32, sec32, aux32=None, tb: int | None = None,
             blind=None):
    """BIP-340 sign through the Pallas sign pipeline (two fixed-base
    kernels: pubkey + nonce point; tagged hashes stay in XLA; the
    s = k + e*d epilogue is one mod-n muladd kernel).  Semantics match
    :func:`sign`."""
    from ..ops import pallas_field as PF
    from ..ops import pallas_gen as PGEN

    B = msg32.shape[0]
    if tb is None:
        tb = PF.auto_tb(B)
    batch = msg32.shape[:-1]
    if aux32 is None:
        aux32 = jnp.zeros((*batch, 32), jnp.uint8)
    d_even, px32, _, ok = keypair_xonly_tpu(sec32, tb=tb, blind=blind)

    aux_hash = H.words_to_bytes32(H.tagged_hash_bytes("BIP0340/aux", aux32))
    t = _xor_bytes(S.to_bytes_be(d_even), aux_hash)
    nonce_msg = jnp.concatenate([t, px32, msg32], axis=-1)
    rand = H.words_to_bytes32(H.tagged_hash_bytes("BIP0340/nonce",
                                                  nonce_msg))
    k, _ = S.from_bytes_be(rand)
    k_ok = ~S.is_zero(k)

    k_t = _pad_to(jnp.transpose(k.v), tb)
    x, y, z = PGEN.ecmult_gen_tpu(k_t, tb=tb, blind=blind)
    xa, ya = PGEN.affine_xy_tpu(x, y, z, tb=tb)
    r_parity = (ya[0] & 1) == 1          # [Bp] (padded)
    rx32 = F.to_bytes_be(LB(jnp.transpose(xa)[:B], 0xFFFF))

    ch_msg = jnp.concatenate([rx32, px32, msg32], axis=-1)
    e_b = H.words_to_bytes32(H.tagged_hash_bytes("BIP0340/challenge",
                                                 ch_msg))
    e, _ = S.from_bytes_be(e_b)
    e_t = _pad_to(jnp.transpose(e.v), tb)
    d_t = _pad_to(jnp.transpose(d_even.v), tb)
    s_t = PGEN.muladd_n_tpu(k_t, e_t, d_t, r_parity, tb=tb)

    s32 = S.to_bytes_be(LB(jnp.transpose(s_t)[:B], 0xFFFF))
    sig64 = jnp.concatenate([rx32, s32], axis=-1)
    ok = ok & k_ok
    sig64 = jnp.where(ok[..., None], sig64, jnp.zeros_like(sig64))
    return sig64, ok


def verify_tpu(msg32, sig64, px32, tb: int | None = None):
    """BIP-340 verify through the fused Pallas pipeline: lift_x kernel,
    GLV-split kernel on the challenge (signs flipped for -e), the GLV
    Strauss ecmult kernel, and the R-acceptance kernel (x(R)==r, even
    y via one in-kernel z inverse).  Semantics match :func:`verify`."""
    from ..ops import pallas_field as PF
    from ..ops import pallas_gen as PGEN
    from ..ops import pallas_group as PG
    from ..ops import pallas_scalar as PS

    B = msg32.shape[0]
    if tb is None:
        tb = PF.auto_tb(B)
    rx, rx_ovf = F.from_bytes_be(sig64[..., :32])
    s, s_ovf = S.from_bytes_be(sig64[..., 32:])
    pkx, pkx_ovf = F.from_bytes_be(px32)

    ch_msg = jnp.concatenate([sig64[..., :32], px32, msg32], axis=-1)
    e_b = H.words_to_bytes32(H.tagged_hash_bytes("BIP0340/challenge",
                                                 ch_msg))
    e, _ = S.from_bytes_be(e_b)

    pkx_t = _pad_to(jnp.transpose(pkx.v), tb)
    py_t, on_curve = PF.lift_x_tpu(pkx_t, tb=tb)

    e_t = _pad_to(jnp.transpose(S.normalize(e).v), tb)
    edigs, eflags = PS.glv_split_tpu(e_t, tb=tb)
    eflags = eflags ^ jnp.uint32(1)          # R = s*G + (-e)*P

    s_t = _pad_to(jnp.transpose(s.v), tb)
    gjac = PGEN.fixedbase_digits_tpu(PGEN.gen_digits(s_t), tb=tb)

    Bp = pkx_t.shape[-1]
    pinf = jnp.zeros((Bp,), bool)
    x, y, z, inf, _ = PG.ecmult_glv_tpu(edigs, eflags, pkx_t, py_t,
                                        pinf, gjac, rx=None, tb=tb)
    rx_t = _pad_to(jnp.transpose(F.normalize(rx).v), tb)
    okk = PF.schnorr_check_tpu(x, y, z, inf, rx_t, tb=tb)
    return (okk[:B] & on_curve[:B] & ~pkx_ovf & ~rx_ovf & ~s_ovf)


def batch_verify_tpu(msgs32, sigs64, pxs32, seed32=None,
                     tb: int | None = None):
    """All-or-nothing batch verification through the TPU kernels —
    the flagship throughput path.  Same randomized equation as
    :func:`batch_verify`:

        (sum_i z_i s_i) * G  ==  sum_i z_i R_i + sum_i (z_i e_i) P_i

    Heavy legs in Mosaic kernels: lift_x kernel for R_i and P_i, the
    mod-n muladd kernel for z_i*e_i and z_i*s_i, the bucketed
    Pippenger MSM (sort + segmented EC scan) for the 2n-point sum, and
    the w7 comb kernel for the single G multiple.  Amortized cost per
    signature is ~2 complete adds + 2 mod-n muls — versus ~130
    mul-equivalents for 1-by-1 :func:`verify_tpu`.  The reference's
    analog of this shape is halfagg aggverify routed through
    ecmult_multi (modules/schnorrsig_halfagg/main_impl.h:108-200,
    src/ecmult_impl.h:516-621)."""
    from ..ops import pallas_field as PF
    from ..ops import pallas_gen as PGEN

    n = msgs32.shape[0]
    if tb is None:
        tb = PF.auto_tb(n)
    rx, rx_ovf = F.from_bytes_be(sigs64[..., :32])
    s, s_ovf = S.from_bytes_be(sigs64[..., 32:])
    pkx, pkx_ovf = F.from_bytes_be(pxs32)

    pkx_t = _pad_to(jnp.transpose(pkx.v), tb)
    py_t, p_ok = PF.lift_x_tpu(pkx_t, tb=tb)
    rx_t = _pad_to(jnp.transpose(rx.v), tb)
    ry_t, r_ok = PF.lift_x_tpu(rx_t, tb=tb)
    ok = (jnp.all(p_ok[:n]) & jnp.all(r_ok[:n])
          & ~jnp.any(rx_ovf) & ~jnp.any(s_ovf) & ~jnp.any(pkx_ovf))

    ch_msg = jnp.concatenate([sigs64[..., :32], pxs32, msgs32], axis=-1)
    e_b = H.words_to_bytes32(H.tagged_hash_bytes("BIP0340/challenge",
                                                 ch_msg))
    e, _ = S.from_bytes_be(e_b)
    z = _batch_randomizers(msgs32, sigs64, pxs32, seed32, n)

    z_t = _pad_to(jnp.transpose(z.v), tb)
    zeros_t = jnp.zeros_like(z_t)
    no_neg = jnp.zeros(z_t.shape[-1], bool)
    ze_t = PGEN.muladd_n_tpu(zeros_t, z_t,
                             _pad_to(jnp.transpose(S.normalize(e).v), tb),
                             no_neg, tb=tb)
    zs_t = PGEN.muladd_n_tpu(zeros_t, z_t,
                             _pad_to(jnp.transpose(S.normalize(s).v), tb),
                             no_neg, tb=tb)

    # sum_i z_i s_i mod n: canonical 16-bit limbs column-sum exactly in
    # uint32 for <= 2^15 terms; hierarchical beyond (cf. batch_verify).
    zs = LB(jnp.transpose(zs_t)[:n], 0xFFFF)
    CH = 32768
    if n <= CH:
        ssum = S.normalize(S.FN.norm_weak(LB(zs.v.sum(axis=0),
                                             min(n, CH) * 0xFFFF)))
    else:
        parts = [S.normalize(S.FN.norm_weak(LB(
            zs.v[off:off + CH].sum(axis=0),
            min(CH, n - off) * 0xFFFF))).v
            for off in range(0, n, CH)]
        ssum = S.normalize(S.FN.norm_weak(LB(
            jnp.stack(parts).sum(axis=0), len(parts) * 0xFFFF)))

    ze = LB(jnp.transpose(ze_t)[:n], 0xFFFF)
    ry = LB(jnp.transpose(ry_t)[:n], 0xFFFF)
    py = LB(jnp.transpose(py_t)[:n], 0xFFFF)
    # failed lifts carry garbage y limbs: mark those lanes infinity so
    # the MSM sees the identity (the final `ok &` gate already rejects
    # the batch, but no caller of rhs should ever read undefined
    # points; same discipline as batch_verify's inf propagation).
    # Two MSMs split by scalar width: the z_i are 128-bit, so the R_i
    # side sweeps half the windows (ops/pallas_msm.py nbits).
    from ..ops import pallas_msm
    rhs_r = pallas_msm.msm_windowed_tpu(
        S.normalize(z), G.GE(rx, ry, ~r_ok[:n]), nbits=128)
    rhs_p = pallas_msm.msm_windowed_tpu(
        S.normalize(ze), G.GE(pkx, py, ~p_ok[:n]), nbits=256)
    rhs = G.gej_add(rhs_r, rhs_p)

    # lhs = ssum*G through the comb kernel (one padded block).
    ssum_t = jnp.zeros((16, 256), jnp.uint32).at[:, 0].set(ssum.v)
    lx, ly, lz = PGEN.ecmult_gen_tpu(ssum_t, tb=256)
    lhs = G.GEJ(LB(lx[:, 0], 0xFFFF), LB(ly[:, 0], 0xFFFF),
                LB(lz[:, 0], 0xFFFF),
                jnp.all(lz[:, 0] == 0))
    return ok & G.gej_eq(lhs, rhs)


# API parity: the reference distinguishes sign32 (32-byte message) from
# sign_custom (any length + extraparams); here both route through the
# same static-shape kernel — msg length is a trace-time constant.
sign32 = sign


def sign_custom(msg, sec32, aux32=None, table=None):
    """BIP-340 sign over an arbitrary (static) length message
    (secp256k1_schnorrsig_sign_custom, main_impl.h:199).  The default
    nonce function hashes the message with its natural length, so this
    is the same dataflow as :func:`sign` at a different static shape."""
    return sign(msg, sec32, aux32=aux32, table=table)
