"""Pallas TPU kernels for the SIGN path: fixed-base k*G + epilogues.

TPU-native counterpart of the reference's constant-time generator
multiplication (signed-digit multi-comb, src/ecmult_gen_impl.h:54-282)
and the scalar epilogues of ECDSA / Schnorr signing
(src/ecdsa_impl.h:274-310, src/modules/schnorrsig/main_impl.h:122).

Design (TPU-first, not a comb translation):

* k is split into four 64-bit quarters; quarter q runs against a
  compile-time-constant table of d * 2^(64q) * G (d = 1..16, signed-w5
  digits).  13 windows x (5 doublings + 4 constant mixed adds) ~= 1030
  mod-p mul-equivalents per lane — about 0.45x the verify kernel.  The
  tables are immediates (select chains of scalar constants), the analog
  of the generated precomputed_ecmult_gen.c, costing zero VMEM.
* Table lookups are full-scan selects — the uniform-dataflow shape that
  replaces the reference's cmov scan (ecmult_gen_impl.h:237-249); there
  is no secret-dependent addressing anywhere.
* The reference's scalar/point blinding (ecmult_gen_impl.h:285-339)
  is applied OUTSIDE the kernel by the context: k' = k + b (mod n) runs
  in the epilogue kernels and gb = -b*G is added via one extra mixed
  add (see context.randomize / modules using it).

Everything downstream of k*G that touches 256-bit math is fused into
one epilogue kernel per protocol so no multiply leaks into the XLA
[B, 16] glue (the round-1 lesson, docs/PERF.md).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_field import (LIMBS, _canon_p, _mul_limbs, _sqr_limbs,
                           P_PRIME, auto_tb)
from .pallas_group import (FE, MASK16, _jp_flat, _jp_unflat,
                           fe_neg, fe_select, fe_weak, fe_zero,
                           jp_add_aff, jp_double, jp_inf)
from .pallas_scalar import (N_ORDER, _c16, _canon_n, _is_gt_const,
                            _mul_limbs_n, _sub_from_const, recode_w5_n)

_RED_N = _c16(2 ** 256 - N_ORDER)
_N_HALF = (N_ORDER - 1) // 2
NQ = 4          # quarters of the scalar
NWQ = 13        # signed-w5 windows per 64-bit quarter


@lru_cache(maxsize=1)
def _gen_tables_int():
    """[q][d] = (x, y) int-limb tuples of (d+1) * 2^(64q) * G."""
    from ..utils import hostcurve
    tabs = []
    for q in range(NQ):
        base = (1 << (64 * q)) % hostcurve.N
        tab = []
        for d in range(1, 17):
            x, y = hostcurve.mul((d * base) % hostcurve.N)
            tab.append((_c16(x), _c16(y)))
        tabs.append(tuple(tab))
    return tuple(tabs)


def _gather_const(tab, d):
    """Select-of-immediates over a 16-entry (x,y) int-limb table;
    d in 1..16 (d == 0 is masked by the caller's inf flag)."""
    x0, y0 = tab[0]
    gx = FE([jnp.zeros_like(d) + int(c) for c in x0], MASK16)
    gy = FE([jnp.zeros_like(d) + int(c) for c in y0], MASK16)
    for e in range(2, 17):
        m = d == e
        ex, ey = tab[e - 1]
        gx = FE([jnp.where(m, jnp.uint32(c), v)
                 for c, v in zip(ex, gx.l)], MASK16)
        gy = FE([jnp.where(m, jnp.uint32(c), v)
                 for c, v in zip(ey, gy.l)], MASK16)
    return gx, gy


def gen_digits(k_t):
    """Canonical scalar [16, B] -> [52, B] signed-w5 digit rows.

    Rows q*13 + w = window w (MSB-first) of 64-bit quarter q.  Cheap
    elementwise [B]-ops, so it stays in XLA glue."""
    rows = []
    for q in range(NQ):
        rows.extend(recode_w5_n([k_t[4 * q + i] for i in range(4)], 64))
    return jnp.stack(rows, axis=0)


def _gen_kernel(*refs, blinded=False):
    """k*G from digit rows; 13 windows x (5 dbl + 4 const adds).

    With ``blinded`` the kernel takes two extra input refs carrying the
    affine blinding point gb = -b*G and ends with one mixed add — the
    point-offset half of the reference's ecmult_gen blinding
    (src/ecmult_gen_impl.h:285-339); the scalar offset k' = k + b mod n
    is applied by the caller before digit recoding."""
    if blinded:
        d_ref, bx_ref, by_ref, ox_ref, oy_ref, oz_ref = refs
    else:
        d_ref, ox_ref, oy_ref, oz_ref = refs
    tabs = _gen_tables_int()
    tb = d_ref[0, :]

    def window(w, carry):
        acc = _jp_unflat(carry)
        for _ in range(5):
            acc = jp_double(acc)
        for q in range(NQ):
            dg = d_ref[q * NWQ + w, :]
            mag = dg & 0xFF
            sgn = dg >> 8
            gx, gy = _gather_const(tabs[q], mag)
            gy = fe_select(sgn != 0, fe_weak(fe_neg(gy)), gy)
            acc = jp_add_aff(acc, gx, gy, (mag == 0).astype(jnp.uint32))
        return _jp_flat(acc)

    out = jax.lax.fori_loop(0, NWQ, window, _jp_flat(jp_inf(tb)))
    acc = _jp_unflat(out)
    if blinded:
        gbx = FE([bx_ref[i, :] for i in range(LIMBS)], MASK16)
        gby = FE([by_ref[i, :] for i in range(LIMBS)], MASK16)
        acc = jp_add_aff(acc, gbx, gby, jnp.zeros_like(tb))
    # k in [1, n-1] means the result is never infinity; z = 0 would only
    # arise from inf lanes, which the caller masks via its own ok flags.
    z = fe_select(acc.inf != 0, fe_zero(tb), fe_weak(acc.z))
    for i in range(LIMBS):
        ox_ref[i, :] = fe_weak(acc.x).l[i]
        oy_ref[i, :] = fe_weak(acc.y).l[i]
        oz_ref[i, :] = z.l[i]


@lru_cache(maxsize=8)
def _gen_call(tb: int, blinded: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(digs, *gb):
        B = digs.shape[-1]
        spec16 = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(_gen_kernel, blinded=blinded),
            out_shape=(
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
            ),
            grid=(B // tb,),
            in_specs=[pl.BlockSpec((NQ * NWQ, tb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)]
            + ([spec16, spec16] if blinded else []),
            out_specs=(spec16, spec16, spec16),
        )(digs, *gb)

    return run


def ecmult_gen_tpu(k_t, tb: int | None = None, blind=None):
    """k*G on a canonical limb-major [16, B] scalar.

    Returns jacobian (x, y, z) [16, B] weak limbs; z == 0 marks the
    (cryptographically unreachable for valid k) infinity lanes.

    ``blind`` is the context's generator-blinding state
    ``(b_limbs, gbx, gby)`` — a scalar offset b (16 int limbs) and the
    affine point gb = -b*G (two [16] uint32 limb arrays).  The kernel
    then computes (k + b)*G + (-b)*G == k*G with no intermediate that
    equals k*G's addition chain — the scalar-offset + point-offset
    blinding of src/ecmult_gen_impl.h:285-339 (the projective-rescale
    third is meaningless here: fixed dataflow, no divisions vary)."""
    if tb is None:
        tb = auto_tb(k_t.shape[-1])
    rows = [k_t[i] for i in range(LIMBS)]
    if blind is None:
        return _gen_call(tb)(gen_digits(rows))
    b_limbs, gbx, gby = blind
    rows = _add_mod_n(rows, [jnp.full_like(rows[0], int(c))
                             for c in b_limbs])
    B = k_t.shape[-1]
    bx = jnp.broadcast_to(
        jnp.asarray(np.asarray(gbx, np.uint32))[:, None], (LIMBS, B))
    by = jnp.broadcast_to(
        jnp.asarray(np.asarray(gby, np.uint32))[:, None], (LIMBS, B))
    return _gen_call(tb, True)(gen_digits(rows), bx, by)


# ---------------------------------------------------------------------------
# mod-n helpers shared by the epilogue kernels
# ---------------------------------------------------------------------------


def _add_mod_n(a, b):
    """canonical a + b mod n (sum < 2n: one conditional subtract)."""
    t = [x + y for x, y in zip(a, b)]
    out, carry = [], None
    for x in t:
        v = x if carry is None else x + carry
        out.append(v & 0xFFFF)
        carry = v >> 16
    # carry in {0,1}: fold 2^256 === red (mod n), short second ripple
    out = [out[i] + carry * _RED_N[i] if i < 9 else out[i]
           for i in range(LIMBS)]
    out2, c = [], None
    for x in out:
        v = x if c is None else x + c
        out2.append(v & 0xFFFF)
        c = v >> 16
    return _canon_n(out2)


def _neg_mod_n(a):
    """n - a for canonical a (a == 0 -> n -> canon 0)."""
    return _canon_n(_sub_from_const(_c16(N_ORDER), a))


def _is_zero16(a):
    acc = None
    for x in a:
        acc = x if acc is None else acc | x
    return acc == 0


# ---------------------------------------------------------------------------
# ECDSA sign epilogue: jacobian R + (k, m, d) -> (r, s, recid, ok)
# ---------------------------------------------------------------------------


def _ecdsa_finish_kernel(x_ref, y_ref, z_ref,
                         k_ref, m_ref, d_ref, r_ref, s_ref, meta_ref):
    """Everything after R = k*G (src/ecdsa_impl.h:282-310): affine x/y
    via one divsteps z-inverse, r = x(R) mod n with the overflow flag,
    s = k^-1 (m + r d), low-S normalization and the recovery id."""
    from .pallas_divsteps import inv_limbs16
    X = [x_ref[i, :] for i in range(LIMBS)]
    Y = [y_ref[i, :] for i in range(LIMBS)]
    Z = [z_ref[i, :] for i in range(LIMBS)]
    k = [k_ref[i, :] for i in range(LIMBS)]
    m = [m_ref[i, :] for i in range(LIMBS)]
    d = [d_ref[i, :] for i in range(LIMBS)]

    zinv = inv_limbs16(_canon_p(Z), P_PRIME)
    zi2 = _sqr_limbs(zinv)
    zi3 = _mul_limbs(zi2, zinv)
    xa = _canon_p(_mul_limbs(X, zi2))
    ya = _canon_p(_mul_limbs(Y, zi3))
    y_odd = ya[0] & 1

    # r = x(R) mod n (x < p < 2n: one conditional subtract); the carry
    # is exactly the reference's overflow flag (ecdsa_impl.h:286).
    t, c = [], None
    for i in range(LIMBS):
        v = xa[i] + _RED_N[i] if i < len(_RED_N) else xa[i]
        v = v if c is None else v + c
        t.append(v & 0xFFFF)
        c = v >> 16
    r_ovf = c > 0
    r = [jnp.where(r_ovf, t[i], xa[i]) for i in range(LIMBS)]

    kinv = inv_limbs16(k, N_ORDER)
    rd = _canon_n(_mul_limbs_n(r, d))
    u = _add_mod_n(m, rd)
    s = _canon_n(_mul_limbs_n(kinv, u))
    high = _is_gt_const(s, _N_HALF)
    s_low = _neg_mod_n(s)
    s = [jnp.where(high, s_low[i], s[i]) for i in range(LIMBS)]

    recid = (jnp.where(r_ovf, jnp.uint32(2), jnp.uint32(0)) | y_odd) \
        ^ high.astype(jnp.uint32)
    ok = (~_is_zero16(r)) & (~_is_zero16(s))
    for i in range(LIMBS):
        r_ref[i, :] = r[i]
        s_ref[i, :] = s[i]
    meta_ref[0, :] = recid
    meta_ref[1, :] = ok.astype(jnp.uint32)


@lru_cache(maxsize=4)
def _ecdsa_finish_call(tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(x, y, z, k, m, d):
        B = x.shape[-1]
        spec = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _ecdsa_finish_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((2, B), jnp.uint32),
            ),
            grid=(B // tb,),
            in_specs=[spec, spec, spec, spec, spec, spec],
            out_specs=(spec, spec,
                       pl.BlockSpec((2, tb), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)),
        )(x, y, z, k, m, d)

    return run


def ecdsa_sign_finish_tpu(x, y, z, k, m, d, tb: int | None = None):
    """[16, B] jacobian R + canonical (k, m, d) ->
    (r [16, B], s [16, B] canonical low-S, recid [B] uint32, ok [B])."""
    if tb is None:
        tb = auto_tb(x.shape[-1])
    r, s, meta = _ecdsa_finish_call(tb)(x, y, z, k, m, d)
    return r, s, meta[0], meta[1] != 0


# ---------------------------------------------------------------------------
# Affine x/y + parity (keypair / schnorr R serialization)
# ---------------------------------------------------------------------------


def _affine_xy_kernel(x_ref, y_ref, z_ref, ax_ref, ay_ref):
    """Jacobian -> canonical affine (x, y); one divsteps z-inverse.
    Lighter sibling of pallas_field._affine_meta_kernel (no quadratic
    character — sign paths only need the parity bit, i.e. ya[0] & 1)."""
    from .pallas_divsteps import inv_limbs16
    X = [x_ref[i, :] for i in range(LIMBS)]
    Y = [y_ref[i, :] for i in range(LIMBS)]
    Z = [z_ref[i, :] for i in range(LIMBS)]
    zinv = inv_limbs16(_canon_p(Z), P_PRIME)
    zi2 = _sqr_limbs(zinv)
    zi3 = _mul_limbs(zi2, zinv)
    xa = _canon_p(_mul_limbs(X, zi2))
    ya = _canon_p(_mul_limbs(Y, zi3))
    for i in range(LIMBS):
        ax_ref[i, :] = xa[i]
        ay_ref[i, :] = ya[i]


@lru_cache(maxsize=4)
def _affine_xy_call(tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(x, y, z):
        B = x.shape[-1]
        spec = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _affine_xy_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
            ),
            grid=(B // tb,),
            in_specs=[spec, spec, spec],
            out_specs=(spec, spec),
        )(x, y, z)

    return run


def affine_xy_tpu(x, y, z, tb: int | None = None):
    """[16, B] jacobian -> canonical affine (x, y); inf lanes -> zeros."""
    if tb is None:
        tb = auto_tb(x.shape[-1])
    return _affine_xy_call(tb)(x, y, z)


# ---------------------------------------------------------------------------
# Schnorr sign epilogue: s = (neg ? n-k : k) + e*d  (mod n)
# ---------------------------------------------------------------------------


def _muladd_n_kernel(k_ref, e_ref, d_ref, f_ref, s_ref):
    k = [k_ref[i, :] for i in range(LIMBS)]
    e = [e_ref[i, :] for i in range(LIMBS)]
    d = [d_ref[i, :] for i in range(LIMBS)]
    neg = f_ref[0, :] != 0
    nk = _neg_mod_n(k)
    k = [jnp.where(neg, nk[i], k[i]) for i in range(LIMBS)]
    ed = _canon_n(_mul_limbs_n(e, d))
    s = _add_mod_n(k, ed)
    for i in range(LIMBS):
        s_ref[i, :] = s[i]


@lru_cache(maxsize=4)
def _muladd_n_call(tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(k, e, d, f):
        B = k.shape[-1]
        spec = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _muladd_n_kernel,
            out_shape=jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
            grid=(B // tb,),
            in_specs=[spec, spec, spec,
                      pl.BlockSpec((1, tb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=spec,
        )(k, e, d, f)

    return run


def muladd_n_tpu(k, e, d, neg_k, tb: int | None = None):
    """(neg_k ? n-k : k) + e*d mod n on canonical [16, B] inputs.

    The Schnorr partial-signature shape (s = k + e*d, main_impl.h:122)
    and the MuSig partial-sign core."""
    if tb is None:
        tb = auto_tb(k.shape[-1])
    return _muladd_n_call(tb)(k, e, d,
                              neg_k.astype(jnp.uint32)[None, :])
