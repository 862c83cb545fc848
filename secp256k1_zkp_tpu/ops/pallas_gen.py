"""Pallas TPU kernels for the SIGN path: fixed-base k*G + epilogues.

TPU-native counterpart of the reference's constant-time generator
multiplication (signed-digit multi-comb, src/ecmult_gen_impl.h:54-282)
and the scalar epilogues of ECDSA / Schnorr signing
(src/ecdsa_impl.h:274-310, src/modules/schnorrsig/main_impl.h:122).

Design (TPU-first, not a comb translation):

* k is recoded into 37 signed-w7 digits; digit position v runs against
  a compile-time-constant table of d * 2^(7v) * G (d = 1..64) — a full
  per-position comb, so k*G costs 37 constant mixed adds and ZERO
  doublings (~580 mod-p mul-equivalents per lane; the round-2 quarters
  design spent 52 adds + 65 doublings ~= 1030).  The tables are
  immediates (select chains of scalar constants), the analog of the
  generated precomputed_ecmult_gen.c, costing zero VMEM.
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
from .pallas_scalar import (NW7, N_ORDER, _c16, _canon_n, _is_gt_const,
                            _mul_limbs_n, _sub_from_const, recode_w7_256)

_RED_N = _c16(2 ** 256 - N_ORDER)
_N_HALF = (N_ORDER - 1) // 2
COMB_ENTRIES = 64   # signed-w7 magnitudes 1..64
_TAB_STRIDE = 128   # table columns per window (Mosaic lane alignment)


@lru_cache(maxsize=1)
def _comb_tables_np():
    """np [32, 37*64] uint32: column 64v + (d-1) holds the x‖y limbs
    (limb-major) of ((d) * 2^(7v) mod n) * G.

    One 64-entry table per digit position: with per-window tables no
    doublings are spent on the fixed base at all — 37 adds replace the
    round-2 quarters design's 52 adds + 65 doublings (the TPU-shaped
    descendant of the reference's signed-digit multi-comb with its
    per-block precomputed tables, src/ecmult_gen_impl.h:54-116 and
    precomputed_ecmult_gen.c).  Shipped into the kernel as a VMEM input
    (303 KiB) — Pallas rejects non-scalar captured constants, and a
    limb-major layout makes each entry a [32, 1] column that broadcasts
    along lanes for free."""
    from ..utils import hostcurve as hc
    # d * 2^(7v) * G by jacobian accumulation (base_{v+1} = 128*base_v,
    # entry_d = entry_{d-1} + base) + ONE shared Montgomery inversion —
    # the affine-add path paid a pow() inversion per entry (~49 s of
    # host time per fresh process, measured round 5).
    jpts = []
    base = hc.jlift(hc.G)
    for v in range(NW7):
        acc = base
        for d in range(1, COMB_ENTRIES + 1):
            jpts.append(acc)
            acc = hc.jadd(acc, base)
        for _ in range(7):
            base = hc.jdouble(base)
    cols = [list(_c16(x)) + list(_c16(y))
            for x, y in hc.batch_affine(jpts)]
    tab = np.array(cols, np.uint32).reshape(NW7, COMB_ENTRIES, 32)
    # pad each window block to a 128-column stride: Mosaic requires
    # dynamic lane-dim slice starts to be 128-aligned
    tab = np.pad(tab, ((0, 0), (0, _TAB_STRIDE - COMB_ENTRIES), (0, 0)))
    return tab.reshape(NW7 * _TAB_STRIDE, 32).T.copy()


def _gather_const(wtab, d):
    """Stacked full-table cmov scan over a [32, 64] window table value
    (one column per entry, x‖y limb-major); d in 1..64 (d == 0 is
    masked by the caller's inf flag).

    One [32, TB] select chain instead of 63x32 per-limb selects — the
    same emitted vselects, ~13x fewer traced binds (round-5 trace-cost
    fix; cf. the reference's full-table cmov scan,
    src/ecmult_gen_impl.h:237-249)."""
    acc = jnp.broadcast_to(wtab[:, 0:1], (2 * LIMBS, d.shape[-1]))
    for e in range(2, COMB_ENTRIES + 1):
        m = (d == e)[None, :]
        acc = jnp.where(m, wtab[:, e - 1:e], acc)
    gx = FE([acc[i] for i in range(LIMBS)], MASK16)
    gy = FE([acc[LIMBS + i] for i in range(LIMBS)], MASK16)
    return gx, gy


def gen_digits(k_t):
    """Canonical scalar [16, B] -> [37, B] signed-w7 comb digit rows
    (MSB-first).  Cheap elementwise [B]-ops, so it stays in XLA glue."""
    return jnp.stack(recode_w7_256([k_t[i] for i in range(LIMBS)]),
                     axis=0)


def _gen_kernel(*refs, blinded=False, pairs=1):
    """k*G from comb digit rows: 37 unrolled constant-table mixed adds,
    zero doublings (each row v gathers from its own 2^(7v)-scaled
    immediates table).

    With ``blinded`` the kernel takes two extra input refs carrying the
    affine blinding point gb = -b*G and ends with one mixed add — the
    point-offset half of the reference's ecmult_gen blinding
    (src/ecmult_gen_impl.h:285-339); the scalar offset k' = k + b mod n
    is applied by the caller before digit recoding.

    ``pairs`` is the same unroll-and-jam as the GLV kernel's: the
    block's lanes split into independent column groups whose 37-add
    dependency chains interleave in one instruction stream."""
    from jax.experimental import pallas as pl

    if blinded:
        d_ref, tab_ref, bx_ref, by_ref, ox_ref, oy_ref, oz_ref = refs
    else:
        d_ref, tab_ref, ox_ref, oy_ref, oz_ref = refs
    tb_full = d_ref.shape[-1]
    assert tb_full % pairs == 0
    hw = tb_full // pairs

    colgroups = [slice(h * hw, (h + 1) * hw) for h in range(pairs)]

    def run_group(cols):
        # fori over the 37 windows (the adds are serially dependent, so
        # rolling costs no ILP; round-5 trace-cost fix — the unrolled
        # form re-traced the complete add 37x per group).
        def body(i, acc):
            dg = d_ref[i, cols]
            mag = dg & 0xFF
            sgn = dg >> 8
            # rows are MSB-first: row i is digit position NW7-1-i, and
            # its 64 table columns start at a 128-aligned stride
            wtab = tab_ref[:, pl.dslice((NW7 - 1 - i) * _TAB_STRIDE,
                                        _TAB_STRIDE)]
            gx, gy = _gather_const(wtab, mag)
            gy = fe_select(sgn != 0, fe_weak(fe_neg(gy)), gy)
            return jp_add_aff(acc, gx, gy,
                              (mag == 0).astype(jnp.uint32))

        return jax.lax.fori_loop(0, NW7, body, jp_inf(d_ref[0, cols]))

    accs = [run_group(cols) for cols in colgroups]
    for h, (acc, cols) in enumerate(zip(accs, colgroups)):
        tb = d_ref[0, cols]
        if blinded:
            gbx = FE([bx_ref[i, cols] for i in range(LIMBS)], MASK16)
            gby = FE([by_ref[i, cols] for i in range(LIMBS)], MASK16)
            acc = jp_add_aff(acc, gbx, gby, jnp.zeros_like(tb))
        # z = 0 marks infinity lanes (k === 0 mod n); valid signing
        # scalars never hit it, verify's u1 = m/s legitimately can.
        z = fe_select(acc.inf != 0, fe_zero(tb), fe_weak(acc.z))
        for i in range(LIMBS):
            ox_ref[i, cols] = fe_weak(acc.x).l[i]
            oy_ref[i, cols] = fe_weak(acc.y).l[i]
            oz_ref[i, cols] = z.l[i]


@lru_cache(maxsize=8)
def _gen_call(tb: int, blinded: bool = False):
    import os
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pairs = max(int(os.environ.get("SECP_TPU_COMB_PAIRS", "2")), 1)
    while pairs > 1 and (tb % pairs or (tb // pairs) % 256):
        pairs //= 2

    tab_np = _comb_tables_np()

    @jax.jit
    def run(digs, *gb):
        B = digs.shape[-1]
        spec16 = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        tab_spec = pl.BlockSpec(tab_np.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(_gen_kernel, blinded=blinded, pairs=pairs),
            out_shape=(
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
            ),
            grid=(B // tb,),
            in_specs=[pl.BlockSpec((NW7, tb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM), tab_spec]
            + ([spec16, spec16] if blinded else []),
            out_specs=(spec16, spec16, spec16),
        )(digs, jnp.asarray(tab_np), *gb)

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


def fixedbase_digits_tpu(gdigs, tb: int | None = None):
    """k*G from precomputed signed-w7 comb digit rows [37, B]
    (pallas_scalar.recode_w7_256 layout, MSB-first).

    Returns jacobian (x, y, z) [16, B] weak limbs; z == 0 marks
    infinity lanes (all-zero digits).  The verify pipelines feed this
    from their prep kernels and hand the result to the GLV kernel's
    final add (u1*G + u2*P with zero G-side doublings)."""
    if tb is None:
        tb = auto_tb(gdigs.shape[-1])
    return _gen_call(tb)(gdigs)


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
