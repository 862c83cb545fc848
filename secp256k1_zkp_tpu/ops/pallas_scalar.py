"""Pallas TPU kernels for GF(n) (group-order) scalar arithmetic.

Same limb-major design as pallas_field.py, but the reduction constant
red = 2^256 - n is 129 bits (9x16-bit limbs), so the fold is itself a
small schoolbook product done twice (high 16 columns, then the 8
residual columns).  Mirrors scalar_4x64's reduce (the reference gets the
same two-round structure from its 512->385->258-bit passes,
src/scalar_4x64_impl.h).

Main entries: the batched Fermat inverse kernel (x^(n-2) mod n), and the
fused ECDSA-verify *prep* kernel — s^-1, u1 = m/s, u2 = r/s, the GLV
lambda split of u2 (src/scalar_impl.h:142) and the 2^128 split of u1,
emitting exactly the digit streams the fused ecmult kernel
(pallas_group.ecmult_glv) consumes.  Keeping all of this in one Mosaic
kernel removes every 256-bit multiply from the XLA [B,16] glue path,
which profiling showed dominated end-to-end verify latency.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_field import LIMBS

MASK16 = 0xFFFF
N_ORDER = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
_RED = 2 ** 256 - N_ORDER                       # 129 bits
_RED_LIMBS = tuple((_RED >> (16 * i)) & 0xFFFF for i in range(9))
_N_LIMBS = tuple((N_ORDER >> (16 * i)) & 0xFFFF for i in range(16))


def _fold_once(cols, ncols_in):
    """Fold columns >= 16 of ``cols`` (list of ncols_in [TB] u32, each
    <= 2^22) through red; returns 24-or-16 columns, <= 2^23."""
    z = jnp.zeros_like(cols[0])
    n_hi = ncols_in - 16
    acc_lo = [z] * (n_hi + 9)
    acc_hi = [z] * (n_hi + 9)
    for k in range(n_hi):
        c = cols[16 + k]
        c_lo = c & MASK16
        c_hi = c >> 16                      # <= 2^7
        for j, r in enumerate(_RED_LIMBS):
            if r == 0:
                continue
            p = c_lo * r                    # exact (< 2^32)
            acc_lo[k + j] = acc_lo[k + j] + (p & MASK16)
            acc_hi[k + j] = acc_hi[k + j] + (p >> 16)
            # c_hi * r <= 2^23, at one limb up
            acc_hi[k + j] = acc_hi[k + j] + c_hi * r
    out_n = max(16, n_hi + 9 + 1)
    out = []
    for i in range(out_n):
        v = cols[i] if i < 16 else z
        if i < len(acc_lo):
            v = v + acc_lo[i]
        if 0 < i and (i - 1) < len(acc_hi):
            v = v + acc_hi[i - 1]
        out.append(v)
    return out


def _carry_pass(cols):
    """Sequential ripple over all columns; returns 16-bit columns plus
    the final carry appended as one extra column."""
    out = []
    carry = None
    for c in cols:
        t = c if carry is None else c + carry
        out.append(t & MASK16)
        carry = t >> 16
    out.append(carry)
    return out


def _reduce_cols_n(cols):
    """32 columns (<= 2^22) -> 16 weak limbs mod n.

    red is 129 bits (9 limbs), so each fold shrinks the high part by
    only 7 limbs: three rounds (16 -> 9+1 -> ~4 -> 0 high limbs), with a
    carry pass in between to keep every product exact in uint32."""
    cols = _fold_once(cols, 32)             # -> 26 cols, <= ~2^27
    cols = _carry_pass(cols)                # -> 27 cols, <= 0xFFFF
    cols = _fold_once(cols, len(cols))      # high 11 -> positions <= 19
    cols = _fold_once(cols, len(cols))      # high <=5 -> all below 16
    # all weight now in cols[0..15]; ripple
    out = []
    carry = None
    for i in range(LIMBS):
        t = cols[i] if carry is None else cols[i] + carry
        out.append(t & MASK16)
        carry = t >> 16
    # carry <= 2^16: fold carry*red (exact u32 products)
    for j, r in enumerate(_RED_LIMBS):
        if r:
            out[j] = out[j] + carry * r
    carry = None
    for i in range(LIMBS):
        t = out[i] if carry is None else out[i] + carry
        out[i] = t & MASK16
        carry = t >> 16
    # final carry is 0/1; one more tiny fold + short ripple
    for j, r in enumerate(_RED_LIMBS):
        if r:
            out[j] = out[j] + carry * r
    c = None
    for i in range(12):
        t = out[i] if c is None else out[i] + c
        out[i] = t & MASK16
        c = t >> 16
    return out


def _mul_limbs_n(a, b):
    """Schoolbook product mod n on 16-limb lists (weak output)."""
    z = jnp.zeros_like(a[0])
    lo = [z] * 31
    hi = [z] * 31
    for i in range(LIMBS):
        ai = a[i]
        for j in range(LIMBS):
            p = ai * b[j]
            lo[i + j] = lo[i + j] + (p & MASK16)
            hi[i + j] = hi[i + j] + (p >> 16)
    cols = [lo[0]] + [lo[k] + hi[k - 1] for k in range(1, 31)] + [hi[30]]
    return _reduce_cols_n(cols)


def _sqr_limbs_n(a):
    return _mul_limbs_n(a, a)


# n - 2, 4-bit digits LSB-first (static python)
_EXP_DIGITS = tuple(((N_ORDER - 2) >> (4 * i)) & 0xF for i in range(64))


def _inv_kernel(dig_ref, x_ref, o_ref):
    """Batched x^(n-2) mod n: fixed 4-bit windows via a fori_loop (one
    window body); the exponent's digit schedule sits in SMEM
    (the vectorized analog of the reference's fixed inversion chain,
    src/scalar_impl.h)."""
    x = [x_ref[i, :] for i in range(LIMBS)]
    # power table x^0..x^15 (a window body multiplies by pows[d];
    # d==0 multiplies by one, keeping the dataflow uniform)
    one = [jnp.zeros_like(x[0]) + 1] + [jnp.zeros_like(x[0])] * 15
    pows = [one, x]
    for d in range(2, 16):
        pows.append(_mul_limbs_n(pows[d - 1], x))

    def body(i, acc):
        acc = list(acc)
        for _ in range(4):
            acc = _sqr_limbs_n(acc)
        d = dig_ref[0, i]                   # MSB-first schedule
        sel = pows[0]
        for e in range(1, 16):
            m = d == e
            sel = [jnp.where(m, pe, se) for pe, se in zip(pows[e], sel)]
        return tuple(_mul_limbs_n(acc, sel))

    acc0 = pows[0]
    out = jax.lax.fori_loop(0, 64, body, tuple(acc0))
    for i in range(LIMBS):
        o_ref[i, :] = out[i]


@lru_cache(maxsize=4)
def _inv_call(tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    digs = np.array([_EXP_DIGITS[63 - w] for w in range(64)],
                    np.int32)[None, :]      # MSB-first

    @jax.jit
    def run(x):
        B = x.shape[-1]
        spec = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _inv_kernel,
            out_shape=jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((1, 64), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                spec,
            ],
            out_specs=spec,
        )(jnp.asarray(digs), x)

    return run


def inv_n_tpu(x, tb: int = 1024):
    """x^-1 mod n on [16, B] limb-major canonical input (weak output;
    inv(0) = 0)."""
    return _inv_call(tb)(x)


# ---------------------------------------------------------------------------
# Fused ECDSA verify prep: sinv, u1, u2, GLV split, digit streams.
# ---------------------------------------------------------------------------

# GLV lambda-decomposition constants (src/scalar_impl.h:83-160; public
# curve constants, re-derived in tests against the lattice relations).
LAMBDA = 0x5363AD4CC05C30E0A5261C028812645A122E22EA20816678DF02967C1B23BD72
_MINUS_B1 = 0xE4437ED6010E88286F547FA90ABFE4C3
_MINUS_B2 = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFE8A280AC50774346DD765CDA83DB1562C
_G1 = 0x3086D221A7D46BCDE86C90E49284EB153DAA8A1471E8CA7FE893209A45DBB031
_G2 = 0xE4437ED6010E88286F547FA90ABFE4C4221208AC9DF506C61571B4AE8AC47F71
_N_HALF = (N_ORDER - 1) // 2


def _c16(x: int, k: int = 16):
    return tuple((x >> (16 * i)) & 0xFFFF for i in range(k))


def _pad_cols(cols, n):
    z = jnp.zeros_like(cols[0])
    return list(cols) + [z] * (n - len(cols))


def _mul_limbs_nc(a, c_limbs):
    """a (list of [TB] u32 limbs, <=0xFFFF) times a python-int constant
    limb tuple, reduced mod n (weak 16-limb output)."""
    z = jnp.zeros_like(a[0])
    la, lc = len(a), len(c_limbs)
    lo = [z] * (la + lc - 1)
    hi = [z] * (la + lc - 1)
    for i in range(la):
        ai = a[i]
        for j in range(lc):
            cj = c_limbs[j]
            if cj == 0:
                continue
            p = ai * cj
            lo[i + j] = lo[i + j] + (p & MASK16)
            hi[i + j] = hi[i + j] + (p >> 16)
    ncol = la + lc
    cols = [lo[0]] + [lo[k] + hi[k - 1] for k in range(1, ncol - 1)] + [hi[ncol - 2]]
    return _reduce_cols_n(_pad_cols(cols, 32))


def _ripple(limbs):
    """Exact carry ripple; returns (<=0xFFFF limbs, carry_out)."""
    out = []
    carry = None
    for x in limbs:
        t = x if carry is None else x + carry
        out.append(t & MASK16)
        carry = t >> 16
    return out, carry


def _add_const_carry(a, c_limbs):
    """carry-out of a + c (a: 16 weak limbs; c: 16-limb int tuple)."""
    carry = None
    for i in range(16):
        t = a[i] + c_limbs[i]
        t = t if carry is None else t + carry
        carry = t >> 16
    return carry


def _canon_n(a):
    """weak (<=0xFFFF limbs, < 2^256) -> canonical mod n.

    x >= n  <=>  x + red carries out (cf. Mod.normalize, ops/limb.py)."""
    red = _c16(_RED)
    t = [a[i] + red[i] for i in range(16)]
    t, c = _ripple(t)
    ge = c > 0
    return [jnp.where(ge, t[i], a[i]) for i in range(16)]


def _sub_from_const(c_limbs, b):
    """c - b with borrow ripple; requires c >= b (b canonical limbs)."""
    out = []
    borrow = None
    for i in range(16):
        d = jnp.uint32(c_limbs[i] + 0x10000) - b[i]
        d = d if borrow is None else d - borrow
        out.append(d & MASK16)
        borrow = 1 - (d >> 16)
    return out


def _is_gt_const(a, c: int):
    """a > c on canonical 16-limb vectors (c: python int)."""
    comp = _c16((1 << 256) - 1 - c)
    return _add_const_carry(a, comp) > 0


def _mul_shift384_round(k, g: int):
    """round(k * g / 2^384) -> 8-limb list (k canonical 16 limbs).

    Mirrors scalar_mul_shift_var at shift=384 (src/scalar_4x64_impl.h)."""
    z = jnp.zeros_like(k[0])
    gl = _c16(g)
    lo = [z] * 31
    hi = [z] * 31
    for i in range(16):
        ki = k[i]
        for j in range(16):
            gj = gl[j]
            if gj == 0:
                continue
            p = ki * gj
            lo[i + j] = lo[i + j] + (p & MASK16)
            hi[i + j] = hi[i + j] + (p >> 16)
    cols = [lo[0]] + [lo[t] + hi[t - 1] for t in range(1, 31)] + [hi[30]]
    cols, _ = _ripple(cols)              # exact: product < 2^512
    res = cols[24:32]
    rbit = cols[23] >> 15
    res[0] = res[0] + rbit
    res, _ = _ripple(res)                # result < 2^128 (proof in ref)
    return res


def _glv_split(k):
    """k (canonical 16 limbs) -> (a1, neg1, a2, neg2): k === s1*a1 +
    lambda*s2*a2 (mod n), s_i = (-1)^neg_i, a_i < 2^128 (8 limbs).

    Port of the algorithm (not the code) of scalar_split_lambda
    (src/scalar_impl.h:127-181)."""
    c1 = _mul_shift384_round(k, _G1)
    c2 = _mul_shift384_round(k, _G2)
    t1 = _mul_limbs_nc(c1, _c16(_MINUS_B1, 8))
    t2 = _mul_limbs_nc(c2, _c16(_MINUS_B2))
    r2 = [x + y for x, y in zip(t1, t2)]       # bound 2*0xFFFF
    r2, c = _ripple(r2)
    # fold carry (0/1) * red, then short ripple
    redl = _c16(_RED, 9)
    r2 = [r2[i] + c * redl[i] if i < 9 else r2[i] for i in range(16)]
    r2, _ = _ripple(r2)
    r2 = _canon_n(r2)
    # r1 = k - lambda*r2 (mod n)
    lr2 = _canon_n(_mul_limbs_n(r2, list(_c16(LAMBDA))))
    nm = _sub_from_const(_c16(N_ORDER), lr2)   # n - lambda*r2, in [1, n]
    r1 = [x + y for x, y in zip(k, nm)]
    r1, c = _ripple(r1)
    r1 = [r1[i] + c * redl[i] if i < 9 else r1[i] for i in range(16)]
    r1, _ = _ripple(r1)
    r1 = _canon_n(r1)

    def mag(r):
        negf = _is_gt_const(r, _N_HALF)
        nr = _sub_from_const(_c16(N_ORDER), r)
        nr = _canon_n(nr)                      # r=0 -> n -> canon 0
        out = [jnp.where(negf, nr[i], r[i]) for i in range(8)]
        return out, negf.astype(jnp.uint32)

    a1, neg1 = mag(r1)
    a2, neg2 = mag(r2)
    return a1, neg1, a2, neg2


def _digits128_msb(l8):
    """8-limb list -> 32 MSB-first 4-bit digit vectors."""
    out = []
    for i in range(7, -1, -1):
        for j in (3, 2, 1, 0):
            out.append((l8[i] >> (4 * j)) & 0xF)
    return out


def _ecdsa_prep_kernel(dig_ref, m_ref, r_ref, s_ref, d_ref, f_ref):
    """m, r, s (canonical [16, TB]) -> digit streams + GLV sign flags.

    d_ref rows: 0-31 u1_lo digits, 32-63 u1_hi, 64-95 a1, 96-127 a2
    (all MSB-first 4-bit); f_ref rows: neg1, neg2 (uint32 0/1)."""
    m = [m_ref[i, :] for i in range(LIMBS)]
    r = [r_ref[i, :] for i in range(LIMBS)]
    s = [s_ref[i, :] for i in range(LIMBS)]

    # sinv = s^(n-2)  (same windowed schedule as _inv_kernel)
    pows = [[jnp.zeros_like(s[0]) + 1] + [jnp.zeros_like(s[0])] * 15, s]
    for d in range(2, 16):
        pows.append(_mul_limbs_n(pows[d - 1], s))

    def body(i, acc):
        acc = list(acc)
        for _ in range(4):
            acc = _sqr_limbs_n(acc)
        dg = dig_ref[0, i]
        sel = pows[0]
        for e in range(1, 16):
            mm = dg == e
            sel = [jnp.where(mm, pe, se) for pe, se in zip(pows[e], sel)]
        return tuple(_mul_limbs_n(acc, sel))

    sinv = list(jax.lax.fori_loop(0, 64, body, tuple(pows[0])))

    u1 = _canon_n(_mul_limbs_n(m, sinv))
    u2 = _canon_n(_mul_limbs_n(r, sinv))
    a1, neg1, a2, neg2 = _glv_split(u2)

    digs = (_digits128_msb(u1[:8]) + _digits128_msb(u1[8:])
            + _digits128_msb(a1) + _digits128_msb(a2))
    for i in range(128):
        d_ref[i, :] = digs[i]
    f_ref[0, :] = neg1
    f_ref[1, :] = neg2


@lru_cache(maxsize=4)
def _ecdsa_prep_call(tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    digs = np.array([_EXP_DIGITS[63 - w] for w in range(64)],
                    np.int32)[None, :]

    @jax.jit
    def run(m, r, s):
        B = m.shape[-1]
        spec16 = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _ecdsa_prep_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((128, B), jnp.uint32),
                jax.ShapeDtypeStruct((2, B), jnp.uint32),
            ),
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((1, 64), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                spec16, spec16, spec16,
            ],
            out_specs=(
                pl.BlockSpec((128, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
        )(jnp.asarray(digs), m, r, s)

    return run


def _glv_only_kernel(k_ref, d_ref, f_ref):
    """Canonical scalar [16, TB] -> GLV digit streams [64, TB] (rows
    0-31 |a1|, 32-63 |a2|, MSB-first) + sign flags [2, TB]."""
    k = [k_ref[i, :] for i in range(LIMBS)]
    a1, neg1, a2, neg2 = _glv_split(k)
    digs = _digits128_msb(a1) + _digits128_msb(a2)
    for i in range(64):
        d_ref[i, :] = digs[i]
    f_ref[0, :] = neg1
    f_ref[1, :] = neg2


@lru_cache(maxsize=4)
def _glv_only_call(tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(k):
        B = k.shape[-1]
        return pl.pallas_call(
            _glv_only_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((64, B), jnp.uint32),
                jax.ShapeDtypeStruct((2, B), jnp.uint32),
            ),
            grid=(B // tb,),
            in_specs=[pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((64, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
        )(k)

    return run


def glv_split_tpu(k, tb: int | None = None):
    """GLV lambda split of a canonical [16, B] scalar.

    Returns (digits [64, B]: |a1| rows 0-31, |a2| rows 32-63; flags
    [2, B]: neg1, neg2) with k === (-1)^neg1*a1 + lambda*(-1)^neg2*a2."""
    from .pallas_field import auto_tb
    if tb is None:
        tb = auto_tb(k.shape[-1])
    return _glv_only_call(tb)(k)


def ecdsa_prep_tpu(m, r, s, tb: int | None = None):
    """Fused ECDSA verify prep on [16, B] limb-major canonical inputs.

    Returns (digits [128, B] uint32, flags [2, B] uint32): digit rows
    0-31 = u1 low half, 32-63 = u1 high half, 64-95 = |a1|, 96-127 =
    |a2| (4-bit windows, MSB-first), where u2 = (-1)^neg1 * a1 +
    lambda * (-1)^neg2 * a2 (mod n); flags = (neg1, neg2)."""
    from .pallas_field import auto_tb
    if tb is None:
        tb = auto_tb(m.shape[-1])
    return _ecdsa_prep_call(tb)(m, r, s)
