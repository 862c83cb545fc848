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


def _carry_pass(cols):
    """Sequential ripple over all columns; returns 16-bit columns plus
    the final carry appended as one extra column.  (A Kogge-Stone
    variant measured slower end-to-end; see _reduce_cols in
    pallas_field.py.)"""
    out = []
    carry = None
    for c in cols:
        t = c if carry is None else c + carry
        out.append(t & MASK16)
        carry = t >> 16
    out.append(carry)
    return out


def _fold_red(h):
    """h (<=0xFFFF limbs) * red -> carry-save columns (len(h)+9, each
    <= 9*2*0xFFFF < 2^21).  Operand-scan with lo/hi split, exactly the
    mod-p _mul_limbs shape; red's top limb is 1 (bit 128) so that row
    is a plain add."""
    z = jnp.zeros_like(h[0])
    nh = len(h)
    lo = [z] * (nh + 8)
    hi = [z] * (nh + 8)
    for i in range(nh):
        hv = h[i]
        for j in range(8):
            r = _RED_LIMBS[j]
            if r == 0:
                continue
            p = hv * r
            lo[i + j] = lo[i + j] + (p & MASK16)
            hi[i + j] = hi[i + j] + (p >> 16)
        lo[i + 8] = lo[i + 8] + hv          # r8 == 1 (the 2^128 term)
    cols = [lo[0]] + [lo[k] + hi[k - 1] for k in range(1, nh + 8)]
    cols.append(hi[nh + 7])
    return cols


def _reduce_cols_n(cols):
    """Carry-save columns (<= 32, each <= 2^22) -> 16 weak limbs mod n.

    X = X_lo + 2^256*X_hi === X_lo + X_hi*red with red = 2^256 - n
    (129 bits), applied three times: 512 -> 385 -> 258 -> 257 bits —
    the same shrink schedule the reference's 4x64 reduce uses
    (src/scalar_4x64_impl.h), as pure operand-scan folds."""
    x = _carry_pass(cols)                   # exact limbs; value < 2^512
    h = x[16:32] if len(x) >= 32 else x[16:]
    c1 = _fold_red(h)                       # 25 cols <= 2^21
    for i in range(LIMBS):
        c1[i] = c1[i] + x[i]
    y = _carry_pass(c1)                     # value < 2^385 + 2^256
    c2 = _fold_red(y[16:25])
    for i in range(LIMBS):
        c2[i] = c2[i] + y[i]
    z2 = _carry_pass(c2)                    # value < 2^258 + 2^256
    c3 = _fold_red([z2[16], z2[17]])        # 11 cols
    while len(c3) < LIMBS:
        c3.append(jnp.zeros_like(c3[0]))
    for i in range(LIMBS):
        c3[i] = c3[i] + z2[i]
    w = _carry_pass(c3)                     # value < 2^256 + 2^146
    out = w[:LIMBS]
    c = w[LIMBS]                            # 0/1
    # if w >= 2^256 the remainder is < 2^146, so one fold + a 12-limb
    # ripple is exact (post-fold value < 2^147).
    for j in range(8):
        out[j] = out[j] + c * _RED_LIMBS[j]
    out[8] = out[8] + c
    carry = None
    for i in range(12):
        t = out[i] if carry is None else out[i] + carry
        out[i] = t & MASK16
        carry = t >> 16
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
    """Squaring mod n: symmetric products doubled (~half the multiplies,
    cf. the mod-p _sqr_limbs).  Off-diagonal columns accumulate
    undoubled and double once per column (one shift per column instead
    of two per product; bounds as in pallas_field._sqr_limbs)."""
    z = jnp.zeros_like(a[0])
    lo = [z] * 31
    hi = [z] * 31
    loD = [z] * 31
    hiD = [z] * 31
    for i in range(LIMBS):
        p = a[i] * a[i]
        lo[2 * i] = lo[2 * i] + (p & MASK16)
        hi[2 * i] = hi[2 * i] + (p >> 16)
        for j in range(i + 1, LIMBS):
            p = a[i] * a[j]
            loD[i + j] = loD[i + j] + (p & MASK16)
            hiD[i + j] = hiD[i + j] + (p >> 16)
    cols = [lo[0] + (loD[0] << 1)]
    cols += [lo[k] + hi[k - 1] + ((loD[k] + hiD[k - 1]) << 1)
             for k in range(1, 31)]
    cols += [hi[30] + (hiD[30] << 1)]
    return _reduce_cols_n(cols)


# n - 2, 4-bit digits LSB-first (static python)
_EXP_DIGITS = tuple(((N_ORDER - 2) >> (4 * i)) & 0xF for i in range(64))


def _inv_kernel(x_ref, o_ref):
    """Batched x^-1 mod n via constant-time safegcd divsteps
    (ops/pallas_divsteps.py; the reference's modinv32_impl.h) — ~9x
    fewer issue slots than the Fermat x^(n-2) chain it replaced."""
    from .pallas_divsteps import inv_limbs16
    x = [x_ref[i, :] for i in range(LIMBS)]
    out = inv_limbs16(x, N_ORDER)
    for i in range(LIMBS):
        o_ref[i, :] = out[i]


@lru_cache(maxsize=4)
def _inv_call(tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(x):
        B = x.shape[-1]
        spec = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _inv_kernel,
            out_shape=jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
            grid=(B // tb,),
            in_specs=[spec],
            out_specs=spec,
        )(x)

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


NW5 = 26  # signed 5-bit windows covering a < 2^128 magnitude
NW7 = 37  # signed 7-bit windows covering a < 2^256 magnitude


def recode_signed(limbs, nbits: int, w: int):
    """16-bit limb list (value < 2^nbits) -> ceil((nbits+1)/w) MSB-first
    signed w-bit digits encoded as mag | sign<<8, digits in
    [-2^(w-1), 2^(w-1)].

    Signed fixed windows halve the table reach per entry — the vector
    analog of the reference's signed-digit multi-comb / wNAF recodings
    (src/ecmult_gen_impl.h:200, src/ecmult_impl.h:162).  Requires
    nbits % w != 0: the top digit is bits [w*(nw-1), nbits) plus a
    carry, which stays <= 2^(w-1) since the raw top digit is
    <= 2^(nbits mod w) - 1 < 2^(w-1)."""
    nl = len(limbs)
    assert nbits <= 16 * nl and nbits % w != 0 and w <= 8
    assert (1 << (nbits % w)) <= (1 << (w - 1))
    nw = (nbits + 1 + w - 1) // w
    half, full = 1 << (w - 1), 1 << w
    raw = []
    for i in range(nw):
        bit = w * i
        idx, off = bit // 16, bit % 16
        if idx >= nl:
            raw.append(jnp.zeros_like(limbs[0]))
            continue
        v = limbs[idx] >> off
        if off + w > 16 and idx + 1 < nl:
            v = v | (limbs[idx + 1] << (16 - off))
        raw.append(v & (full - 1))
    out = []
    carry = None
    for i in range(nw):
        d = raw[i] if carry is None else raw[i] + carry
        neg = d > half
        carry = neg.astype(jnp.uint32)
        mag = jnp.where(neg, jnp.uint32(full) - d, d)
        out.append(mag | (carry << 8))
    # top digit: raw (< 2^(w-1)) + carry <= 2^(w-1), so it is never
    # negative and the final carry is provably zero.
    return out[::-1]


def recode_w5_n(limbs, nbits: int):
    return recode_signed(limbs, nbits, 5)


def recode_w5(l8):
    """8x16-bit limbs (value < 2^128) -> 26 MSB-first signed-w5 digits."""
    return recode_signed(l8, 128, 5)


def recode_w7_256(l16):
    """16x16-bit limbs (value < 2^256) -> 37 MSB-first signed-w7 digits
    (mag | sign<<8, mag <= 64) — the fixed-base comb stream: each digit
    has its own precomputed 2^(7v)*G multiples table, so no doublings
    are spent on the G side (pallas_gen._comb_kernel)."""
    return recode_signed(l16, 256, 7)


def _ecdsa_prep_kernel(m_ref, r_ref, s_ref, d_ref, g_ref, f_ref):
    """m, r, s (canonical [16, TB]) -> digit streams + GLV sign flags.

    d_ref rows (MSB-first signed 5-bit, mag | sign<<8): 0-25 a1,
    26-51 a2; g_ref rows 0-36: u1 signed-w7 comb digits (for the
    fixed-base kernel); f_ref rows: neg1, neg2."""
    from .pallas_divsteps import inv_limbs16
    m = [m_ref[i, :] for i in range(LIMBS)]
    r = [r_ref[i, :] for i in range(LIMBS)]
    s = [s_ref[i, :] for i in range(LIMBS)]

    # sinv via constant-time divsteps (modinv32_impl.h port): replaces
    # the 330-mul Fermat chain that dominated this kernel in round 1.
    sinv = inv_limbs16(s, N_ORDER)

    u1 = _canon_n(_mul_limbs_n(m, sinv))
    u2 = _canon_n(_mul_limbs_n(r, sinv))
    a1, neg1, a2, neg2 = _glv_split(u2)

    digs = recode_w5(a1) + recode_w5(a2)
    for i in range(2 * NW5):
        d_ref[i, :] = digs[i]
    gd = recode_w7_256(u1)
    for i in range(NW7):
        g_ref[i, :] = gd[i]
    f_ref[0, :] = neg1
    f_ref[1, :] = neg2


@lru_cache(maxsize=4)
def _ecdsa_prep_call(tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(m, r, s):
        B = m.shape[-1]
        spec16 = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _ecdsa_prep_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((2 * NW5, B), jnp.uint32),
                jax.ShapeDtypeStruct((NW7, B), jnp.uint32),
                jax.ShapeDtypeStruct((2, B), jnp.uint32),
            ),
            grid=(B // tb,),
            in_specs=[spec16, spec16, spec16],
            out_specs=(
                pl.BlockSpec((2 * NW5, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NW7, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
        )(m, r, s)

    return run


def _glv_only_kernel(k_ref, d_ref, f_ref):
    """Canonical scalar [16, TB] -> GLV digit streams [52, TB] (rows
    0-25 a1, 26-51 a2, MSB-first signed-w5) + sign flags [2, TB]."""
    k = [k_ref[i, :] for i in range(LIMBS)]
    a1, neg1, a2, neg2 = _glv_split(k)
    digs = recode_w5(a1) + recode_w5(a2)
    for i in range(2 * NW5):
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
                jax.ShapeDtypeStruct((2 * NW5, B), jnp.uint32),
                jax.ShapeDtypeStruct((2, B), jnp.uint32),
            ),
            grid=(B // tb,),
            in_specs=[pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((2 * NW5, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
        )(k)

    return run


def glv_split_tpu(k, tb: int | None = None):
    """GLV lambda split of a canonical [16, B] scalar.

    Returns (digits [52, B]: a1 rows 0-25, a2 rows 26-51, signed-w5
    encoded; flags [2, B]: neg1, neg2) with k === (-1)^neg1*a1 +
    lambda*(-1)^neg2*a2."""
    from .pallas_field import auto_tb
    if tb is None:
        tb = auto_tb(k.shape[-1])
    return _glv_only_call(tb)(k)


def ecdsa_prep_tpu(m, r, s, tb: int | None = None):
    """Fused ECDSA verify prep on [16, B] limb-major canonical inputs.

    Returns (digits [52, B], gdigits [37, B], flags [2, B]): digit rows
    0-25 = a1, 26-51 = a2 (signed-w5, MSB-first, mag | sign<<8) with
    u2 = (-1)^neg1 * a1 + lambda * (-1)^neg2 * a2 (mod n); gdigits are
    u1's signed-w7 comb rows for pallas_gen's fixed-base kernel; flags
    = (neg1, neg2)."""
    from .pallas_field import auto_tb
    if tb is None:
        tb = auto_tb(m.shape[-1])
    return _ecdsa_prep_call(tb)(m, r, s)
