"""Pallas TPU kernels for GF(p) limb arithmetic.

Layout inversion vs the jnp path (ops/limb.py): inside these kernels a
256-bit element is **limb-major** — sixteen [TB]-shaped uint32 vectors,
one per limb, with the batch on the VPU lanes.  Limb indices live in the
unrolled instruction stream, so the schoolbook product and the carry
chains are pure elementwise vector ops with ZERO cross-lane shuffles —
the XLA [B,16] path pays pad/reshape lane-crossings in every column sum
(ops/limb.py `_diag_colsum`), which is the dominant loss there.

Kernel contract mirrors field_5x52 semantics (src/field_5x52_impl.h):
inputs/outputs are 16x16-bit limbs, canonical-or-weak (< 2^256), output
weak-normalized (limbs <= 0xFFFF, value possibly >= p once).

These kernels are TPU-only (Mosaic); the jnp path remains the portable
fallback and the CPU-test reference.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

LIMBS = 16
MASK16 = 0xFFFF  # python ints weak-type into uint32 ops without capture


def auto_tb(B: int, cap: int = 4096) -> int:
    """Block width for a batch of B lanes (callers pad B up to a
    multiple of the result).

    Wide blocks matter: each elementwise op then spans several vregs,
    giving the VPU independent instructions to hide op latency (a lone
    [512] stream leaves it ~3x idle — measured on the mulmod chain).
    Cap 4096: with the GLV kernel's pairs=2 unroll-and-jam (two
    independent 2048-lane pipelines per block) this is the round-3
    sweep optimum on v5e — see docs/PERF.md for the full tb x pairs
    matrix.  config().tb (SECP_TPU_TB) overrides for tuning sweeps."""
    from ..config import config
    if config().tb:
        return config().tb
    tb = 256
    while tb < cap and tb < B:
        tb *= 2
    return min(tb, cap)

# p = 2^256 - 2^32 - 977; 2^256 === red (mod p), red = 2^32 + 977
_RED_LO = 977


@partial(jax.jit, inline=False)
def _mul_limbs(a, b):
    """Schoolbook 16x16 product of limb-vector lists -> weak-normalized
    16-limb list.  a, b: lists of 16 [TB] uint32 (each <= 0xFFFF).

    jit-wrapped (round 5): the ~1.4k-bind body traces ONCE per shape
    signature and every further textual instance stages a single call
    eqn.  Unwrapped, a kernel with ~100 textual muls paid ~170 us per
    bind at every fresh-process trace — the mechanism behind the
    BENCH_r04 rc=124 stall (verify_tpu traced >500 s host-side).
    Mosaic inlines the call at lowering; emitted code is unchanged."""
    z = jnp.zeros_like(a[0])
    lo = [z] * 31
    hi = [z] * 31
    for i in range(LIMBS):
        ai = a[i]
        for j in range(LIMBS):
            p = ai * b[j]                     # exact in uint32
            lo[i + j] = lo[i + j] + (p & MASK16)
            hi[i + j] = hi[i + j] + (p >> 16)
    # cols[k] = lo[k] + hi[k-1]; bounds <= 32*0xFFFF < 2^21
    cols = [lo[0]] + [lo[k] + hi[k - 1] for k in range(1, 31)] + [hi[30]]
    return _reduce_cols(cols)


@partial(jax.jit, inline=False)
def _sqr_limbs(a):
    """Squaring: exploits symmetry (i<j doubled) — ~half the products.

    Off-diagonal products accumulate UNdoubled into their own columns,
    which are doubled once per column at the merge — one shift per
    column instead of two per product (240 -> ~33 shift ops; ~6% of
    the whole verify budget since squarings are the largest op class
    on the GLV path: 5 per doubling + 5 per add)."""
    z = jnp.zeros_like(a[0])
    lo = [z] * 31                             # diagonal contributions
    hi = [z] * 31
    loD = [z] * 31                            # off-diagonal, x2 deferred
    hiD = [z] * 31
    for i in range(LIMBS):
        p = a[i] * a[i]
        lo[2 * i] = lo[2 * i] + (p & MASK16)
        hi[2 * i] = hi[2 * i] + (p >> 16)
        for j in range(i + 1, LIMBS):
            p = a[i] * a[j]
            loD[i + j] = loD[i + j] + (p & MASK16)
            hiD[i + j] = hiD[i + j] + (p >> 16)
    # bounds: <= 8 off-diag products per column stream, each half
    # <= 0xFFFF  ->  loD/hiD < 2^19, doubled < 2^20; diag adds < 2^18;
    # total < 2^21 (same budget as _mul_limbs' 32*0xFFFF).
    cols = [lo[0] + (loD[0] << 1)]
    cols += [lo[k] + hi[k - 1] + ((loD[k] + hiD[k - 1]) << 1)
             for k in range(1, 31)]
    cols += [hi[30] + (hiD[30] << 1)]
    return _reduce_cols(cols)


def _ks_limbs(cols, nlimb):
    """Parallel-prefix (Kogge-Stone) carry over limb vectors, each
    <= 0x1FFFF so every carry is 0/1; returns (exact 16-bit limbs,
    carry-out).  Depth log2(nlimb) instead of the 16-step ripple —
    the mul's critical path is carry chains, and the VPU hides op
    latency only when the dependency chain is short or wide."""
    g = [(c >> 16) for c in cols]
    p = [((c & MASK16) == MASK16).astype(jnp.uint32) for c in cols]
    base = [c & MASK16 for c in cols]
    sh = 1
    while sh < nlimb:
        g2 = list(g)
        p2 = list(p)
        for i in range(sh, nlimb):
            g2[i] = g[i] | (p[i] & g[i - sh])
            p2[i] = p[i] & p[i - sh]
        g, p = g2, p2
        sh *= 2
    out = [base[0]]
    for i in range(1, nlimb):
        out.append((base[i] + g[i - 1]) & MASK16)
    return out, g[nlimb - 1]


def _reduce_cols(cols):
    """Fold 32 columns (< 2^22 each) mod p and carry-normalize to 16
    weak limbs.  Mirrors the 0x1000003D1 folding of the reference
    (src/field_5x52_int128_impl.h) in base 2^16.

    Carries are sequential ripples on purpose: a Kogge-Stone variant
    (log depth, ~25% more ops) measured 22% SLOWER end-to-end at
    tb=2048 — with two vregs of independent work per op the VPU
    already hides the ripple latency, so extra ops just cost issue
    slots."""
    # fold high halves: c * 2^(16k) * 2^256 === c * 2^(16k) * (2^32+977).
    # Descending, so the k=31,30 feedback into cols[17],cols[16] is
    # folded when those columns are reached (they are processed last).
    for k in range(31, 15, -1):
        c = cols[k]                            # <= 2^22 (+ <=2^22 feedback)
        cols[k - 16] = cols[k - 16] + c * _RED_LO   # + c*977  (< 2^32)
        cols[k - 14] = cols[k - 14] + c        # + c*2^32
    # sequential carry ripple (16 steps of elementwise ops)
    out = []
    carry = jnp.zeros_like(cols[0])
    for i in range(LIMBS):
        t = cols[i] + carry
        out.append(t & MASK16)
        carry = t >> 16
    # final carry (< 2^16) wraps: += carry*977 at limb0, += carry at limb2
    out[0] = out[0] + carry * _RED_LO
    out[2] = out[2] + carry
    carry = jnp.zeros_like(carry)
    for i in range(LIMBS):
        t = out[i] + carry
        out[i] = t & MASK16
        carry = t >> 16
    # value < 2^256 now; carry == 0 provably (one wrap of a < 2^272 value)
    return out


def _rows(ref):
    return [ref[i, :] for i in range(LIMBS)]


def _store(ref, limbs):
    for i in range(LIMBS):
        ref[i, :] = limbs[i]


# -- standalone chained-mul kernel (throughput validation + unit tests) ------


def _mulmod_chain_kernel(x_ref, y_ref, o_ref, *, n: int):
    x = _rows(x_ref)
    y = _rows(y_ref)
    for _ in range(n):
        x = _mul_limbs(x, y)
    _store(o_ref, x)


@lru_cache(maxsize=8)
def _mulmod_chain(n: int, tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = partial(_mulmod_chain_kernel, n=n)

    @jax.jit
    def run(x, y):
        B = x.shape[-1]
        grid = (B // tb,)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(x, y)

    return run


def mulmod_chain(x, y, n: int = 1, tb: int = 1024):
    """x*y^n mod p on [16, B] uint32 limb-major tensors (weak norm)."""
    return _mulmod_chain(n, tb)(x, y)


# ---------------------------------------------------------------------------
# Fixed-exponent powering + the x-only lift kernel (BIP-340 lift_x).
# ---------------------------------------------------------------------------

P_PRIME = 2 ** 256 - 2 ** 32 - 977


def _canon_p(a):
    """weak limbs -> canonical mod p (cond-subtract via carry trick)."""
    red = (977, 0, 1)
    t = []
    carry = None
    for i in range(LIMBS):
        s = a[i] + (red[i] if i < 3 else 0)
        s = s if carry is None else s + carry
        t.append(s & MASK16)
        carry = s >> 16
    ge = carry > 0
    return [jnp.where(ge, t[i], a[i]) for i in range(LIMBS)]


def _pow_windows(x, dig_ref, nwin: int):
    """x^e via 4-bit MSB-first windows whose digit schedule sits in
    dig_ref (SMEM [1, nwin]); one fori_loop body (compile-size rule)."""
    one = [jnp.zeros_like(x[0]) + 1] + [jnp.zeros_like(x[0])] * 15
    pows = [one, x]
    for d in range(2, 16):
        pows.append(_mul_limbs(pows[d - 1], x))

    def body(i, acc):
        acc = list(acc)
        for _ in range(4):
            acc = _sqr_limbs(acc)
        dg = dig_ref[0, i]
        sel = pows[0]
        for e in range(1, 16):
            m = dg == e
            sel = [jnp.where(m, pe, se) for pe, se in zip(pows[e], sel)]
        return tuple(_mul_limbs(acc, sel))

    return list(jax.lax.fori_loop(0, nwin, body, tuple(pows[0])))


def _exp_digits_msb(e: int, nwin: int = 64):
    return np.array([(e >> (4 * (nwin - 1 - w))) & 0xF
                     for w in range(nwin)], np.int32)[None, :]


def _lift_x_kernel(dig_ref, x_ref, y_ref, ok_ref):
    """BIP-340 lift_x: y = sqrt(x^3 + 7) with even y, validity mask.

    sqrt via y2^((p+1)/4) (the reference's fixed chain, field_impl.h:37,
    here a uniform windowed powering); even-select mirrors
    secp256k1_xonly_pubkey semantics."""
    x = [x_ref[i, :] for i in range(LIMBS)]
    x2 = _sqr_limbs(x)
    y2 = _mul_limbs(x2, x)
    y2[0] = y2[0] + 7
    y2, _ = _carry2(y2)
    y = _pow_windows(y2, dig_ref, 64)
    # valid  <=>  y^2 == y2  (exactly when y2 is a QR)
    chk = _sqr_limbs(y)
    dcanon = _canon_p(chk)
    scanon = _canon_p(y2)
    acc = None
    for a, b in zip(dcanon, scanon):
        d = a ^ b
        acc = d if acc is None else acc | d
    ok = acc == 0
    yc = _canon_p(y)
    odd = (yc[0] & 1) == 1
    # p - y (borrow ripple; y canonical; y==0 -> p, folds to 0 via canon)
    pl = tuple((P_PRIME >> (16 * i)) & 0xFFFF for i in range(LIMBS))
    ny = []
    borrow = None
    for i in range(LIMBS):
        d = jnp.uint32(pl[i] + 0x10000) - yc[i]
        d = d if borrow is None else d - borrow
        ny.append(d & MASK16)
        borrow = 1 - (d >> 16)
    ny = _canon_p(ny)
    for i in range(LIMBS):
        y_ref[i, :] = jnp.where(odd, ny[i], yc[i])
    ok_ref[0, :] = ok.astype(jnp.uint32)


def _carry2(limbs):
    """Two ripple passes with 2^256===2^32+977 folding (weak output)."""
    out, carry = [], None
    for i in range(LIMBS):
        t = limbs[i] if carry is None else limbs[i] + carry
        out.append(t & MASK16)
        carry = t >> 16
    out[0] = out[0] + carry * 977
    out[2] = out[2] + carry
    carry = None
    for i in range(LIMBS):
        t = out[i] if carry is None else out[i] + carry
        out[i] = t & MASK16
        carry = t >> 16
    return out, carry


@lru_cache(maxsize=2)
def _lift_x_call(tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    digs = _exp_digits_msb((P_PRIME + 1) // 4)

    @jax.jit
    def run(x):
        B = x.shape[-1]
        spec = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _lift_x_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((1, B), jnp.uint32),
            ),
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((1, 64), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                spec,
            ],
            out_specs=(spec, pl.BlockSpec((1, tb), lambda i: (0, i),
                                          memory_space=pltpu.VMEM)),
        )(jnp.asarray(digs), x)

    return run


def lift_x_tpu(x, tb: int | None = None):
    """[16, B] canonical x -> (even-y [16, B] canonical, on_curve [B])."""
    if tb is None:
        tb = auto_tb(x.shape[-1])
    y, ok = _lift_x_call(tb)(x)
    return y, ok[0] != 0


def _schnorr_check_kernel(x_ref, y_ref, z_ref, inf_ref, rx_ref,
                          ok_ref):
    """BIP-340 acceptance on a jacobian R: not-inf, even y(R), x(R)==r.

    Parity needs affine y, so one z inverse runs here — constant-time
    divsteps (ops/pallas_divsteps.py), replacing round 1's Fermat chain
    (cf. schnorrsig_verify, modules/schnorrsig/main_impl.h:215)."""
    from .pallas_divsteps import inv_limbs16
    X = [x_ref[i, :] for i in range(LIMBS)]
    Y = [y_ref[i, :] for i in range(LIMBS)]
    Z = [z_ref[i, :] for i in range(LIMBS)]
    xr = [rx_ref[i, :] for i in range(LIMBS)]
    inf = inf_ref[0, :]

    zz = _sqr_limbs(Z)
    t = _mul_limbs(xr, zz)
    dx = _canon_p(t)
    dX = _canon_p(X)
    acc = None
    for a, b in zip(dx, dX):
        d = a ^ b
        acc = d if acc is None else acc | d
    eq = acc == 0

    w = inv_limbs16(_canon_p(Z), P_PRIME)    # z^-1 (0 -> 0, masked by inf)
    w2 = _sqr_limbs(w)
    w3 = _mul_limbs(w2, w)
    yaff = _canon_p(_mul_limbs(Y, w3))
    even = (yaff[0] & 1) == 0

    ok_ref[0, :] = (eq & even & (inf == 0)).astype(jnp.uint32)


@lru_cache(maxsize=2)
def _schnorr_check_call(tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(x, y, z, inf, rx):
        B = x.shape[-1]
        spec = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        spec1 = pl.BlockSpec((1, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _schnorr_check_kernel,
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.uint32),
            grid=(B // tb,),
            in_specs=[spec, spec, spec, spec1, spec],
            out_specs=spec1,
        )(x, y, z, inf, rx)

    return run


def schnorr_check_tpu(x, y, z, inf, rx, tb: int | None = None):
    """BIP-340 R acceptance mask from limb-major jacobian R and r."""
    if tb is None:
        tb = auto_tb(x.shape[-1])
    ok = _schnorr_check_call(tb)(
        x, y, z, inf.astype(jnp.uint32)[None, :], rx)
    return ok[0] != 0


def _affine_meta_kernel(dchi_ref, x_ref, y_ref, z_ref,
                        ax_ref, ay_ref, sq_ref):
    """Jacobian -> canonical affine + is_square(y_aff).

    One divsteps z-inverse; the quadratic character runs on Y*Z^3 (same
    character as y_aff = Y/Z^3, since they differ by the square Z^6) —
    the batched analog of ge_set_gej + fe_is_square_var that pedersen /
    generator serialization need (modules/generator/main_impl.h)."""
    from .pallas_divsteps import inv_limbs16
    X = [x_ref[i, :] for i in range(LIMBS)]
    Y = [y_ref[i, :] for i in range(LIMBS)]
    Z = [z_ref[i, :] for i in range(LIMBS)]
    w = inv_limbs16(_canon_p(Z), P_PRIME)
    w2 = _sqr_limbs(w)
    w3 = _mul_limbs(w2, w)
    xa = _canon_p(_mul_limbs(X, w2))
    ya = _canon_p(_mul_limbs(Y, w3))
    z3 = _mul_limbs(_sqr_limbs(Z), Z)
    t = _mul_limbs(Y, z3)
    chi = _canon_p(_pow_windows(t, dchi_ref, 64))
    acc = chi[0] ^ 1
    for i in range(1, LIMBS):
        acc = acc | chi[i]
    sq = acc == 0                       # chi == 1  (y != 0 on secp256k1)
    for i in range(LIMBS):
        ax_ref[i, :] = xa[i]
        ay_ref[i, :] = ya[i]
    sq_ref[0, :] = sq.astype(jnp.uint32)


@lru_cache(maxsize=2)
def _affine_meta_call(tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dchi = _exp_digits_msb((P_PRIME - 1) // 2)

    @jax.jit
    def run(x, y, z):
        B = x.shape[-1]
        spec = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec((1, 64), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
        return pl.pallas_call(
            _affine_meta_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((1, B), jnp.uint32),
            ),
            grid=(B // tb,),
            in_specs=[sspec, spec, spec, spec],
            out_specs=(spec, spec,
                       pl.BlockSpec((1, tb), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)),
        )(jnp.asarray(dchi), x, y, z)

    return run


def affine_meta_tpu(x, y, z, tb: int | None = None):
    """[16, B] jacobian -> (x_aff, y_aff canonical, is_square(y_aff)).

    Infinity lanes (z == 0) return zeros; mask with inf outside."""
    if tb is None:
        tb = auto_tb(x.shape[-1])
    xa, ya, sq = _affine_meta_call(tb)(x, y, z)
    return xa, ya, sq[0] != 0
