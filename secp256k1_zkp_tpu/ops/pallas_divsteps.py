"""Batched constant-time modular inversion via safegcd divsteps.

TPU re-expression of the reference's Bernstein–Yang modular inverse
(src/modinv32_impl.h; constant-time entry `secp256k1_modinv32`,
divstep batch `secp256k1_modinv32_divsteps_30:179`, limb updates
`update_de_30:408` / `update_fg_30:466`, final `normalize_30:63`).

Why not a straight port: the reference computes 30 divsteps per batch
because an int64 accumulator can absorb 30-bit-limb x 31-bit-matrix
products.  TPUs have no 64-bit lanes, so the shape here is **14
divsteps per batch on 14-bit signed limbs** (batch size MUST equal
limb size — the update functions interleave the /2^N shift with the
limb radix): every partial product and accumulator then provably fits
in int32 (see the bound comments at `_update_de`), and all lanes
advance in lockstep — the same fixed-dataflow/constant-time property
as the reference, vectorized.

Cost: 43 batches x 14 = 602 divsteps (>= the 590 proven sufficient for
256-bit inputs, modinv32_impl.h:540) at ~1k vector ops per batch —
roughly 9x fewer issue slots than the Fermat powering it replaces
(x^(m-2) ~ 330 muls x ~1k ops), which round-1 profiling showed
dominating the ECDSA prep kernel (docs/PERF.md).

These are kernel-internal functions: they run on lists of [TB]-shaped
uint32 limb vectors inside Pallas kernels (limb-major layout, batch on
VPU lanes), and are parameterized by a python-int modulus so the same
code serves GF(p), GF(n) and the exhaustive-test orders.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

L = 14                    # limb bits == divsteps per batch (see header)
ML = (1 << L) - 1         # limb mask
NL = 19                   # ceil(258 / 14): fits (-2*mod, mod) signed
NDIV = L                  # divsteps per batch (int32-safe; see below)
NBATCH = 43               # 43 * 14 = 602 >= 590 required divsteps

_i32 = jnp.int32
_u32 = jnp.uint32


@lru_cache(maxsize=8)
def _modinfo(modulus: int):
    """(mod limbs base 2^L, modulus^-1 mod 2^L) as python ints."""
    limbs = tuple((modulus >> (L * i)) & ML for i in range(NL))
    inv_l = pow(modulus, -1, 1 << L)
    return limbs, inv_l


def _from16(x16):
    """16 x 16-bit uint32 limb vectors -> NL x L-bit uint32 vectors."""
    out = []
    for i in range(NL):
        bit = L * i
        idx, off = bit // 16, bit % 16
        if idx >= 16:
            out.append(jnp.zeros_like(x16[0]))
            continue
        v = x16[idx] >> off
        if off + L > 16 and idx + 1 < 16:
            v = v | (x16[idx + 1] << (16 - off))
        out.append(v & ML)
    return out


def _to16(x15):
    """NL x L-bit (canonical, non-negative) -> 16 x 16-bit vectors."""
    out = []
    for i in range(16):
        bit = 16 * i
        idx, off = bit // L, bit % L
        v = x15[idx] >> off
        take = L - off
        j = idx + 1
        while take < 16 and j < NL:
            v = v | (x15[j] << take)
            take += L
            j += 1
        out.append(v & 0xFFFF)
    return out


def _divsteps_batch(zeta, f0, g0):
    """NDIV constant-time divsteps on the bottom limbs; returns
    (zeta', (u, v, q, r)) with the matrix entries as uint32 (values in
    [-2^NDIV, 2^NDIV] two's-complement).  Port of the *algorithm* of
    divsteps_30 (modinv32_impl.h:179-235) at batch size 14."""
    u = jnp.ones_like(f0)
    v = jnp.zeros_like(f0)
    q = jnp.zeros_like(f0)
    r = jnp.ones_like(f0)
    f, g = f0, g0
    for _ in range(NDIV):
        c1 = (zeta >> 31).astype(_u32)        # all-ones iff zeta < 0
        c2 = jnp.uint32(0) - (g & 1)          # all-ones iff g odd
        x = (f ^ c1) - c1
        y = (u ^ c1) - c1
        z = (v ^ c1) - c1
        g = g + (x & c2)
        q = q + (y & c2)
        r = r + (z & c2)
        m = c1 & c2
        zeta = (zeta ^ m.astype(_i32)) - 1
        f = f + (g & m)
        u = u + (q & m)
        v = v + (r & m)
        g = g >> 1
        u = u << 1
        v = v << 1
    return zeta, (u, v, q, r)


def _sext(x):
    """uint32 -> int32 reinterpret (values are two's-complement)."""
    return x.astype(_i32)


def _update_fg(f, g, t):
    """(t / 2^NDIV) * [f, g] on NL signed-L-bit limb lists (int32).

    Bounds: |u|+|v| <= 2^14 and |limb| < 2^14 give |u*fi + v*gi| < 2^28;
    adding a carry < 2^15 keeps every accumulator within int32."""
    u, v, q, r = (_sext(c) for c in t)
    cf = u * f[0] + v * g[0]
    cg = q * f[0] + r * g[0]
    cf = cf >> NDIV           # bottom NDIV bits provably zero
    cg = cg >> NDIV
    fo, go = [], []
    for i in range(1, NL):
        cf = cf + u * f[i] + v * g[i]
        cg = cg + q * f[i] + r * g[i]
        fo.append(cf & ML)
        go.append(cg & ML)
        cf = cf >> L
        cg = cg >> L
    # sign-extend the masked limbs back: limbs are stored non-negative
    # except the top, which keeps its sign (mirrors signed30's layout).
    fo.append(cf)
    go.append(cg)
    return fo, go


def _update_de(d, e, t, mod_limbs, inv_l: int):
    """(t * [d, e] + modulus * [md, me]) / 2^NDIV keeping d, e in
    (-2*modulus, modulus) — port of update_de_30 (modinv32_impl.h:408).

    Bounds (int32-safe): |u*di + v*ei| < 2^28; |md| < 2^15 after the
    low-bits correction, so |mod_i * md| < 2^29; total < 2^30."""
    u, v, q, r = (_sext(c) for c in t)
    sd = d[NL - 1] >> 31          # sign masks (int32 arithmetic shift)
    se = e[NL - 1] >> 31
    md = (u & sd) + (v & se)
    me = (q & sd) + (r & se)
    cd = u * d[0] + v * e[0]
    ce = q * d[0] + r * e[0]
    # correct md, me so the bottom NDIV bits of the sum vanish; only
    # the value mod 2^NDIV matters, so wrapping uint32 arithmetic is
    # exact here.
    md = md - ((jnp.uint32(inv_l) * cd.astype(_u32)
                + md.astype(_u32)).astype(_i32) & ML)
    me = me - ((jnp.uint32(inv_l) * ce.astype(_u32)
                + me.astype(_u32)).astype(_i32) & ML)
    cd = cd + jnp.int32(mod_limbs[0]) * md
    ce = ce + jnp.int32(mod_limbs[0]) * me
    cd = cd >> NDIV
    ce = ce >> NDIV
    do, eo = [], []
    for i in range(1, NL):
        cd = cd + u * d[i] + v * e[i]
        ce = ce + q * d[i] + r * e[i]
        if mod_limbs[i]:
            cd = cd + jnp.int32(mod_limbs[i]) * md
            ce = ce + jnp.int32(mod_limbs[i]) * me
        do.append(cd & ML)
        eo.append(ce & ML)
        cd = cd >> L
        ce = ce >> L
    do.append(cd)
    eo.append(ce)
    return do, eo


def divsteps_inv_l(x15, modulus: int):
    """Constant-time x^-1 mod modulus on NL x L-bit limb vectors
    (int32, canonical non-negative input).  inv(0) = 0 (the reference
    convention).  Returns canonical 15-bit limbs (int32, >= 0)."""
    mod_limbs, inv_l = _modinfo(modulus)
    zeta = jnp.full_like(x15[0], -1, dtype=_i32)
    f = [jnp.full_like(x15[0], m, dtype=_i32) for m in mod_limbs]
    g = [xi.astype(_i32) for xi in x15]
    d = [jnp.zeros_like(zeta) for _ in range(NL)]
    e = [jnp.zeros_like(zeta) for _ in range(NL)]
    e[0] = jnp.ones_like(zeta)

    def body(_, carry):
        zeta, f, g, d, e = carry
        zeta, t = _divsteps_batch(
            zeta, f[0].astype(_u32) & ML | (f[1].astype(_u32) << L),
            g[0].astype(_u32) & ML | (g[1].astype(_u32) << L))
        d, e = _update_de(list(d), list(e), t, mod_limbs, inv_l)
        f, g = _update_fg(list(f), list(g), t)
        return zeta, tuple(f), tuple(g), tuple(d), tuple(e)

    zeta, f, g, d, e = jax.lax.fori_loop(
        0, NBATCH, body, (zeta, tuple(f), tuple(g), tuple(d), tuple(e)))

    # f == +/- 1 now; sign lives in the top limb (see modinv32:576).
    return _normalize_final(list(d), f[NL - 1], mod_limbs)


def _normalize_final(d, sign, mod_limbs):
    """negate-if(sign<0), then two rounds of conditional modulus adds +
    carry propagation -> limbs in [0, 2^L), value in [0, modulus)
    (port of normalize_30, modinv32_impl.h:63-160)."""
    cond_add = d[NL - 1] >> 31
    d = [di + (jnp.int32(m) & cond_add) for di, m in zip(d, mod_limbs)]
    cond_neg = sign >> 31
    d = [(di ^ cond_neg) - cond_neg for di in d]
    carry = jnp.zeros_like(d[0])
    for i in range(NL - 1):
        t = d[i] + carry
        d[i] = t & ML
        carry = t >> L
    d[NL - 1] = d[NL - 1] + carry          # top limb keeps the sign
    cond_add = d[NL - 1] >> 31
    d = [di + (jnp.int32(m) & cond_add) for di, m in zip(d, mod_limbs)]
    carry = jnp.zeros_like(d[0])
    for i in range(NL - 1):
        t = d[i] + carry
        d[i] = t & ML
        carry = t >> L
    d[NL - 1] = d[NL - 1] + carry          # provably in [0, 2^L) now
    return d


def inv_limbs16(x16, modulus: int):
    """16 x 16-bit canonical uint32 limb vectors -> x^-1 mod modulus,
    same layout.  Drop-in replacement for the Fermat powering chains
    inside the Pallas kernels (pallas_field._pow_windows(p-2) /
    pallas_gen._pow_windows_n(n-2))."""
    x15 = _from16(x16)
    inv_l = divsteps_inv_l(x15, modulus)
    return [v.astype(_u32) for v in _to16(inv_l)]
