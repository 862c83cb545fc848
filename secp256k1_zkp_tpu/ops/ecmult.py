"""Scalar-multiplication engines, batched for TPU.

TPU-native re-expression of the reference's three engines (SURVEY.md L3):

* :func:`ecmult_gen`   — k*G, fixed base (reference: signed-digit comb,
  src/ecmult_gen_impl.h:54-282).  Here: 4-bit fixed windows over a
  64x16-entry device-resident affine table of G multiples; 64 gathers +
  64 complete adds, **zero doublings**.
* :func:`ecmult_const` — k*P, variable base (reference:
  src/ecmult_const_impl.h:122).  Per-lane 16-entry table of P multiples,
  then 64 windows of (4 doublings + gather + add), MSB-first.
* :func:`ecmult`       — u1*G + u2*P, the verify engine (reference:
  Strauss wNAF, src/ecmult_impl.h:252-375).  wNAF's data-dependent
  sparsity is hostile to SIMD lanes (SURVEY.md §3.3 note), so this uses
  fixed 4-bit windows for both scalars, sharing the doubling chain.

All loops are ``lax.scan`` so the compiled HLO stays small; all adds are
complete, so no secret-dependent control flow exists anywhere.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import hostcurve
from . import field as F
from . import group as G
from . import scalar as S
from .limb import LB, LIMBS, MASK16

WINDOW = 4
NWIN = 256 // WINDOW  # 64
TSIZE = 1 << WINDOW   # 16


# ---------------------------------------------------------------------------
# Fixed-base table (device-resident; analogue of precomputed_ecmult_gen.c)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=8)
def _gen_table_np(window: int = WINDOW, gen: tuple | None = None):
    """[NWIN, TSIZE] affine multiples: table[w][d] = d * 2^(4w) * G.

    Entry 0 is the point at infinity (flagged, coords zero).  ``gen``
    overrides the base point — used by the exhaustive tiny-order
    harness, the analog of the reference's recompiled generator
    (src/ecmult_gen.h:37-60); the chord-tangent host formulas never
    reference the curve's b, so they hold on the tiny-order curves."""
    nwin = 256 // window
    tsize = 1 << window
    tx = np.zeros((nwin, tsize, LIMBS), dtype=np.uint32)
    ty = np.zeros((nwin, tsize, LIMBS), dtype=np.uint32)
    tinf = np.zeros((nwin, tsize), dtype=bool)
    base = gen if gen is not None else hostcurve.G
    for w in range(nwin):
        acc = hostcurve.INF
        for d in range(tsize):
            if acc is hostcurve.INF:
                tinf[w, d] = True
            else:
                for i in range(LIMBS):
                    tx[w, d, i] = (acc[0] >> (16 * i)) & 0xFFFF
                    ty[w, d, i] = (acc[1] >> (16 * i)) & 0xFFFF
            acc = hostcurve.add(acc, base)
        for _ in range(window):
            base = hostcurve.add(base, base)
    return tx, ty, tinf


class GenTable:
    """Fixed-base table.  Held as host numpy so the cached object is safe
    to reuse across jit traces (each trace embeds it as a constant and XLA
    uploads it to device memory once per executable)."""

    def __init__(self, window: int = WINDOW, gen: tuple | None = None):
        tx, ty, tinf = _gen_table_np(window, gen)
        self.window = window
        self.tx = tx
        self.ty = ty
        self.tinf = tinf


@lru_cache(maxsize=1)
def default_gen_table() -> GenTable:
    return GenTable()


def scalar_digits(k: LB, window: int = WINDOW):
    """Canonical scalar -> [..., NWIN] int32 window digits (LSB-first)."""
    assert k.bound <= MASK16
    per = 16 // window
    digs = []
    for i in range(LIMBS):
        limb = k.v[..., i].astype(jnp.int32)
        for j in range(per):
            digs.append((limb >> (window * j)) & (TSIZE - 1))
    return jnp.stack(digs, axis=-1)


def ecmult_gen(k: LB, table: GenTable | None = None) -> G.GEJ:
    """k*G via fixed windows over the precomputed table.

    k must be canonical (< n).  Cost: 64 gathers + 64 complete adds,
    no doublings (cf. ecmult_gen comb loop, src/ecmult_gen_impl.h:54)."""
    table = table or default_gen_table()
    k = S.FN.norm_weak(k) if k.bound > MASK16 else k
    digits = scalar_digits(k)  # [..., 64]
    batch = k.batch_shape
    acc0 = G.gej_infinity(batch)

    def body(acc, xs):
        tx, ty, tinf, d = xs
        pt = G.ge_gather(tx, ty, tinf, d)
        return G.gej_add_ge(acc, pt), None

    digs = jnp.moveaxis(digits, -1, 0)  # [64, ...]
    acc, _ = jax.lax.scan(body, acc0, (table.tx, table.ty, table.tinf, digs))
    return acc


def _pt_table(p: G.GE):
    """Per-lane table of 0..15 multiples of p: ([16, ..., 16limbs] x2,
    [16, ...] inf).  Entries 3..15 accumulate in a scan (one add body
    instead of 13 inlined adds — compile-size), then one shared
    batch-affine conversion."""
    inf0 = G.gej_infinity(p.batch_shape)
    j1 = G.gej_from_ge(p)
    j2 = G.gej_double(j1)

    def body(carry, _):
        prev = G.GEJ(LB(carry[0], MASK16), LB(carry[1], MASK16),
                     LB(carry[2], MASK16), carry[3])
        nxt = G.gej_add_ge(prev, p)
        out = (F.FP.norm_if_needed(nxt.x).v, F.FP.norm_if_needed(nxt.y).v,
               F.FP.norm_if_needed(nxt.z).v, nxt.inf)
        return out, out

    j2n = (F.FP.norm_if_needed(j2.x).v, F.FP.norm_if_needed(j2.y).v,
           F.FP.norm_if_needed(j2.z).v, j2.inf)
    _, (tx, ty, tz, tinf) = jax.lax.scan(body, j2n, None,
                                         length=TSIZE - 3)

    def stack3(a, b, c, tail):
        return jnp.concatenate([a[None], b[None], c[None], tail], axis=0)

    all_j = G.GEJ(
        LB(stack3(inf0.x.v, F.FP.norm_if_needed(j1.x).v, j2n[0], tx),
           MASK16),
        LB(stack3(inf0.y.v, F.FP.norm_if_needed(j1.y).v, j2n[1], ty),
           MASK16),
        LB(stack3(inf0.z.v, F.FP.norm_if_needed(j1.z).v, j2n[2], tz),
           MASK16),
        stack3(inf0.inf, j1.inf, j2n[3], tinf))
    aff = G.ge_from_gej_batch(all_j, axis=0)
    return aff.x.v, aff.y.v, aff.inf


def ecmult_const(k: LB, p: G.GE) -> G.GEJ:
    """k*P for a variable per-lane base point (cf. ecmult_const,
    src/ecmult_const_impl.h:122).  Fixed uniform windows MSB-first."""
    k = S.FN.norm_weak(k) if k.bound > MASK16 else k
    tx, ty, tinf = _pt_table(p)
    digits = scalar_digits(k)  # [..., 64] LSB-first
    digs = jnp.moveaxis(digits, -1, 0)[::-1]  # MSB-first
    acc0 = G.gej_infinity(k.batch_shape)

    def body(acc, d):
        acc = G.gej_double_n(acc, WINDOW)
        pt = G.ge_gather(tx, ty, tinf, d)
        return G.gej_add_ge(acc, pt), None

    acc, _ = jax.lax.scan(body, acc0, digs)
    return acc


def ecmult_const_xonly(q: LB, x: LB, known_on_curve: bool = False,
                       b_coeff: int | None = None):
    """x(q*P) from x(P) alone — no square root anywhere (counterpart of
    ecmult_const_xonly, src/ecmult_const_impl.h:268-402, denominator-free
    case).

    Effective-affine isomorphism trick (Dettman): with g = x^3 + B and
    v = sqrt(g), the point (x, y, 1) equals (x*g, g^2, v) in Jacobian
    form; on the phi_v-isomorphic curve (same group law — B never
    appears in our add/double formulas) the base is simply affine
    (x*g, g^2).  q*P runs there through the standard constant-dataflow
    engine, and the secp256k1 affine result is X/(Z^2 * g) — v is never
    materialized, so no sqrt is computed.

    Returns (x_out canonical LB, ok).  ok requires x on curve (g a
    nonzero square; skipped if ``known_on_curve``), q != 0, and a
    non-infinity product."""
    x = F.FP.norm_weak(x) if x.bound > MASK16 else x
    if b_coeff is None:
        b_coeff = F.B_COEFF
    g = F.norm_weak(F.add(F.mul(F.sqr(x), x), F.fe(b_coeff)))
    ok = ~S.is_zero(q)
    if not known_on_curve:
        ok = ok & F.is_square(g) & ~F.is_zero(g)
    px = F.norm_weak(F.mul(g, x))
    py = F.norm_weak(F.sqr(g))
    p = G.GE(px, py, jnp.zeros(x.batch_shape, bool))
    rj = ecmult_const(q, p)
    i = F.inv(F.mul(F.sqr(rj.z), g))
    x_out = F.normalize(F.mul(rj.x, i))
    return x_out, ok & ~rj.inf


def ecmult(u1: LB, u2: LB, p: G.GE, table: GenTable | None = None) -> G.GEJ:
    """u1*G + u2*P — the double-scalar verify engine (cf. ecmult,
    src/ecmult_impl.h:365).  Shares one doubling chain between both
    scalars; G windows gather from the fixed table, P windows from a
    per-lane table."""
    table = table or default_gen_table()
    u1 = S.FN.norm_weak(u1) if u1.bound > MASK16 else u1
    u2 = S.FN.norm_weak(u2) if u2.bound > MASK16 else u2
    tx, ty, tinf = _pt_table(p)
    d1 = jnp.moveaxis(scalar_digits(u1), -1, 0)[::-1]  # MSB-first
    d2 = jnp.moveaxis(scalar_digits(u2), -1, 0)[::-1]
    # With a shared MSB-first doubling chain every G window adds a plain
    # multiple of G — i.e. row 0 of the fixed-base table.
    gtx, gty, gtinf = table.tx[0], table.ty[0], table.tinf[0]
    acc0 = G.gej_infinity(u1.batch_shape)

    def body(acc, xs):
        dg, dp = xs
        acc = G.gej_double_n(acc, WINDOW)
        acc = G.gej_add_ge(acc, G.ge_gather(gtx, gty, gtinf, dg))
        acc = G.gej_add_ge(acc, G.ge_gather(tx, ty, tinf, dp))
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, (d1, d2))
    return acc
