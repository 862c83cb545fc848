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


def _window() -> int:
    """Active window width for the portable engines (config override:
    SECP_TPU_JNP_WINDOW; 1 = compile-small correctness shape)."""
    from ..config import config
    return config().jnp_window


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


def scalar_digits(k: LB, window: int | None = None):
    """Canonical scalar -> [..., 256/window] int32 digits (LSB-first)."""
    assert k.bound <= MASK16
    if window is None:
        window = _window()
    assert 16 % window == 0
    per = 16 // window
    digs = []
    for i in range(LIMBS):
        limb = k.v[..., i].astype(jnp.int32)
        for j in range(per):
            digs.append((limb >> (window * j)) & ((1 << window) - 1))
    return jnp.stack(digs, axis=-1)


def ecmult_gen(k: LB, table: GenTable | None = None) -> G.GEJ:
    """k*G via fixed windows over the precomputed table.

    k must be canonical (< n).  Cost: 64 gathers + 64 complete adds,
    no doublings (cf. ecmult_gen comb loop, src/ecmult_gen_impl.h:54)."""
    if table is None:
        table = GenTable(_window())
    k = S.FN.norm_weak(k) if k.bound > MASK16 else k
    digits = scalar_digits(k, table.window)  # [..., 256/window]
    batch = k.batch_shape
    acc0 = G.gej_infinity(batch)

    def body(acc, xs):
        tx, ty, tinf, d = xs
        pt = G.ge_gather(tx, ty, tinf, d)
        return G.gej_add_ge(acc, pt), None

    digs = jnp.moveaxis(digits, -1, 0)  # [64, ...]
    acc, _ = jax.lax.scan(body, acc0, (table.tx, table.ty, table.tinf, digs))
    return acc


def _pt_table(p: G.GE, window: int | None = None):
    """Per-lane table of 0..2^w-1 multiples of p: ([T, ..., 16limbs] x2,
    [T, ...] inf).  Entries 3.. accumulate in a scan (one add body
    instead of inlined adds — compile-size), then one shared
    batch-affine conversion."""
    if window is None:
        window = _window()
    tsize = 1 << window
    if tsize == 2:
        # {inf, P}: P is already affine — no batch conversion needed
        # (the compile-small window=1 shape; every traced subgraph
        # counts on XLA:CPU, see config.jnp_window).
        inf0 = G.gej_infinity(p.batch_shape)
        zx = jnp.stack([jnp.zeros_like(p.x.v), F.FP.norm_if_needed(p.x).v])
        zy = jnp.stack([jnp.zeros_like(p.y.v), F.FP.norm_if_needed(p.y).v])
        return zx, zy, jnp.stack([jnp.ones_like(p.inf), p.inf])
    inf0 = G.gej_infinity(p.batch_shape)
    j1 = G.gej_from_ge(p)
    j1n = (F.FP.norm_if_needed(j1.x).v, F.FP.norm_if_needed(j1.y).v,
           F.FP.norm_if_needed(j1.z).v, j1.inf)
    heads = [(inf0.x.v, inf0.y.v, inf0.z.v, inf0.inf), j1n]
    tail = None
    if tsize > 2:
        j2 = G.gej_double(j1)
        j2n = (F.FP.norm_if_needed(j2.x).v, F.FP.norm_if_needed(j2.y).v,
               F.FP.norm_if_needed(j2.z).v, j2.inf)
        heads.append(j2n)
        if tsize > 3:
            def body(carry, _):
                prev = G.GEJ(LB(carry[0], MASK16), LB(carry[1], MASK16),
                             LB(carry[2], MASK16), carry[3])
                nxt = G.gej_add_ge(prev, p)
                out = (F.FP.norm_if_needed(nxt.x).v,
                       F.FP.norm_if_needed(nxt.y).v,
                       F.FP.norm_if_needed(nxt.z).v, nxt.inf)
                return out, out

            _, tail = jax.lax.scan(body, j2n, None, length=tsize - 3)

    def stackall(idx):
        hs = [h[idx][None] for h in heads]
        if tail is not None:
            hs.append(tail[idx])
        return jnp.concatenate(hs, axis=0)

    all_j = G.GEJ(LB(stackall(0), MASK16), LB(stackall(1), MASK16),
                  LB(stackall(2), MASK16), stackall(3))
    aff = G.ge_from_gej_batch(all_j, axis=0)
    return aff.x.v, aff.y.v, aff.inf


def ecmult_const(k: LB, p: G.GE) -> G.GEJ:
    """k*P for a variable per-lane base point (cf. ecmult_const,
    src/ecmult_const_impl.h:122).  Fixed uniform windows MSB-first."""
    window = _window()
    k = S.FN.norm_weak(k) if k.bound > MASK16 else k
    tx, ty, tinf = _pt_table(p, window)
    acc0 = G.gej_infinity(k.batch_shape)

    if window == 1:
        # compile-small shape: bits extracted in the body (see
        # _ecmult_shamir1) instead of a module-level 256-way stack.
        kv = k.v

        def body1(acc, i):
            acc = G.gej_double(acc)
            pt = G.ge_gather(tx, ty, tinf, _bit_at(kv, i))
            return G.gej_add_ge(acc, pt), None

        acc, _ = jax.lax.scan(body1, acc0,
                              jnp.arange(255, -1, -1, dtype=jnp.int32))
        return acc

    digits = scalar_digits(k, window)  # LSB-first
    digs = jnp.moveaxis(digits, -1, 0)[::-1]  # MSB-first

    def body(acc, d):
        acc = G.gej_double_n(acc, window)
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


def _ecmult_shamir1(u1: LB, u2: LB, p: G.GE, table: GenTable) -> G.GEJ:
    """u1*G + u2*P via ONE combined 4-entry table {inf, P, G, G+P}:
    per bit, one doubling + one complete mixed add (the Shamir/Straus
    trick; cf. the shared doubling chain of ecmult_strauss_wnaf,
    src/ecmult_impl.h:252-375).

    This is the compile-small window=1 shape (config.jnp_window=1,
    used by the multichip dryrun and 1-core CI): the scan body is the
    dominant term in XLA:CPU compile time, and folding the two add
    streams into one halves it.  Same formulas, same results."""
    batch = u1.batch_shape
    px = F.FP.norm_if_needed(p.x)
    py = F.FP.norm_if_needed(p.y)
    gx_np, gy_np = table.tx[0][1], table.ty[0][1]      # numpy [16]
    gxb = jnp.broadcast_to(gx_np, (*batch, LIMBS))
    gyb = jnp.broadcast_to(gy_np, (*batch, LIMBS))
    g_ge = G.GE(LB(gxb, MASK16), LB(gyb, MASK16),
                jnp.zeros(batch, bool))
    # G+P (affine; one shared inversion) — complete adds keep the
    # P == +-G and P == inf lanes exact.
    gp_j = G.gej_add_ge(G.gej_from_ge(g_ge), G.GE(px, py, p.inf))
    gp = G.ge_from_gej(gp_j)
    zeros = jnp.zeros((*batch, LIMBS), jnp.uint32)
    tx = jnp.stack([zeros, px.v, gxb, F.FP.norm_if_needed(gp.x).v])
    ty = jnp.stack([zeros, py.v, gyb, F.FP.norm_if_needed(gp.y).v])
    tinf = jnp.stack([jnp.ones(batch, bool), p.inf,
                      jnp.zeros(batch, bool), gp.inf])
    acc0 = G.gej_infinity(batch)
    u1v, u2v = u1.v, u2.v

    def body(acc, i):
        # extract bit i of both scalars IN the body: the 2x256
        # module-level bit-extraction stacks are the alternative, and
        # every module-level op costs XLA:CPU compile time (the
        # dryrun's budget).
        d = 2 * _bit_at(u1v, i) + _bit_at(u2v, i)
        acc = G.gej_double(acc)
        return G.gej_add_ge(acc, G.ge_gather(tx, ty, tinf, d)), None

    acc, _ = jax.lax.scan(body, acc0,
                          jnp.arange(255, -1, -1, dtype=jnp.int32))
    return acc


def _bit_at(kv, i):
    """Bit i (traced scalar) of canonical limb tensors [..., 16]."""
    limb = jax.lax.dynamic_index_in_dim(kv, i // 16, axis=-1,
                                        keepdims=False)
    return ((limb >> (i % 16).astype(jnp.uint32)) & 1).astype(jnp.int32)


def ecmult(u1: LB, u2: LB, p: G.GE, table: GenTable | None = None) -> G.GEJ:
    """u1*G + u2*P — the double-scalar verify engine (cf. ecmult,
    src/ecmult_impl.h:365).  Shares one doubling chain between both
    scalars; G windows gather from the fixed table, P windows from a
    per-lane table."""
    if table is None:
        table = GenTable(_window())
    window = table.window
    if window == 1:
        u1 = S.FN.norm_weak(u1) if u1.bound > MASK16 else u1
        u2 = S.FN.norm_weak(u2) if u2.bound > MASK16 else u2
        return _ecmult_shamir1(u1, u2, p, table)
    u1 = S.FN.norm_weak(u1) if u1.bound > MASK16 else u1
    u2 = S.FN.norm_weak(u2) if u2.bound > MASK16 else u2
    tx, ty, tinf = _pt_table(p, window)
    d1 = jnp.moveaxis(scalar_digits(u1, window), -1, 0)[::-1]  # MSB-first
    d2 = jnp.moveaxis(scalar_digits(u2, window), -1, 0)[::-1]
    # With a shared MSB-first doubling chain every G window adds a plain
    # multiple of G — i.e. row 0 of the fixed-base table.
    gtx, gty, gtinf = table.tx[0], table.ty[0], table.tinf[0]
    acc0 = G.gej_infinity(u1.batch_shape)

    def body(acc, xs):
        dg, dp = xs
        acc = G.gej_double_n(acc, window)
        acc = G.gej_add_ge(acc, G.ge_gather(gtx, gty, gtinf, dg))
        acc = G.gej_add_ge(acc, G.ge_gather(tx, ty, tinf, dp))
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, (d1, d2))
    return acc
