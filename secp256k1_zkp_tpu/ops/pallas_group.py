"""Pallas TPU kernel for the verify engine: R = u1*G + u2*P, fused.

The entire GLV double-scalar multiplication — per-lane P table build,
divsteps affine normalization, 26 signed-w5 windows of (5 doublings +
4 mixed adds), complete branchless group formulas, the ECDSA x(R)===r
epilogue — runs as ONE Mosaic kernel.  Field elements are
**limb-major**: sixteen [TB]-wide uint32 vectors with the batch on
the VPU lanes and limb indices unrolled in the instruction stream, so
there are no cross-lane shuffles anywhere (the jnp path's column sums
pay lane-crossing pad/reshapes per multiply; see ops/pallas_field.py).

Group formulas mirror ops/group.py (which mirrors src/group_impl.h:468,
:732): complete addition via the (M, Rn/Rd) degenerate-case select, so
the dataflow is fixed and secret-independent.

Table lookups are full-table cmov scans (16 selects), the vector analog
of the reference's scan (src/ecmult_const_impl.h:61) — per-lane dynamic
indexing is not a TPU vector primitive, and the scan is cheap relative
to the window's field ops.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_field import LIMBS, _mul_limbs, _sqr_limbs

MASK16 = 0xFFFF
_P_LIMBS = tuple(((2 ** 256 - 2 ** 32 - 977) >> (16 * i)) & 0xFFFF
                 for i in range(16))
_MIN_P_LIMB = min(_P_LIMBS)  # 0xFC2F

# Trace-cost containment (round 5): the group formulas below are
# jit-wrapped (inline=False) so each unique (shape, bound) signature
# traces ONCE per process and every further textual instance inside a
# kernel stages a single call eqn.  Without this, a fresh-process trace
# of the verify pipeline re-traced ~1.5M primitive binds at ~170 us
# each (>500 s host-side) — the BENCH_r04 rc=124 stall.  Mosaic inlines
# the calls at lowering, so the emitted kernel code is unchanged.
_kjit = partial(jax.jit, inline=False)


@jax.tree_util.register_pytree_node_class
class FE:
    """Field element inside a kernel: 16 [TB] uint32 limb vectors plus a
    static per-limb bound (the ops/limb.py magnitude discipline).

    Registered as a pytree (bound static) so the jit-wrapped group
    formulas can take/return FEs directly."""

    __slots__ = ("l", "bound")

    def __init__(self, limbs, bound):
        self.l = list(limbs)
        self.bound = int(bound)

    def tree_flatten(self):
        return tuple(self.l), self.bound

    @classmethod
    def tree_unflatten(cls, bound, children):
        return cls(children, bound)


def fe_weak(a: FE) -> FE:
    """Carry-normalize to limbs <= 0xFFFF (value may exceed p once).
    Requires bound + 2^16 < 2^32."""
    assert a.bound <= 0xFFFF0000, hex(a.bound)
    if a.bound <= MASK16:
        return a
    out = []
    carry = None
    for i in range(LIMBS):
        t = a.l[i] if carry is None else a.l[i] + carry
        out.append(t & MASK16)
        carry = t >> 16
    # fold carry * 2^256 === carry * (2^32 + 977); carry <= bound>>16
    out[0] = out[0] + carry * 977          # <= 0xFFFF + 2^16*977 < 2^32
    out[2] = out[2] + carry
    carry = None
    for i in range(LIMBS):
        t = out[i] if carry is None else out[i] + carry
        out[i] = t & MASK16
        carry = t >> 16
    # second carry-out is 0/1; if 1 the remaining value is tiny, so a
    # short fold+mini-ripple over the low limbs finishes exactly.
    out[0] = out[0] + carry * 977
    out[2] = out[2] + carry
    c = None
    for i in range(6):
        t = out[i] if c is None else out[i] + c
        out[i] = t & MASK16
        c = t >> 16
    return FE(out, MASK16)


def fe_mul(a: FE, b: FE) -> FE:
    a, b = fe_weak(a), fe_weak(b)
    return FE(_mul_limbs(a.l, b.l), MASK16)


def fe_sqr(a: FE) -> FE:
    a = fe_weak(a)
    return FE(_sqr_limbs(a.l), MASK16)


def fe_add(a: FE, b: FE) -> FE:
    bound = a.bound + b.bound
    assert bound < 0xFFFF0000
    return FE([x + y for x, y in zip(a.l, b.l)], bound)


def fe_mul_int(a: FE, k: int) -> FE:
    assert a.bound * k < 0xFFFF0000
    return FE([x * k for x in a.l], a.bound * k)


def fe_neg(a: FE) -> FE:
    """k*p - a (cf. fe_negate magnitude rule, src/field.h:214)."""
    k = a.bound // _MIN_P_LIMB + 1
    kp = [k * pl for pl in _P_LIMBS]
    assert max(kp) < 0xFFFF0000
    return FE([jnp.uint32(kpi) - x for kpi, x in zip(kp, a.l)], max(kp))


def fe_sub(a: FE, b: FE) -> FE:
    return fe_add(a, fe_neg(b))


def fe_select(mask, a: FE, b: FE) -> FE:
    """mask ? a : b, elementwise on [TB] lanes."""
    return FE([jnp.where(mask, x, y) for x, y in zip(a.l, b.l)],
              max(a.bound, b.bound))


def fe_half(a: FE) -> FE:
    """a/2 mod p: (a + p*(a&1)) >> 1, exact (cf. fe_half,
    src/field.h:331-341; the +p carry-out becomes the result's top
    bit)."""
    a = fe_weak(a)
    odd = a.l[0] & 1
    t = [a.l[i] + jnp.uint32(pl_) * odd for i, pl_ in enumerate(_P_LIMBS)]
    out = []
    carry = None
    for i in range(LIMBS):
        s = t[i] if carry is None else t[i] + carry
        out.append(s & MASK16)
        carry = s >> 16
    res = [(out[i] >> 1) | ((out[i + 1] & 1) << 15) for i in range(LIMBS - 1)]
    res.append((out[LIMBS - 1] >> 1) | (carry << 15))
    return FE(res, MASK16)


def fe_is_zero(a: FE):
    """Canonical zero test: normalize fully then OR-compare."""
    a = fe_weak(a)
    # conditional subtract p: x >= p  <=>  x + (2^256-p) carries out
    red = (977, 0, 1)
    t = []
    carry = None
    for i in range(LIMBS):
        s = a.l[i] + (red[i] if i < 3 else 0)
        s = s if carry is None else s + carry
        t.append(s & MASK16)
        carry = s >> 16
    ge_p = carry > 0
    acc = None
    for i in range(LIMBS):
        v = jnp.where(ge_p, t[i], a.l[i])
        acc = v if acc is None else acc | v
    return acc == 0


def fe_zero(template) -> FE:
    z = jnp.zeros_like(template)
    return FE([z] * LIMBS, 0)


def fe_one(template) -> FE:
    z = jnp.zeros_like(template)
    return FE([z + 1] + [z] * (LIMBS - 1), MASK16)


@jax.tree_util.register_pytree_node_class
class JP:
    """Jacobian point in kernel form: FE coords + [TB] uint32 0/1 inf
    mask (Mosaic dislikes i1 vectors in loop carries)."""

    __slots__ = ("x", "y", "z", "inf")

    def __init__(self, x, y, z, inf):
        self.x, self.y, self.z, self.inf = x, y, z, inf

    def tree_flatten(self):
        return (self.x, self.y, self.z, self.inf), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


def jp_inf(template) -> JP:
    # x declared at the weak bound (0 <= MASK16) so the first add in a
    # window chain shares the jit-trace signature of all later adds.
    z = jnp.zeros_like(template)
    return JP(FE([z] * LIMBS, MASK16), fe_one(template),
              fe_one(template), jnp.ones_like(template))


def _b(inf_u32):
    return inf_u32 != 0


@_kjit
def jp_double(a: JP) -> JP:
    """Mirror of ops/group.py gej_double (src/group_impl.h:468)."""
    A = fe_sqr(a.x)
    B = fe_sqr(a.y)
    C = fe_sqr(B)
    t = fe_sqr(fe_add(fe_weak(a.x), B))
    D = fe_weak(fe_mul_int(fe_sub(fe_sub(t, A), C), 2))
    E = fe_mul_int(A, 3)
    Fq = fe_sqr(E)
    X3 = fe_weak(fe_sub(Fq, fe_mul_int(D, 2)))
    Y3 = fe_weak(fe_sub(fe_mul(E, fe_sub(D, X3)), fe_mul_int(C, 8)))
    Z3 = fe_mul(fe_mul_int(fe_weak(a.y), 2), a.z)
    return JP(X3, Y3, Z3, a.inf)


def _jp_add_core(U1, S1, U2, S2, Zmul, a: JP, bx, by, b_inf):
    """Complete addition from precomputed U/S pairs: the Brier–Joye
    unified formula with the degenerate-case (y1 = -y2, x1 != x2)
    cmov path, exactly the 7M+5S shape of the reference's gej_add_ge
    (src/group_impl.h:731-867) — ~3 muls cheaper per add than the
    naive lambda-cubing layout this replaced.

    U1/S1/U2/S2 weak (<= 0xFFFF limbs); returns jacobian + inf mask."""
    T = fe_add(U1, U2)                       # T = U1+U2, bound 2*M16
    M = fe_add(S1, S2)                       # M = S1+S2, bound 2*M16
    rr = fe_sqr(T)                           # T^2
    m_alt = fe_neg(U2)                       # -U2, bound ~2*M16
    tt = fe_mul(U1, m_alt)                   # -U1*U2
    rr = fe_add(rr, tt)                      # R = T^2 - U1*U2
    deg = fe_is_zero(M)
    # If lambda = R/M degenerates (M == 0 but x1 != x2), the equal-
    # where-both-defined slope (S1-S2)/(U1-U2) = 2*S1/(U1-U2) is used.
    rr_alt = fe_mul_int(S1, 2)
    m_alt = fe_add(m_alt, U1)                # U1 - U2
    rr_f = fe_select(deg, rr_alt, fe_weak(rr))
    m_f = fe_select(deg, fe_weak(m_alt), fe_weak(M))
    n = fe_sqr(m_f)                          # Malt^2
    q = fe_mul(fe_neg(T), n)                 # Q = -T*Malt^2
    n2 = fe_sqr(n)                           # Malt^4
    # M^3*Malt is Malt^4 when not degenerate, else M (== 0 mod p).
    n_f = fe_select(deg, fe_weak(M), n2)
    t2 = fe_sqr(rr_f)                        # Ralt^2
    Z3 = fe_mul(Zmul, m_f)
    X3 = fe_add(t2, q)                       # X3 = Ralt^2 + Q (2*M16)
    t3 = fe_add(fe_mul_int(X3, 2), q)        # 2*X3 + Q
    t4 = fe_mul(t3, rr_f)
    # -(Ralt*(2X3+Q)+M^3*Malt)/2  (a lambda-cubing Y3 with 3 muls in
    # place of the sqr+half measured 4.5% slower end-to-end — the extra
    # muls cost more issue slots than the half's serial ripple)
    Y3 = fe_half(fe_neg(fe_add(t4, n_f)))
    X3 = fe_weak(X3)
    # inf: Z3 == 0 covers both a == -b (degenerate, Z3 = (x1-x2)*Z) and
    # the y1 = -y2 completeness argument (group_impl.h:848-866).
    inf3 = fe_is_zero(Z3)

    one = fe_one(X3.l[0])
    ax, ay, az = fe_weak(a.x), fe_weak(a.y), fe_weak(a.z)
    a_inf = _b(a.inf)
    bi = _b(b_inf)
    X3 = fe_select(a_inf, bx, fe_select(bi, ax, X3))
    Y3 = fe_select(a_inf, by, fe_select(bi, ay, Y3))
    Z3 = fe_select(a_inf, one, fe_select(bi, az, fe_weak(Z3)))
    inf = jnp.where(a_inf, b_inf,
                    jnp.where(bi, a.inf, inf3.astype(jnp.uint32)))
    return JP(X3, Y3, Z3, inf)


@_kjit
def jp_add_aff(a: JP, bx: FE, by: FE, b_inf) -> JP:
    """Complete mixed addition a + (bx, by) affine
    (cf. gej_add_ge, src/group_impl.h:732)."""
    ZZ = fe_sqr(a.z)
    U1 = fe_weak(a.x)
    U2 = fe_mul(bx, ZZ)
    S1 = fe_weak(a.y)
    S2 = fe_mul(fe_mul(by, ZZ), a.z)
    return _jp_add_core(U1, S1, U2, S2, a.z, a, fe_weak(bx), fe_weak(by),
                        b_inf)


@_kjit
def jp_add(a: JP, b: JP) -> JP:
    """Complete general addition (jacobian + jacobian)."""
    Z11 = fe_sqr(a.z)
    Z22 = fe_sqr(b.z)
    U1 = fe_mul(a.x, Z22)
    U2 = fe_mul(b.x, Z11)
    S1 = fe_mul(fe_mul(a.y, Z22), b.z)
    S2 = fe_mul(fe_mul(b.y, Z11), a.z)
    Zc = fe_mul(a.z, b.z)
    out = _jp_add_core(U1, S1, U2, S2, Zc, a, fe_weak(b.x), fe_weak(b.y),
                       b.inf)
    Z3 = fe_select(_b(a.inf), fe_weak(b.z), out.z)
    return JP(out.x, out.y, Z3, out.inf)


def jp_select(mask, a: JP, b: JP) -> JP:
    return JP(fe_select(mask, a.x, b.x), fe_select(mask, a.y, b.y),
              fe_select(mask, a.z, b.z), jnp.where(mask, a.inf, b.inf))


# ---------------------------------------------------------------------------
# Standalone batched complete add (the MSM workhorse: segmented-scan
# bucket accumulation is a tree of these, ops/msm.py msm_pippenger).
# ---------------------------------------------------------------------------


def _gej_add_kernel(ax, ay, az, ainf, bx, by, bz, binf,
                    ox, oy, oz, oinf):
    a = JP(FE([ax[i, :] for i in range(LIMBS)], MASK16),
           FE([ay[i, :] for i in range(LIMBS)], MASK16),
           FE([az[i, :] for i in range(LIMBS)], MASK16), ainf[0, :])
    b = JP(FE([bx[i, :] for i in range(LIMBS)], MASK16),
           FE([by[i, :] for i in range(LIMBS)], MASK16),
           FE([bz[i, :] for i in range(LIMBS)], MASK16), binf[0, :])
    out = jp_add(a, b)
    for i in range(LIMBS):
        ox[i, :] = fe_weak(out.x).l[i]
        oy[i, :] = fe_weak(out.y).l[i]
        oz[i, :] = fe_weak(out.z).l[i]
    oinf[0, :] = out.inf


@lru_cache(maxsize=8)
def _gej_add_call(tb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(ax, ay, az, ainf, bx, by, bz, binf):
        B = ax.shape[-1]
        spec = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        spec1 = pl.BlockSpec((1, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _gej_add_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((1, B), jnp.uint32),
            ),
            grid=(B // tb,),
            in_specs=[spec, spec, spec, spec1, spec, spec, spec, spec1],
            out_specs=(spec, spec, spec, spec1),
        )(ax, ay, az, ainf, bx, by, bz, binf)

    return run


def gej_add_tpu(a, b, tb: int | None = None):
    """Batched complete jacobian add on limb-major tuples
    (x, y, z [16, B] weak uint32, inf [B] uint32 0/1).  Pads B up to a
    block multiple internally."""
    from .pallas_field import auto_tb
    ax, ay, az, ainf = a
    bx, by, bz, binf = b
    B = ax.shape[-1]
    if tb is None:
        tb = auto_tb(B)
    pad = (-B) % tb
    if pad:
        def p2(v):
            return jnp.pad(v, [(0, 0), (0, pad)])

        def p1(v):
            return jnp.pad(v, [(0, pad)], constant_values=1)

        ax, ay, az, bx, by, bz = map(p2, (ax, ay, az, bx, by, bz))
        ainf, binf = p1(ainf), p1(binf)
    ox, oy, oz, oinf = _gej_add_call(tb)(
        ax, ay, az, ainf[None, :], bx, by, bz, binf[None, :])
    if pad:
        return ox[:, :B], oy[:, :B], oz[:, :B], oinf[0, :B]
    return ox, oy, oz, oinf[0]


def _load_fe(ref, row0):
    return FE([ref[row0 + i, :] for i in range(LIMBS)], MASK16)


def _fe_flat(a: FE):
    return tuple(a.l)


def _fe_unflat(t):
    return FE(list(t), MASK16)


def _jp_flat(p: JP):
    return (_fe_flat(fe_weak(p.x)), _fe_flat(fe_weak(p.y)),
            _fe_flat(fe_weak(p.z)), p.inf)


def _jp_unflat(t):
    return JP(_fe_unflat(t[0]), _fe_unflat(t[1]), _fe_unflat(t[2]), t[3])


# (The pre-GLV 4-bit dual-scalar kernel that lived here was removed in
# round 3: ecmult_glv_tpu superseded it on every call path.)


# ---------------------------------------------------------------------------
# GLV ecmult kernel: R = u1*G + u2*P with the endomorphism split.
#
# 32 windows x (4 doublings + 4 mixed adds): two 128-bit halves of u1
# against constant tables of G and 2^128*G, and |a1|*P' + |a2|*lambda*P'
# from the prep kernel's lambda split (pallas_scalar.ecdsa_prep_tpu).
# The per-lane P table is built once, then brought to a single global Z
# ("effective affine", cf. secp256k1_ge_table_set_globalz,
# src/group_impl.h:289 and the Strauss setup src/ecmult_impl.h:73-115)
# so every window add is a *mixed* add; the constant G tables are scaled
# into the same frame (the inverse direction of gej_add_zinv_var,
# src/group_impl.h:661 — scaling 30 table points once beats un-scaling
# every add).  The ECDSA x(R) === r check (incl. the r+n overflow case,
# src/ecdsa_impl.h:246-268) runs in the kernel epilogue so no 256-bit
# math ever leaves Mosaic.
# ---------------------------------------------------------------------------

_BETA = 0x7AE96A2B657C07106E64479EAC3434E99CF0497512F58995C1396C28719501EE
_N_ORDER = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
_P = 2 ** 256 - 2 ** 32 - 977


def _cl(x: int, k: int = 16):
    return tuple((x >> (16 * i)) & 0xFFFF for i in range(k))


def fe_mul_const(a: FE, c_limbs) -> FE:
    """FE times python-int limb constants (weak output)."""
    a = fe_weak(a)
    return FE(_mul_limbs(a.l, list(c_limbs)), MASK16)


def _fe_const(template, c_limbs) -> FE:
    z = jnp.zeros_like(template)
    return FE([z + int(c) for c in c_limbs], MASK16)


@lru_cache(maxsize=1)
def _g_tables_int():
    """(d*G, d*2^128*G) for d in 1..16 as limb-int tuples."""
    from ..utils import hostcurve
    g, g128 = [], []
    for d in range(1, 17):
        x, y = hostcurve.mul(d)
        g.append((_cl(x), _cl(y)))
        x, y = hostcurve.mul((d << 128) % hostcurve.N)
        g128.append((_cl(x), _cl(y)))
    return g, g128


# (A round-3 experiment replaced the u1*G stream with an MXU one-hot
# comb — [64,256]x[256,TB] bf16 matmuls gathering w8 windows from VMEM
# tables.  Measured on v5e: ~23us per window-block, ~6ms/batch at
# B=16k, dominated by one-hot materialization + operand relayout, vs
# ~1us for a 16-entry select-of-immediates chain.  Reverted; see
# docs/PERF.md "Tried and rejected".)


@_kjit
def _add_aff_ratio(ax: FE, ay: FE, az: FE, bx: FE, by: FE):
    """Complete mixed add for the table build (inputs never infinity);
    returns (X3, Y3, Z3, m) where Z3 = az*m — m is the z-ratio the
    globalz pass needs (cf. gej_add_ge_var's zr, src/group_impl.h:598)."""
    ZZ = fe_sqr(az)
    U1 = fe_weak(ax)
    U2 = fe_mul(bx, ZZ)
    S1 = fe_weak(ay)
    S2 = fe_mul(fe_mul(by, ZZ), az)
    T = fe_add(U1, U2)
    M = fe_add(S1, S2)
    rr = fe_add(fe_sqr(T), fe_mul(U1, fe_neg(U2)))
    deg = fe_is_zero(M)
    rr_f = fe_select(deg, fe_mul_int(S1, 2), fe_weak(rr))
    m_f = fe_select(deg, fe_weak(fe_sub(U1, U2)), fe_weak(M))
    n = fe_sqr(m_f)
    q = fe_mul(fe_neg(T), n)
    n_f = fe_select(deg, fe_weak(M), fe_sqr(n))
    t2 = fe_sqr(rr_f)
    Z3 = fe_mul(az, m_f)
    X3 = fe_add(t2, q)
    t4 = fe_mul(fe_add(fe_mul_int(X3, 2), q), rr_f)
    Y3 = fe_half(fe_neg(fe_add(t4, n_f)))
    return fe_weak(X3), Y3, Z3, m_f


def _gather16(xs, ys, d):
    """Select table entry d (1..16); d==0 is masked by the caller."""
    gx, gy = xs[1], ys[1]
    for e in range(2, 17):
        m = d == e
        gx = fe_select(m, xs[e], gx)
        gy = fe_select(m, ys[e], gy)
    return gx, gy


def _ecmult_glv_kernel(d_ref, px_ref, py_ref, misc_ref, rx_ref,
                       gx_ref, gy_ref, gz_ref,
                       ox_ref, oy_ref, oz_ref, oinf_ref, ok_ref,
                       *, check: bool, pairs: int):
    """R = u1*G + u2*P: GLV Strauss, 26 windows x (5 doublings + 2
    mixed adds): a1*P' and a2*lambda*P' from the per-lane table.  The
    fixed-base u1*G arrives precomputed from pallas_gen's w7 comb
    kernel (37 constant adds, zero doublings) as jacobian refs
    gx/gy/gz (z == 0 marks infinity) and joins via one complete
    jacobian add before the epilogue.

    The per-lane P table is built in jacobian with z-ratio tracking,
    brought to a global Z (ge_table_set_globalz, src/group_impl.h:289),
    then to TRUE affine with one constant-time divsteps inverse of the
    global Z, so every window add is a mixed add.

    ``pairs`` is unroll-and-jam: the block's lanes are split into
    ``pairs`` independent column groups whose whole pipelines are
    interleaved in one instruction stream — same op count, ``pairs``x
    the independent dependency chains for the VPU scheduler to hide
    op latency with (the single-chain window loop measures well below
    the interleaved-chain mulmod rate; docs/PERF.md).

    A round-3 alternative measured slower and was reverted: an MXU
    one-hot comb for u1*G (one-hot build + operand relayout ~23us per
    window-block ~= 6ms/batch at B=16k vs ~1us for the 16-entry
    select-of-immediates chain)."""
    NW = 26  # signed 5-bit windows (pallas_scalar.recode_w5)
    tb_full = px_ref.shape[-1]
    assert tb_full % pairs == 0
    hw = tb_full // pairs
    gtab, _ = _g_tables_int()
    beta = _cl(_BETA)

    def setup(cols):
        """Per-column-group state: sign-folded P, affine P/lambda-P
        tables, and the per-window add closure."""
        px_in = FE([px_ref[i, cols] for i in range(LIMBS)], MASK16)
        py_in = FE([py_ref[i, cols] for i in range(LIMBS)], MASK16)
        p_inf = misc_ref[0, cols]           # uint32 0/1
        neg1 = misc_ref[1, cols]
        neg2 = misc_ref[2, cols]
        pinf_b = _b(p_inf)
        tb = px_in.l[0]

        # For infinity lanes substitute G so the table build stays
        # on-curve; the P-stream adds are masked off below.
        gx0, gy0 = gtab[0]
        px = fe_select(pinf_b, _fe_const(tb, gx0), px_in)
        py = fe_select(pinf_b, _fe_const(tb, gy0), py_in)
        # Fold the a1 sign into the table's y; the a2 stream re-flips
        # when the two half-scalar signs differ.
        pyc = fe_weak(fe_select(_b(neg1), fe_neg(fe_weak(py)),
                                fe_weak(py)))
        flip = _b(neg1 ^ neg2)

        # --- P table 1..16, jacobian build with z-ratio tracking ----
        one = fe_one(tb)
        NT = 17
        X = [None] * NT
        Y = [None] * NT
        R = [None] * NT                     # z-ratios: z_d = z_{d-1}*r_d
        X[1], Y[1] = fe_weak(px), pyc
        d2 = jp_double(JP(px, pyc, one, jnp.zeros_like(tb)))
        X[2], Y[2], Z2 = d2.x, d2.y, d2.z
        R[2] = Z2
        pz = Z2
        for d in range(3, NT):
            X[d], Y[d], pz, R[d] = _add_aff_ratio(X[d - 1], Y[d - 1],
                                                  pz, px, pyc)
        Zg = pz                             # global Z = z_16

        # --- globalz pass + divsteps inverse -> TRUE affine ----------
        from .pallas_divsteps import inv_limbs16
        from .pallas_field import _canon_p
        zi = FE(inv_limbs16(_canon_p(fe_weak(Zg).l), _P), MASK16)
        zi2 = fe_sqr(zi)
        zi3 = fe_mul(zi2, zi)
        axs = [None] * NT
        ays = [None] * NT
        axs[NT - 1] = fe_mul(X[NT - 1], zi2)
        ays[NT - 1] = fe_mul(Y[NT - 1], zi3)
        acc = None
        for d in range(NT - 2, 0, -1):
            acc = R[d + 1] if acc is None else fe_mul(acc, R[d + 1])
            a2c = fe_sqr(acc)
            axs[d] = fe_mul(fe_mul(X[d], a2c), zi2)
            ays[d] = fe_mul(fe_mul(Y[d], fe_mul(a2c, acc)), zi3)

        # lambda*P' table: scale x by beta once (ge_mul_lambda,
        # src/group_impl.h:925) — 16 muls replace one per window.
        bxs = [None] + [fe_mul_const(axs[d], beta)
                        for d in range(1, NT)]

        def win(w, acc):
            for _ in range(5):
                acc = jp_double(acc)
            ea1 = d_ref[w, cols]
            ea2 = d_ref[NW + w, cols]
            # a1 * P'  (signed digit: negate gathered y on sign)
            mag, sgn = ea1 & 0xFF, ea1 >> 8
            gx, gy = _gather16(axs, ays, mag)
            gy = fe_select(sgn != 0, fe_weak(fe_neg(gy)), gy)
            acc = jp_add_aff(acc, gx, gy,
                             ((mag == 0) | pinf_b).astype(jnp.uint32))
            # a2 * lambda*P': beta-scaled table; sign xor the
            # neg2 != neg1 re-flip
            mag, sgn = ea2 & 0xFF, ea2 >> 8
            gx, gy = _gather16(bxs, ays, mag)
            gy = fe_select(flip ^ (sgn != 0), fe_weak(fe_neg(gy)), gy)
            acc = jp_add_aff(acc, gx, gy,
                             ((mag == 0) | pinf_b).astype(jnp.uint32))
            return acc

        return tb, win

    groups = [setup(slice(h * hw, (h + 1) * hw)) for h in range(pairs)]

    def window(w, carry):
        return tuple(_jp_flat(win(w, _jp_unflat(c)))
                     for (tb, win), c in zip(groups, carry))

    out = jax.lax.fori_loop(
        0, NW, window,
        tuple(_jp_flat(jp_inf(tb)) for tb, _ in groups))

    for h, ((tb, _), c) in enumerate(zip(groups, out)):
        cols = slice(h * hw, (h + 1) * hw)
        accu2 = _jp_unflat(c)
        # u1*G from the comb kernel: one complete jacobian add
        gxf = FE([gx_ref[i, cols] for i in range(LIMBS)], MASK16)
        gyf = FE([gy_ref[i, cols] for i in range(LIMBS)], MASK16)
        gzf = FE([gz_ref[i, cols] for i in range(LIMBS)], MASK16)
        g_inf = fe_is_zero(gzf).astype(jnp.uint32)
        accp = jp_add(accu2, JP(gxf, gyf, gzf, g_inf))
        oz = fe_weak(accp.z)
        for i in range(LIMBS):
            ox_ref[i, cols] = fe_weak(accp.x).l[i]
            oy_ref[i, cols] = fe_weak(accp.y).l[i]
            oz_ref[i, cols] = oz.l[i]
        oinf_ref[0, cols] = accp.inf

        if check:
            # x(R) === r (mod n): inversion-free check with the r+n
            # overflow candidate gated on r < p - n
            # (src/ecdsa_impl.h:246-268).
            xr = FE([rx_ref[i, cols] for i in range(LIMBS)], MASK16)
            zz2 = fe_sqr(oz)
            eq1 = fe_is_zero(fe_sub(fe_mul(xr, zz2), accp.x))
            # r >= p - n  <=>  r + (2^256 - (p-n)) carries out
            comp = _cl((1 << 256) - (_P - _N_ORDER))
            c_ = None
            for i in range(LIMBS):
                t = xr.l[i] + comp[i]
                t = t if c_ is None else t + c_
                c_ = t >> 16
            lt = c_ == 0
            xr2 = fe_weak(fe_add(xr, _fe_const(tb, _cl(_N_ORDER))))
            eq2 = fe_is_zero(fe_sub(fe_mul(xr2, zz2), accp.x))
            okv = (eq1 | (eq2 & lt)) & (accp.inf == 0)
            ok_ref[0, cols] = okv.astype(jnp.uint32)
        else:
            ok_ref[0, cols] = jnp.zeros_like(tb)


@lru_cache(maxsize=8)
def _ecmult_glv_call(tb: int, check: bool, pairs: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from functools import partial

    kern = partial(_ecmult_glv_kernel, check=check, pairs=pairs)

    @jax.jit
    def run(digs, px, py, misc, rx, gx, gy, gz):
        B = px.shape[-1]
        spec16 = pl.BlockSpec((LIMBS, tb), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        specd = pl.BlockSpec((52, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        spec4 = pl.BlockSpec((4, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        spec1 = pl.BlockSpec((1, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((LIMBS, B), jnp.uint32),
                jax.ShapeDtypeStruct((1, B), jnp.uint32),
                jax.ShapeDtypeStruct((1, B), jnp.uint32),
            ),
            grid=(B // tb,),
            in_specs=[specd, spec16, spec16, spec4, spec16,
                      spec16, spec16, spec16],
            out_specs=(spec16, spec16, spec16, spec1, spec1),
            # the per-lane P/lambda-P tables push past the 16M default
            # scoped-vmem at tb >= 2048; v5e has headroom above it.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(digs, px, py, misc, rx, gx, gy, gz)

    return run


def ecmult_glv_tpu(digs, flags, px, py, pinf, gjac,
                   rx=None, tb: int | None = None):
    """GLV double-scalar mult R = u1*G + u2*P from prep digit streams.

    digs: [52, B] signed-w5 MSB-first rows (mag | sign<<8,
    pallas_scalar.recode_w5): 0-25 a1, 26-51 a2; flags: [2, B]
    (neg1, neg2) with u2 = (-1)^neg1*a1 + lambda*(-1)^neg2*a2 (mod n);
    px/py: [16, B]; pinf: [B] bool; gjac: (gx, gy, gz) [16, B] jacobian
    u1*G from pallas_gen.fixedbase_digits_tpu (z == 0 -> infinity);
    rx: [16, B] canonical r limbs to enable the fused ECDSA x(R)===r
    check.

    Returns (x, y, z [16, B], inf [B] bool, ok [B] bool)."""
    import os
    from .pallas_field import auto_tb
    B = px.shape[-1]
    if tb is None:
        tb = auto_tb(B)
    assert digs.shape[0] == 52, digs.shape
    # unroll-and-jam factor: independent column groups per block (see
    # _ecmult_glv_kernel).  Default 2: two 2048-lane pipelines per
    # 4096-lane block is the round-3 sweep optimum on v5e (1.21M
    # verifies/s vs 1.07M for one 2048-lane group — the jam's extra
    # ILP wins exactly when the per-group width stays at 2048; wider
    # groups or more of them spill the P-table working set, see
    # docs/PERF.md).  SECP_TPU_PAIRS overrides for sweeps.
    pairs = max(int(os.environ.get("SECP_TPU_PAIRS", "2")), 1)
    while pairs > 1 and (tb % pairs or (tb // pairs) % 256):
        pairs //= 2
    misc = jnp.concatenate(
        [pinf.astype(jnp.uint32)[None, :], flags,
         jnp.zeros((1, B), jnp.uint32)], axis=0)
    check = rx is not None
    if rx is None:
        rx = jnp.zeros((LIMBS, B), jnp.uint32)
    gx, gy, gz = gjac
    ox, oy, oz, oinf, ok = _ecmult_glv_call(tb, check, pairs)(
        digs, px, py, misc, rx, gx, gy, gz)
    return ox, oy, oz, oinf[0] != 0, ok[0] != 0
