"""secp256k1 group arithmetic, batched for TPU.

TPU-native counterpart of the reference group layer (``src/group.h``,
``src/group_impl.h``).  Points are structure-of-arrays pytrees: each
coordinate is a batched limb tensor and infinity is an explicit lane mask
(the reference also carries an ``infinity`` flag, ``src/group.h:16-33``).

All operations are **complete and branch-free**: degenerate cases
(doubling, P + (-P), infinity operands) are handled with lane masks and
selects, the TPU re-expression of the constant-time complete addition
``secp256k1_gej_add_ge`` (src/group_impl.h:732).  The unified lambda
trick used there — lambda = (x1^2 + x1*x2 + x2^2)/(y1 + y2), falling back
to the chord (y1 - y2)/(x1 - x2) when y1 = -y2 — is re-derived here for a
mask/select dataflow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import field as F
from .limb import LB, LIMBS, MASK16


@jax.tree_util.register_pytree_node_class
class GE:
    """Affine point (structure-of-arrays). ``inf``: [...] bool mask."""

    __slots__ = ("x", "y", "inf")

    def __init__(self, x: LB, y: LB, inf):
        self.x, self.y, self.inf = x, y, inf

    def tree_flatten(self):
        return (self.x, self.y, self.inf), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)

    @property
    def batch_shape(self):
        return self.x.batch_shape

    def __repr__(self):
        return f"GE(batch={self.batch_shape})"


@jax.tree_util.register_pytree_node_class
class GEJ:
    """Jacobian point: (X/Z^2, Y/Z^3). ``inf``: [...] bool mask."""

    __slots__ = ("x", "y", "z", "inf")

    def __init__(self, x: LB, y: LB, z: LB, inf):
        self.x, self.y, self.z, self.inf = x, y, z, inf

    def tree_flatten(self):
        return (self.x, self.y, self.z, self.inf), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)

    @property
    def batch_shape(self):
        return self.x.batch_shape

    def __repr__(self):
        return f"GEJ(batch={self.batch_shape})"


# -- constructors -----------------------------------------------------------


def ge_infinity(batch_shape=()) -> GE:
    # bound MASK16 (not 0) so scan carries have a stable static pytree.
    z = LB(F.fe_zero(batch_shape).v, MASK16)
    return GE(z, z, jnp.ones(batch_shape, bool))


def gej_infinity(batch_shape=()) -> GEJ:
    z = LB(F.fe_zero(batch_shape).v, MASK16)
    return GEJ(z, z, z, jnp.ones(batch_shape, bool))


def ge_from_ints(x: int, y: int, batch_shape=()) -> GE:
    xx, yy = F.fe(x), F.fe(y)
    if batch_shape:
        xx = LB(jnp.broadcast_to(xx.v, (*batch_shape, LIMBS)), xx.bound)
        yy = LB(jnp.broadcast_to(yy.v, (*batch_shape, LIMBS)), yy.bound)
    return GE(xx, yy, jnp.zeros(batch_shape, bool))


def generator(batch_shape=()) -> GE:
    return ge_from_ints(F.GX, F.GY, batch_shape)


def gej_from_ge(a: GE) -> GEJ:
    one = F.FP.one(a.batch_shape)
    return GEJ(a.x, a.y, one, a.inf)


# -- predicates --------------------------------------------------------------


def ge_is_on_curve(a: GE):
    """y^2 == x^3 + 7 (cf. ge_is_valid_var, src/group_impl.h:450)."""
    y2 = F.sqr(a.y)
    x3 = F.mul(F.sqr(a.x), a.x)
    rhs = F.add(x3, F.fe(F.B_COEFF))
    return jnp.logical_or(a.inf, F.eq(y2, rhs))


def gej_eq(a: GEJ, b: GEJ):
    """Projective equality (complete, both-infinity aware)."""
    az2 = F.sqr(a.z)
    bz2 = F.sqr(b.z)
    x_eq = F.eq(F.mul(a.x, bz2), F.mul(b.x, az2))
    y_eq = F.eq(F.mul(F.mul(a.y, bz2), b.z), F.mul(F.mul(b.y, az2), a.z))
    both_inf = jnp.logical_and(a.inf, b.inf)
    neither = jnp.logical_and(~a.inf, ~b.inf)
    return jnp.logical_or(both_inf,
                          jnp.logical_and(neither,
                                          jnp.logical_and(x_eq, y_eq)))


def gej_eq_x(a: GEJ, x: LB):
    """affine_x(a) == x without inversion: x * Z^2 == X
    (cf. gej_eq_x_var, src/group_impl.h:445, used by ECDSA verify)."""
    return jnp.logical_and(~a.inf, F.eq(F.mul(x, F.sqr(a.z)), a.x))


# -- negation ----------------------------------------------------------------


def ge_neg(a: GE) -> GE:
    return GE(a.x, F.norm_weak(F.neg(F.FP.norm_if_needed(a.y))), a.inf)


def gej_neg(a: GEJ) -> GEJ:
    return GEJ(a.x, F.norm_weak(F.neg(F.FP.norm_if_needed(a.y))), a.z, a.inf)


# -- doubling ----------------------------------------------------------------


def gej_double(a: GEJ) -> GEJ:
    """Complete doubling for a=0 curves (cf. gej_double,
    src/group_impl.h:468; infinity propagates via the lane mask)."""
    A = F.sqr(a.x)
    B = F.sqr(a.y)
    C = F.sqr(B)
    t = F.sqr(F.add(a.x, B))
    D = F.norm_weak(F.mul_int(F.sub(F.sub(t, A), C), 2))
    E = F.mul_int(A, 3)
    Fq = F.sqr(E)
    X3 = F.norm_weak(F.sub(Fq, F.mul_int(D, 2)))
    Y3 = F.norm_weak(F.sub(F.mul(E, F.sub(D, X3)), F.mul_int(C, 8)))
    Z3 = F.mul(F.mul_int(a.y, 2), a.z)
    return GEJ(X3, Y3, Z3, a.inf)


def gej_double_n(a: GEJ, n: int) -> GEJ:
    """n successive doublings via lax.fori_loop — ONE doubling body in
    the trace instead of n inlined copies.  XLA:CPU pays a fixed
    MLIR->LLVM pipeline cost per fused kernel (~90 kernels per group
    op), so window loops that double 4-16 times inline dominate every
    compile; this keeps traces (and compiles) small at the cost of one
    extra normalize per doubling."""
    if n == 0:
        return a
    if n == 1:
        return gej_double(a)

    def body(_, c):
        d = gej_double(GEJ(LB(c[0], MASK16), LB(c[1], MASK16),
                           LB(c[2], MASK16), c[3]))
        return (F.FP.norm_if_needed(d.x).v, F.FP.norm_if_needed(d.y).v,
                F.FP.norm_if_needed(d.z).v, d.inf)

    a0 = (F.FP.norm_if_needed(a.x).v, F.FP.norm_if_needed(a.y).v,
          F.FP.norm_if_needed(a.z).v, a.inf)
    out = jax.lax.fori_loop(0, n, body, a0)
    return GEJ(LB(out[0], MASK16), LB(out[1], MASK16),
               LB(out[2], MASK16), out[3])


# -- complete addition -------------------------------------------------------


def _add_core(U1, S1, U2, S2, Zmul, a_inf, b_x, b_y, b_inf, a: GEJ):
    """Shared completion for mixed/general addition.

    Inputs are the cross-scaled coordinates (u_i = x_i * Zc^2,
    s_i = y_i * Zc^3 for the common denominator Zc); ``Zmul`` is Zc.
    Returns the complete sum with all degenerate lanes resolved.

    7M+5S (incl. caller) Brier-Joye unified core — the round-3 kernel
    shape (pallas_group._jp_add_core, mirroring gej_add_ge,
    src/group_impl.h:731): two muls and two canonicalizations cheaper
    per add than the lambda-cubing layout it replaced, which matters
    both on-device and in XLA:CPU compile time (this body is traced
    inside every ecmult scan).
    """
    T = F.norm_weak(F.add(U1, U2))
    M = F.norm_weak(F.add(S1, S2))
    rr = F.add(F.sqr(T), F.mul(U1, F.neg(U2)))   # T^2 - U1*U2
    deg = F.FP.is_zero_weak(M)
    # If lambda = rr/M degenerates (M == 0 but x1 != x2), the equal-
    # where-both-defined slope (S1-S2)/(U1-U2) = 2*S1/(U1-U2) is used.
    rr_f = F.select(deg, F.norm_weak(F.mul_int(S1, 2)), F.norm_weak(rr))
    m_f = F.select(deg, F.norm_weak(F.sub(U1, U2)), M)
    n = F.sqr(m_f)                                # Malt^2
    q = F.mul(F.norm_weak(F.neg(T)), n)           # Q = -T*Malt^2
    # M^3*Malt is Malt^4 when not degenerate, else M (== 0 mod p).
    n_f = F.select(deg, M, F.sqr(n))
    t2 = F.sqr(rr_f)                              # Ralt^2
    Z3 = F.mul(Zmul, m_f)
    X3 = F.norm_weak(F.add(t2, q))                # X3 = Ralt^2 + Q
    t4 = F.mul(F.norm_weak(F.add(F.mul_int(X3, 2), q)), rr_f)
    # Y3 = -(Ralt*(2*X3+Q) + M^3*Malt)/2
    Y3 = F.half(F.norm_weak(F.neg(F.norm_weak(F.add(t4, n_f)))))
    # inf: Z3 == 0 covers both a == -b (m_f = x1-x2 = 0 in the
    # degenerate branch) and the y1 = -y2 completeness argument
    # (group_impl.h:848-866); Zmul = 0 lanes are overridden below.
    inf3 = F.FP.is_zero_weak(Z3)

    # a infinite -> b (as jacobian); b infinite -> a; both -> infinity.
    bx, by = F.FP.norm_if_needed(b_x), F.FP.norm_if_needed(b_y)
    one = F.FP.one(X3.batch_shape)
    X3 = F.select(a_inf, bx, F.select(b_inf, F.FP.norm_if_needed(a.x), X3))
    Y3 = F.select(a_inf, by, F.select(b_inf, F.FP.norm_if_needed(a.y), Y3))
    Z3 = F.select(a_inf, one,
                  F.select(b_inf, F.FP.norm_if_needed(a.z), F.norm_weak(Z3)))
    inf = jnp.where(a_inf, b_inf, jnp.where(b_inf, a_inf, inf3))
    return GEJ(X3, Y3, Z3, inf)


def gej_add_ge(a: GEJ, b: GE) -> GEJ:
    """Complete mixed addition a + b (b affine), branch-free.

    TPU re-expression of secp256k1_gej_add_ge (src/group_impl.h:732)."""
    ZZ = F.sqr(a.z)
    U1 = F.FP.norm_if_needed(a.x)
    U2 = F.mul(b.x, ZZ)
    S1 = F.FP.norm_if_needed(a.y)
    S2 = F.mul(F.mul(b.y, ZZ), a.z)
    return _add_core(U1, S1, U2, S2, a.z, a.inf, b.x, b.y, b.inf, a)


def gej_add(a: GEJ, b: GEJ) -> GEJ:
    """Complete general addition (cf. gej_add_var, src/group_impl.h:534 —
    but constant-shape/complete, as required for batched lanes)."""
    Z11 = F.sqr(a.z)
    Z22 = F.sqr(b.z)
    U1 = F.mul(a.x, Z22)
    U2 = F.mul(b.x, Z11)
    S1 = F.mul(F.mul(a.y, Z22), b.z)
    S2 = F.mul(F.mul(b.y, Z11), a.z)
    Zc = F.mul(a.z, b.z)
    out = _add_core(U1, S1, U2, S2, Zc, a.inf, b.x, b.y, b.inf, a)
    # _add_core's a_inf fallback assumed b affine with z=1; patch z for the
    # general case.
    Z3 = F.select(a.inf, F.FP.norm_if_needed(b.z), out.z)
    return GEJ(out.x, out.y, Z3, out.inf)


def gej_add_zinv(a: GEJ, b: GE, bzinv: LB) -> GEJ:
    """Effective-affine addition: a + B where B's jacobian coords are
    (b.x, b.y, 1/bzinv) — cf. gej_add_zinv_var (src/group_impl.h:661).

    With az = a.z * bzinv the cross-scaled coords share the common
    denominator a.z, so the completion's Z is a.z * m (not az * m).
    When a is infinity the result is B converted to affine using bzinv
    (no inversion needed)."""
    az = F.mul(a.z, bzinv)
    ZZ = F.sqr(az)
    U1 = F.FP.norm_if_needed(a.x)
    U2 = F.mul(b.x, ZZ)
    S1 = F.FP.norm_if_needed(a.y)
    S2 = F.mul(F.mul(b.y, ZZ), az)
    # a-infinity fallback: B in affine form via bzinv.
    bz2 = F.sqr(bzinv)
    bx_aff = F.mul(b.x, bz2)
    by_aff = F.mul(F.mul(b.y, bz2), bzinv)
    return _add_core(U1, S1, U2, S2, a.z, a.inf, bx_aff, by_aff, b.inf, a)


# -- affine conversion -------------------------------------------------------


def ge_from_gej(a: GEJ) -> GE:
    """Single-lane-inverse affine conversion (cf. ge_set_gej,
    src/group_impl.h:120). For many points prefer ge_from_gej_batch."""
    zi = F.inv(a.z)
    zi2 = F.sqr(zi)
    x = F.mul(a.x, zi2)
    y = F.mul(F.mul(a.y, zi2), zi)
    return GE(x, y, a.inf)


def ge_from_gej_batch(a: GEJ, axis: int = 0) -> GE:
    """Affine conversion with ONE inversion per batch via the Montgomery
    product trick (cf. ge_set_all_gej_var, src/group_impl.h:236).

    Uses an inclusive product scan along ``axis`` (log-depth on TPU).
    Infinity lanes get z treated as 1 to keep the scan invertible.
    """
    one = F.FP.one(a.batch_shape)
    z = F.select(a.inf, one, F.FP.norm_if_needed(a.z))

    zv = jnp.moveaxis(z.v, axis if axis < 0 else axis, 0)

    def scan_body(carry, x):
        prod = F.mul(LB(carry, MASK16), LB(x, MASK16))
        return prod.v, prod.v

    _, prefix = jax.lax.scan(scan_body, _one_v(zv[0]), zv)
    # prefix[i] = z_0 * ... * z_i
    tinv = F.inv(LB(prefix[-1], MASK16))

    # Backward: zinv_i = (prod_{j<i} z_j) * inv(prod_{j<=k} z_j for j>i..)
    def back_body(carry, xs):
        pref_prev, zi = xs
        inv_i = F.mul(LB(carry, MASK16), LB(pref_prev, MASK16))
        new_carry = F.mul(LB(carry, MASK16), LB(zi, MASK16))
        return new_carry.v, inv_i.v

    pref_prev = jnp.concatenate([_one_v(zv[0])[None], prefix[:-1]], axis=0)
    _, invs = jax.lax.scan(back_body, tinv.v, (pref_prev, zv), reverse=True)
    zinv = LB(jnp.moveaxis(invs, 0, axis), MASK16)

    zi2 = F.sqr(zinv)
    x = F.mul(a.x, zi2)
    y = F.mul(F.mul(a.y, zi2), zinv)
    return GE(x, y, a.inf)


def _one_v(template):
    v = jnp.zeros_like(template)
    return v.at[..., 0].set(1)


# -- selection / gathers -----------------------------------------------------


def ge_select(mask, a: GE, b: GE) -> GE:
    return GE(F.select(mask, a.x, b.x), F.select(mask, a.y, b.y),
              jnp.where(mask, a.inf, b.inf))


def gej_select(mask, a: GEJ, b: GEJ) -> GEJ:
    return GEJ(F.select(mask, a.x, b.x), F.select(mask, a.y, b.y),
               F.select(mask, a.z, b.z), jnp.where(mask, a.inf, b.inf))


def ge_gather(table_x, table_y, table_inf, idx) -> GE:
    """Per-lane table lookup: table_* are [T, ..., 16] / [T, ...]; idx is
    [...] int32.  The TPU analogue of the reference's full-table cmov scan
    (src/ecmult_gen_impl.h:237-249) — here a hardware gather, since device
    memory access patterns are not host-observable timing channels.
    """
    table_x = jnp.asarray(table_x)
    table_y = jnp.asarray(table_y)
    table_inf = jnp.asarray(table_inf)
    if table_x.ndim == 2:
        # Shared (unbatched) table [T, 16]: plain gather rows by lane index.
        return GE(LB(table_x[idx], MASK16), LB(table_y[idx], MASK16),
                  table_inf[idx])
    xt = jnp.take_along_axis(
        jnp.moveaxis(table_x, 0, -2), idx[..., None, None], axis=-2)
    yt = jnp.take_along_axis(
        jnp.moveaxis(table_y, 0, -2), idx[..., None, None], axis=-2)
    it = jnp.take_along_axis(
        jnp.moveaxis(table_inf, 0, -1), idx[..., None], axis=-1)
    return GE(LB(xt[..., 0, :], MASK16), LB(yt[..., 0, :], MASK16),
              it[..., 0])
