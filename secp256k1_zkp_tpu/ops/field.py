"""GF(p) for secp256k1, p = 2^256 - 2^32 - 977, batched for TPU.

TPU-native counterpart of the reference field layer (``src/field.h``,
``src/field_5x52_impl.h``); representation and reduction live in
:mod:`secp256k1_zkp_tpu.ops.limb`.  Adds field-specific helpers:
sqrt (x^((p+1)/4), cf. src/field_impl.h:37-147), is_square (Euler
criterion; the reference uses jacobi via safegcd, src/modinv64_impl.h:721),
and inverse (Fermat; reference: src/field_impl.h:393 via safegcd).
"""

from __future__ import annotations

import jax.numpy as jnp

from .limb import LB, LIMBS, MASK16, Mod, lb_from_int

P = 2 ** 256 - 2 ** 32 - 977

FP = Mod(P, name="fp")

# Curve constants (y^2 = x^3 + 7; generator per SEC2).
B_COEFF = 7
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8

# Fused exponents.
_SQRT_EXP = (P + 1) // 4
_IS_SQUARE_EXP = (P - 1) // 2


def fe(x: int) -> LB:
    return lb_from_int(x % P)


def fe_zero(batch_shape=()):
    return FP.zero(batch_shape)


def add(a, b):
    return FP.add(a, b)


def sub(a, b):
    return FP.sub(a, b)


def neg(a):
    return FP.neg(a)


def mul(a, b):
    return FP.mul(a, b)


def sqr(a):
    return FP.sqr(a)


def mul_int(a, k):
    return FP.mul_int(a, k)


def half(a):
    return FP.half(a)


def inv(a):
    return FP.inv(a)


def normalize(a):
    return FP.normalize(a)


def norm_weak(a):
    return FP.norm_weak(a)


def is_zero(a):
    return FP.is_zero(a)


def eq(a, b):
    return FP.eq(a, b)


def is_odd(a):
    return FP.is_odd(a)


def select(mask, a, b):
    return Mod.select(mask, a, b)


def sqrt(a) -> tuple[LB, jnp.ndarray]:
    """(r, ok): r = sqrt(a) when a is a QR (r chosen with r = a^((p+1)/4)),
    ok mask per lane.  Mirrors secp256k1_fe_sqrt (src/field.h:289-305)."""
    r = FP.pow_const(a, _SQRT_EXP)
    ok = eq(sqr(r), a)
    return r, ok


def is_square(a) -> jnp.ndarray:
    """Euler criterion, counting 0 as square (matches fe_is_square_var
    semantics for the ellswift use; src/field.h:307-312)."""
    t = FP.pow_const(a, _IS_SQUARE_EXP)
    one = FP.one(())
    return jnp.logical_or(FP.is_zero(a), FP.eq(t, one))


def from_bytes_be(b):
    """[..., 32] uint8 -> (fe, overflow_mask)."""
    return FP.from_bytes_be(b)


def to_bytes_be(a):
    return Mod.to_bytes_be(a, FP)
