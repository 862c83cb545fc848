"""Tiny-order scalar engine for exhaustive whole-group testing.

TPU-native counterpart of the reference's ``scalar_low``
(src/scalar_low.h, src/scalar_low_impl.h): a single-word scalar field
mod a small test order (7/13/199), letting the REAL protocol code
(modules/ecdsa.py etc., parameterized by ``sc=``) be model-checked over
every (point, scalar) combination — the strategy of
src/tests_exhaustive.c (SURVEY.md §4.3).

Interface duck-types the :mod:`secp256k1_zkp_tpu.ops.scalar` facade:
values are canonical 16x16-bit-limb LBs with only limb 0 populated, so
they flow unchanged through the real ecmult engines and group layer.
Arithmetic runs on limb 0 as plain uint32 mod order (products stay
< 2^32 for order < 2^16).  Inversion is a gathered host-precomputed
table — the vector analog of scalar_low's loop-free tiny inverse.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .limb import LB, LIMBS, MASK16, Mod, lb_from_int

_u32 = jnp.uint32


class SmallScalar:
    """Scalar engine mod a small order (< 2^16)."""

    def __init__(self, order: int):
        assert 2 < order < (1 << 16)
        self.N = order
        self.N_HALF = (order - 1) // 2
        self._inv_np = np.array(
            [0] + [pow(i, -1, order) for i in range(1, order)], np.uint32)
        # powers of 256 mod order for byte folding (MSB-first)
        self._pow256 = np.array(
            [pow(256, 31 - i, order) for i in range(32)], np.uint32)

    # -- construction -------------------------------------------------------
    def sc(self, x: int) -> LB:
        return lb_from_int(x % self.N)

    def zero(self, batch_shape=()):
        return LB(jnp.zeros((*batch_shape, LIMBS), _u32), 0)

    def one(self, batch_shape=()):
        v = jnp.zeros((*batch_shape, LIMBS), _u32).at[..., 0].set(1)
        return LB(v, MASK16)

    def _v0(self, a: LB):
        assert a.bound <= MASK16
        return a.v[..., 0]

    def _wrap(self, v0) -> LB:
        z = jnp.zeros((*v0.shape, LIMBS), _u32).at[..., 0].set(
            v0.astype(_u32))
        return LB(z, MASK16)

    # -- arithmetic ----------------------------------------------------------
    def add(self, a, b):
        return self._wrap((self._v0(a) + self._v0(b)) % self.N)

    def sub(self, a, b):
        return self._wrap((self._v0(a) + self.N - self._v0(b)) % self.N)

    def neg(self, a):
        return self._wrap((self.N - self._v0(a)) % self.N)

    def mul(self, a, b):
        return self._wrap((self._v0(a) * self._v0(b)) % self.N)

    def sqr(self, a):
        return self.mul(a, a)

    def inv(self, a):
        """Table-gathered inverse; inv(0) = 0 (reference convention)."""
        return self._wrap(jnp.asarray(self._inv_np)[self._v0(a)])

    def half(self, a):
        inv2 = pow(2, -1, self.N)
        return self._wrap((self._v0(a) * inv2) % self.N)

    # -- predicates / normal forms -------------------------------------------
    def normalize(self, a):
        return a

    def norm_weak(self, a):
        return a

    def norm_if_needed(self, a):
        return a

    def is_zero(self, a):
        return self._v0(a) == 0

    def eq(self, a, b):
        return self._v0(a) == self._v0(b)

    def is_high(self, a):
        """a > (order-1)/2 (scalar_low_impl.h's is_high)."""
        return self._v0(a) > self.N_HALF

    def is_odd(self, a):
        return (self._v0(a) & 1) == 1

    @staticmethod
    def select(mask, a, b):
        return Mod.select(mask, a, b)

    def cond_negate(self, a, mask):
        return self.select(mask, self.neg(a), a)

    # -- bytes ----------------------------------------------------------------
    def from_bytes_be(self, b):
        """[..., 32] uint8 -> (scalar mod order, overflow = value >= order)
        — the scalar_low set_b32 semantics (scalar_low_impl.h:23-29)."""
        b = jnp.asarray(b, dtype=_u32)
        folded = jnp.sum(b * jnp.asarray(self._pow256), axis=-1) % self.N
        hi_any = jnp.any(b[..., :30] != 0, axis=-1)
        low = (b[..., 30] << 8) | b[..., 31]
        overflow = hi_any | (low >= self.N)
        return self._wrap(folded), overflow

    def to_bytes_be(self, a):
        x = a.v  # canonical already
        le = x[..., ::-1]
        hi = (le >> 8).astype(jnp.uint8)
        lo = (le & 0xFF).astype(jnp.uint8)
        return jnp.stack([hi, lo], axis=-1).reshape(*x.shape[:-1], 32)
