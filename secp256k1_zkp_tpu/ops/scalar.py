"""GF(n) for secp256k1 (the group order), batched for TPU.

TPU-native counterpart of the reference scalar layer (``src/scalar.h``,
``src/scalar_4x64_impl.h``).  Uses the same generic limb engine as the
field, with red = 2^256 - n (a 129-bit constant — the analogue of
SECP256K1_N_C in src/scalar_4x64_impl.h).
"""

from __future__ import annotations

import jax.numpy as jnp

from .limb import LB, Mod, lb_from_int

N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141

FN = Mod(N, name="fn")

N_HALF = (N - 1) // 2  # boundary for "high" scalars (low-S rule)


def sc(x: int) -> LB:
    return lb_from_int(x % N)


def zero(batch_shape=()):
    return FN.zero(batch_shape)


def one(batch_shape=()):
    return FN.one(batch_shape)


def add(a, b):
    return FN.add(a, b)


def sub(a, b):
    return FN.sub(a, b)


def neg(a):
    return FN.neg(a)


def mul(a, b):
    return FN.mul(a, b)


def sqr(a):
    return FN.sqr(a)


def inv(a):
    """Modular inverse via Fermat (reference: safegcd,
    src/scalar_impl.h -> src/modinv64_impl.h). inv(0) = 0."""
    return FN.inv(a)


def normalize(a):
    return FN.normalize(a)


def is_zero(a):
    return FN.is_zero(a)


def eq(a, b):
    return FN.eq(a, b)


def select(mask, a, b):
    return Mod.select(mask, a, b)


def is_high(a) -> jnp.ndarray:
    """True where a > (n-1)/2 (cf. scalar_is_high, src/scalar.h:83-85).

    Computed as: a > h  <=>  a + (2^256 - 1 - h) >= 2^256."""
    from .limb import _ks_carry, LIMBS, MASK16
    import numpy as np
    x = FN.normalize(a)
    c = (1 << 256) - 1 - N_HALF
    carr = np.array([(c >> (16 * i)) & MASK16 for i in range(LIMBS)],
                    dtype=np.uint32)
    _, carry = _ks_carry(x.v + jnp.asarray(carr))
    return carry > 0


def cond_negate(a, mask):
    """Negate where mask (cf. scalar_cond_negate, src/scalar.h:87-89)."""
    return select(mask, FN.norm_weak(neg(FN.norm_if_needed(a))), FN.norm_if_needed(a))


def get_bits(a, offset, count):
    return FN.get_bits(a, offset, count)


def from_bytes_be(b):
    """[..., 32] uint8 -> (scalar reduced mod n, overflow_mask)."""
    return FN.from_bytes_be(b)


def to_bytes_be(a):
    return Mod.to_bytes_be(a, FN)
