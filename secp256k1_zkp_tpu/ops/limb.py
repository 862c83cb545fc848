"""Batched multi-precision modular arithmetic for TPU (JAX).

This is the TPU-native replacement for the reference library's limb layers
(``src/field_5x52*.h``, ``src/scalar_4x64*.h``; see SURVEY.md L1).  The
reference uses 64-bit limbs with 128-bit accumulators — TPUs have neither, so
the design here is different:

* A 256-bit integer is a **lane-major tensor** ``[..., 16]`` of ``uint32``
  limbs in base 2^16 (little-endian).  The leading dimensions are the batch;
  every operation below is elementwise-batched and maps to the TPU VPU.
* Products of two 16-bit limbs fit exactly in ``uint32``.  Column sums use a
  lo/hi split so each column stays < 2^21 — no 64-bit accumulator needed.
* Like the reference's *magnitude* discipline (``src/field.h:18-38``), every
  value carries a bound on its limbs — but here the bound is **static Python
  metadata** checked at trace time, so misuse fails loudly during tracing
  instead of needing a VERIFY build.
* There is no variable-time / constant-time split: every kernel is a fixed
  dataflow program (no data-dependent branches), which on TPU is both the
  fast shape and the constant-time shape.

The generic :class:`Mod` engine is instantiated for the secp256k1 field
p = 2^256 - 2^32 - 977 and group order n (see ``field.py`` / ``scalar.py``),
and also supports the tiny exhaustive-test moduli (SURVEY.md §4.3).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LIMBS = 16
LIMB_BITS = 16
MASK16 = 0xFFFF
U32_MAX = 0xFFFFFFFF

_u32 = jnp.uint32


def _as_u32(x):
    return jnp.asarray(x, dtype=_u32)


@jax.tree_util.register_pytree_node_class
class LB:
    """A batched big integer: ``v`` is ``[..., K]`` uint32 limbs (base 2^16,
    little-endian); ``bound`` is a static per-limb upper bound (inclusive).

    The bound plays the role of the reference's field "magnitude"
    (``src/field.h:18-38``) but is tracked statically at trace time.
    """

    __slots__ = ("v", "bound")

    def __init__(self, v, bound: int):
        self.v = v
        self.bound = int(bound)

    # pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        return (self.v,), self.bound

    @classmethod
    def tree_unflatten(cls, bound, children):
        return cls(children[0], bound)

    # conveniences ---------------------------------------------------------
    @property
    def shape(self):
        return self.v.shape

    @property
    def batch_shape(self):
        return self.v.shape[:-1]

    def __repr__(self):
        return f"LB(shape={tuple(self.v.shape)}, bound={hex(self.bound)})"


def lb_from_int(x: int, limbs: int = LIMBS) -> LB:
    """Constant (unbatched) LB from a Python int (host-side)."""
    assert 0 <= x < (1 << (LIMB_BITS * limbs))
    arr = np.array([(x >> (LIMB_BITS * i)) & MASK16 for i in range(limbs)],
                   dtype=np.uint32)
    return LB(jnp.asarray(arr), MASK16)


def int_to_limbs(x: int, limbs: int = LIMBS) -> list[int]:
    return [(x >> (LIMB_BITS * i)) & MASK16 for i in range(limbs)]


def limbs_to_int_np(arr: np.ndarray) -> int:
    """Host-side: collapse a limb vector (last axis) to a Python int."""
    arr = np.asarray(arr, dtype=np.uint64)
    out = 0
    for i in reversed(range(arr.shape[-1])):
        out = (out << LIMB_BITS) | int(arr[..., i])
    return out


# ---------------------------------------------------------------------------
# Wide (column) arithmetic.
#
# A "column vector" is [..., K] uint32 where column k carries weight 2^(16k);
# column values may exceed 2^16 (redundant / carry-save form).  This replaces
# the reference's int128 accumulator chains (src/int128.h,
# src/field_5x52_int128_impl.h:18).
# ---------------------------------------------------------------------------


def _diag_colsum(prod):
    """Sum anti-diagonals of the trailing [n, m] axes -> [..., n+m-1].

    Used to turn the [n, m] outer product of limbs into weight-aligned
    columns in O(1) HLO ops (pad/reshape/reduce) instead of an n*m scatter.
    """
    n, m = prod.shape[-2], prod.shape[-1]
    pad = [(0, 0)] * (prod.ndim - 1) + [(0, n)]
    padded = jnp.pad(prod, pad)  # [..., n, m+n]
    flat = padded.reshape(*prod.shape[:-2], n * (m + n))
    flat = flat[..., : n * (n + m - 1)]
    return flat.reshape(*prod.shape[:-2], n, n + m - 1).sum(axis=-2)


def mul_cols(a: LB, b: LB) -> LB:
    """Exact product of two limb vectors -> column vector of length n+m.

    Both inputs must have limbs <= 0xFFFF (checked statically).  Column
    bound: min(n, m) * 2 * 0xFFFF < 2^21, so columns never overflow uint32.
    """
    assert a.bound <= MASK16 and b.bound <= MASK16, (
        f"mul_cols requires 16-bit-normalized inputs, got bounds "
        f"{hex(a.bound)}, {hex(b.bound)}")
    n, m = a.v.shape[-1], b.v.shape[-1]
    prod = a.v[..., :, None] * b.v[..., None, :]  # exact in uint32
    lo = prod & MASK16
    hi = prod >> LIMB_BITS
    lo_c = _diag_colsum(lo)  # [..., n+m-1]
    hi_c = _diag_colsum(hi)  # [..., n+m-1], weight shifted by one limb
    zero_last = [(0, 0)] * (lo_c.ndim - 1)
    cols = jnp.pad(lo_c, zero_last + [(0, 1)]) + jnp.pad(hi_c, zero_last + [(1, 0)])
    t = min(n, m)
    return LB(cols, 2 * t * MASK16)


def sqr_cols(a: LB) -> LB:
    """Square via the generic product.

    Unlike the Pallas kernels (pallas_field._sqr_limbs, which halve
    the unrolled product count via i<j symmetry), this layout gains
    nothing from symmetry: the [..., 16, 16] outer product is ONE
    vectorized op, and a triangular variant would either keep the same
    dense shape (zeros cost the same lanes) or need pack/gather
    relayouts that cost more than the multiplies they save.  Evaluated
    and closed round 5 — kernels exploit symmetry, the jnp path
    cannot profitably."""
    return mul_cols(a, a)


def add_lb(a: LB, b: LB) -> LB:
    """Column-wise add; pads the shorter operand with zero columns."""
    na, nb = a.v.shape[-1], b.v.shape[-1]
    av, bv = a.v, b.v
    if na < nb:
        av = jnp.pad(av, [(0, 0)] * (av.ndim - 1) + [(0, nb - na)])
    elif nb < na:
        bv = jnp.pad(bv, [(0, 0)] * (bv.ndim - 1) + [(0, na - nb)])
    bound = a.bound + b.bound
    assert bound <= U32_MAX, "column overflow: normalize before adding"
    return LB(av + bv, bound)


def shift_cols(a: LB, k: int) -> LB:
    """Multiply by 2^(16k) by prepending k zero columns."""
    if k == 0:
        return a
    return LB(jnp.pad(a.v, [(0, 0)] * (a.v.ndim - 1) + [(k, 0)]), a.bound)


def _ripple(v, carry_in=None):
    """Exact sequential carry propagation over the last axis.

    Returns (limbs <= 0xFFFF, carry_out).  Requires per-limb bound
    <= 2^32 - 2^16 so ``limb + carry`` cannot wrap.  Kept as the slow
    exact reference; the hot path uses :func:`_ks_carry` (log depth).
    """
    k = v.shape[-1]
    outs = []
    c = jnp.zeros(v.shape[:-1], _u32) if carry_in is None else carry_in
    for i in range(k):
        t = v[..., i] + c
        outs.append(t & MASK16)
        c = t >> LIMB_BITS
    return jnp.stack(outs, axis=-1), c


def _shift_up(x, k):
    """x[i] -> x[i-k] along the last axis, zero-filled (weight *2^(16k))."""
    pad = [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x[..., :-k], pad + [(k, 0)])


def _ks_carry(v):
    """Kogge–Stone carry propagation: exact, log-depth, fully limb-
    parallel.  Requires per-limb bound <= 0x1FFFF (so every carry is 0/1).

    Returns (limbs <= 0xFFFF, carry_out in {0,1}).  This is the TPU-shaped
    replacement for the sequential carry chains the reference gets for
    free from 64-bit adds.
    """
    g = (v >> LIMB_BITS).astype(jnp.bool_)        # generate (v <= 0x1FFFF)
    p = (v & MASK16) == MASK16                    # propagate
    k = v.shape[-1]
    sh = 1
    while sh < k:
        gs = _shift_up(g, sh)
        ps = _shift_up(p, sh)
        g = g | (p & gs)
        p = p & ps
        sh *= 2
    c_in = _shift_up(g, 1).astype(_u32)           # carry INTO each limb
    out = (v + c_in) & MASK16
    return out, g[..., -1].astype(_u32)


def _ks_add(a, b):
    """Exact a + b on <=0xFFFF-limb vectors via one KS round.
    Returns (limbs <= 0xFFFF, carry_out)."""
    return _ks_carry(a + b)


# ---------------------------------------------------------------------------
# Modulus engine
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Mod:
    """Arithmetic mod ``modulus`` on 16x16-bit-limb batched integers.

    Reduction uses the identity 2^256 === red (mod modulus) where
    ``red = 2^256 - modulus`` — the generalization of the reference's
    "multiply overflow by 0x1000003D1" trick (src/field_5x52_impl.h) that
    also covers the scalar field (src/scalar_4x64_impl.h) and the
    exhaustive-test orders.  Requires modulus > 2^255 OR a small modulus
    used only with already-reduced values... in practice: p, n (both close
    to 2^256) and tiny test orders handled via ``small`` mode.
    """

    modulus: int
    name: str = "mod"

    def __post_init__(self):
        assert 2 ** 255 < self.modulus < 2 ** 256, (
            "Mod engine expects a ~256-bit modulus; use SmallMod for tiny "
            "exhaustive-test orders")
        red = (1 << 256) - self.modulus
        red_limbs = []
        x = red
        while x:
            red_limbs.append(x & MASK16)
            x >>= LIMB_BITS
        object.__setattr__(self, "_red_limbs", tuple(red_limbs))
        object.__setattr__(self, "_mod_limbs", tuple(int_to_limbs(self.modulus)))
        object.__setattr__(self, "_min_mod_limb", min(self._mod_limbs))
        # Constants cached as HOST numpy: a jnp constant would live on
        # the default device and be fetched back at every lowering —
        # over the axon tunnel that fetch is 0.3-190 s (measured round
        # 4); numpy embeds directly into the lowered module.
        object.__setattr__(self, "_red_np",
                           np.array(red_limbs, dtype=np.uint32))
        object.__setattr__(self, "_mod_np",
                           np.array(self._mod_limbs, dtype=np.uint32))

    # -- constants ---------------------------------------------------------
    @property
    def red_len(self) -> int:
        return len(self._red_limbs)

    def _red_lb(self) -> LB:
        return LB(self._red_np, MASK16)

    def zero(self, batch_shape=()) -> LB:
        return LB(jnp.zeros((*batch_shape, LIMBS), _u32), 0)

    def one(self, batch_shape=()) -> LB:
        v = jnp.zeros((*batch_shape, LIMBS), _u32).at[..., 0].set(1)
        return LB(v, MASK16)

    def const(self, x: int) -> LB:
        return lb_from_int(x % self.modulus)

    # -- reduction ---------------------------------------------------------
    def fold(self, a: LB) -> LB:
        """Fold columns >= 16 back using 2^256 === red.  Output: 16 columns.

        Works for arbitrary uint32 columns: each high column is split into
        its exact 16-bit halves before multiplying by ``red`` so every
        partial product stays exact in uint32.
        """
        cols = a
        while cols.v.shape[-1] > LIMBS:
            lo = LB(cols.v[..., :LIMBS], cols.bound)
            hi_v = cols.v[..., LIMBS:]
            h0 = LB(hi_v & MASK16, min(cols.bound, MASK16))
            # bound <= U32_MAX always, so hi parts are exact 16-bit pieces.
            h1 = LB(hi_v >> LIMB_BITS, cols.bound >> LIMB_BITS)
            c0 = mul_cols(h0, self._red_lb())
            cols = add_lb(lo, c0)
            if h1.bound > 0:
                c1 = mul_cols(h1, self._red_lb())
                cols = add_lb(cols, shift_cols(c1, 1))
        return cols

    def norm_weak(self, a: LB) -> LB:
        """Bring to 16 limbs, each <= 0xFFFF (value < 2^256, may be >= mod).

        This is the analogue of the reference's ``normalize_weak``
        (src/field.h:85).  Output is always mul-ready.
        """
        if a.bound <= MASK16 and a.v.shape[-1] == LIMBS:
            return a  # already weak: value < 2^256, limbs 16-bit
        cols = self.fold(a)
        v, bound = cols.v, cols.bound
        pad = [(0, 0)] * (v.ndim - 1)
        # One parallel carry pass always brings limbs under 0x1FFFF (the
        # Kogge–Stone precondition); the top carry goes to an overflow
        # accumulator rather than being folded in-pass (in-pass folding
        # converges too slowly for reds with large limbs, e.g. n's).
        lo = v & MASK16
        c = v >> LIMB_BITS
        v = lo + jnp.pad(c[..., :-1], pad + [(1, 0)])
        ov = c[..., -1]
        ov_bound = bound >> LIMB_BITS
        # KS1: v <= 0x1FFFE; exact carries; carry-out joins ov.
        v, c1 = _ks_carry(v)
        ov = ov + c1
        ov_bound += 1
        assert ov_bound <= MASK16, "overflow accumulator exceeded 16 bits"
        # Fold ov*red (value = v + ov*2^256; 2^256 === red).  f's columns
        # are <= 0x1FFFE; split exactly into lo + 2^16*hi with hi in {0,1}
        # so the next KS round's inputs stay <= 0x1FFFF.
        f = mul_cols(LB(ov[..., None], ov_bound), self._red_lb())
        assert f.v.shape[-1] <= LIMBS and f.bound <= 2 * MASK16
        fv = jnp.pad(f.v, pad + [(0, LIMBS - f.v.shape[-1])])
        # Add f in two KS rounds (single-round inputs could reach 0x1FFFF,
        # where a carry of 2 breaks binary KS).  At most one of c2a/c2b
        # can be 1: if v+flo wrapped, the remainder is < 2^161.
        v, c2a = _ks_carry(v + (fv & MASK16))
        v, c2b = _ks_carry(v + _shift_up(fv >> LIMB_BITS, 1))
        c2 = c2a + c2b
        # KS4: fold c2 (0/1) * red; value is now provably < 2^256, so the
        # final carry-out is zero.
        redv = np.pad(self._red_np, (0, LIMBS - self.red_len))
        v, _c3 = _ks_carry(v + c2[..., None] * redv)
        return LB(v, MASK16)

    def normalize(self, a: LB) -> LB:
        """Canonical representative in [0, modulus). Limbs <= 0xFFFF.

        Conditional subtract via the carry trick of the reference's
        normalize (src/field_10x26_impl.h): x >= m  <=>  x + red >= 2^256.
        One subtraction suffices because x < 2^256 < 2*modulus.
        """
        x = self.norm_weak(a)
        redv = np.pad(self._red_np, (0, LIMBS - self.red_len))
        t, c = _ks_carry(x.v + redv)
        ge = (c > 0)[..., None]
        return LB(jnp.where(ge, t, x.v), MASK16)

    # -- ring ops ----------------------------------------------------------
    def add(self, a: LB, b: LB) -> LB:
        return add_lb(a, b)

    def neg(self, a: LB) -> LB:
        """k*modulus - a for the smallest safe k (cf. fe_negate magnitude
        argument, src/field.h:214-225)."""
        assert a.v.shape[-1] == LIMBS, "negate expects 16-limb (folded) input"
        k = a.bound // self._min_mod_limb + 1
        assert k * MASK16 + 0 <= U32_MAX, "negate overflow; normalize first"
        karr = np.array([k * l for l in self._mod_limbs], dtype=np.uint64)
        assert karr.max() <= U32_MAX
        kk = karr.astype(np.uint32)
        return LB(kk - a.v, int(karr.max()))

    def sub(self, a: LB, b: LB) -> LB:
        return add_lb(a, self.neg(b))

    def mul(self, a: LB, b: LB) -> LB:
        a = self.norm_if_needed(a)
        b = self.norm_if_needed(b)
        return self.norm_weak(mul_cols(a, b))

    def sqr(self, a: LB) -> LB:
        a = self.norm_if_needed(a)
        return self.norm_weak(sqr_cols(a))

    def mul_int(self, a: LB, k: int) -> LB:
        assert a.bound * k <= U32_MAX
        return LB(a.v * _u32(k), a.bound * k)

    def norm_if_needed(self, a: LB) -> LB:
        if a.bound <= MASK16 and a.v.shape[-1] == LIMBS:
            return a
        return self.norm_weak(a)

    def half(self, a: LB) -> LB:
        """a/2 mod m (m odd): (a + m*(a&1)) >> 1, exact.

        Mirrors fe_half (src/field.h:331-341)."""
        a = self.norm_if_needed(a)
        odd = a.v[..., 0] & 1
        t = a.v + self._mod_np * odd[..., None]  # bound 2*MASK16 ok
        t, c = _ks_carry(t)  # c in {0,1} = bit 256
        hi_in = jnp.concatenate([t[..., 1:], c[..., None]], axis=-1)
        half = (t >> 1) | ((hi_in & 1) << (LIMB_BITS - 1))
        return LB(half, MASK16)

    # -- comparisons -------------------------------------------------------
    def is_zero_weak(self, a: LB):
        """Zero test for an already weak-normalized value (16 limbs,
        bound <= MASK16, so value < 2^256 < 2*modulus): zero mod m
        <=> limbs are all-0 or exactly the modulus.  ~6 HLO ops versus
        ~40 for the canonicalize-then-compare path — this runs inside
        every complete group add (the degenerate-case test), so its
        size shows up in every traced scan body.

        The 2*modulus > 2^256 precondition is the class invariant
        (__post_init__ asserts modulus > 2^255); tiny exhaustive-test
        orders never reach this code — they use the separate SmallMod
        engine (ops/small_scalar.py)."""
        assert a.bound <= MASK16 and a.v.shape[-1] == LIMBS
        return (jnp.all(a.v == 0, axis=-1)
                | jnp.all(a.v == self._mod_np, axis=-1))

    def is_zero(self, a: LB):
        return self.is_zero_weak(self.norm_if_needed(a))

    def eq(self, a: LB, b: LB):
        """a === b (mod m), via one subtraction + the weak zero test
        (equality mod m IS the definition here; canonicalize-and-compare
        costs two conditional-subtract normalizations instead of one
        norm_weak)."""
        return self.is_zero_weak(
            self.norm_weak(self.sub(self.norm_if_needed(a),
                                    self.norm_if_needed(b))))

    def is_odd(self, a: LB):
        return (self.normalize(a).v[..., 0] & 1) == 1

    # -- selection ---------------------------------------------------------
    @staticmethod
    def select(mask, a: LB, b: LB) -> LB:
        """mask ? a : b  (mask: [...] bool). Bounds merge statically."""
        assert a.v.shape[-1] == b.v.shape[-1]
        return LB(jnp.where(mask[..., None], a.v, b.v), max(a.bound, b.bound))

    # -- exponentiation ----------------------------------------------------
    def pow_const(self, x: LB, e: int) -> LB:
        """x^e for a Python-int exponent, via 4-bit fixed windows and a
        lax.scan so the HLO stays small (SURVEY.md §7.1 step 1).

        Fully uniform dataflow: each window does 4 squarings + one table
        gather + one multiply (digit 0 multiplies by 1).
        """
        assert e >= 0
        if e == 0:
            return self.one(x.batch_shape)
        x = self.norm_if_needed(x)

        # Window width: 4 normally; 2 under the compile-small config
        # (jnp_window=1): XLA:CPU codegen cost grows superlinearly in
        # scan-body size, so halving the body beats halving the length.
        from ..config import config
        w = 4 if config().jnp_window > 1 else 2
        tsz = 1 << w

        # Precompute x^0..x^(2^w - 1) with a scan (one mul body instead
        # of inlined muls — compile-size matters on 256-bit limb code).
        def tab_body(prev, _):
            nxt = self.mul(LB(prev, MASK16), x)
            return nxt.v, nxt.v

        _, tail = jax.lax.scan(tab_body, self.one(x.batch_shape).v,
                               None, length=tsz - 1)
        table = jnp.concatenate(
            [self.one(x.batch_shape).v[None], tail], axis=0)
        ndig = (e.bit_length() + w - 1) // w
        digits = jnp.asarray(
            np.array([(e >> (w * i)) & (tsz - 1)
                      for i in reversed(range(ndig))], dtype=np.int32))

        def body(acc, d):
            # w squarings via fori_loop: one sqr body in the trace
            # (compile-size; mul/sqr outputs are already MASK16-bounded)
            acc = jax.lax.fori_loop(
                0, w, lambda _, v: self.sqr(LB(v, MASK16)).v, acc)
            m = LB(jax.lax.dynamic_index_in_dim(table, d, 0, keepdims=False),
                   MASK16)
            return self.mul(LB(acc, MASK16), m).v, None

        first = jax.lax.dynamic_index_in_dim(table, digits[0], 0,
                                             keepdims=False)
        acc, _ = jax.lax.scan(body, first, digits[1:])
        return LB(acc, MASK16)

    def inv(self, x: LB) -> LB:
        """Modular inverse via Fermat: x^(m-2).

        The reference uses safegcd divsteps (src/modinv64_impl.h) which is
        fast serially but control-flow-heavy; on TPU a fixed powering chain
        is branch-free and batch-parallel (SURVEY.md §7.1 gate 1).
        inv(0) = 0 (same convention as the reference's field code).
        """
        return self.pow_const(x, self.modulus - 2)

    # -- bytes -------------------------------------------------------------
    def from_bytes_be(self, b) -> tuple[LB, jax.Array]:
        """[..., 32] uint8 big-endian -> (LB canonical, overflow mask).

        overflow[i] is True where the 256-bit value was >= modulus
        (cf. scalar_set_b32 overflow flag, src/scalar.h:31-37)."""
        b = jnp.asarray(b, dtype=_u32)
        hi = b[..., 0:32:2]
        lo = b[..., 1:32:2]
        limbs_be = (hi << 8) | lo          # [..., 16] big-endian 16-bit limbs
        v = limbs_be[..., ::-1]
        x = LB(v, MASK16)
        redv = np.pad(self._red_np, (0, LIMBS - self.red_len))
        t, c = _ks_carry(v + redv)
        overflow = c > 0
        return LB(jnp.where(overflow[..., None], t, v), MASK16), overflow

    @staticmethod
    def to_bytes_be(a: LB, mod: "Mod") -> jax.Array:
        x = mod.normalize(a).v  # [..., 16] little-endian 16-bit limbs
        le = x[..., ::-1]
        hi = (le >> 8).astype(jnp.uint8)
        lo = (le & 0xFF).astype(jnp.uint8)
        return jnp.stack([hi, lo], axis=-1).reshape(*x.shape[:-1], 32)

    def get_bits(self, a: LB, offset: int, count: int):
        """Static-offset bit extraction from a canonical value
        (cf. scalar_get_bits, src/scalar.h:25-29). count <= 16."""
        assert a.bound <= MASK16
        limb, sh = divmod(offset, LIMB_BITS)
        lo = a.v[..., limb] >> sh
        if sh + count > LIMB_BITS and limb + 1 < LIMBS:
            lo = lo | (a.v[..., limb + 1] << (LIMB_BITS - sh))
        return lo & ((1 << count) - 1)
