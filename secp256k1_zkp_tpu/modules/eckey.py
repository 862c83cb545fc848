"""EC key operations, batched for TPU.

Counterpart of the reference eckey layer (src/eckey_impl.h) and the
pubkey parts of the context API (src/secp256k1.c:290-391).  Every
function is batched: inputs/outputs carry a leading batch shape and an
``ok`` validity mask replaces the reference's int return codes.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import ecmult
from ..ops import field as F
from ..ops import group as G
from ..ops import scalar as S
from ..ops.limb import LB


def seckey_verify(sec: LB):
    """True where 1 <= sec < n (cf. ec_seckey_verify, secp256k1.c:666)."""
    return ~S.is_zero(sec)


def pubkey_create(sec: LB, table=None):
    """(GE pubkey, ok).  ok false for sec == 0 (cf. ec_pubkey_create,
    secp256k1.c:688)."""
    ok = seckey_verify(sec)
    pj = ecmult.ecmult_gen(sec, table)
    return G.ge_from_gej(pj), ok


def pubkey_parse(b):
    """Parse SEC1 public keys [..., 33] or [..., 65] uint8 -> (GE, ok).

    Accepts 0x02/0x03 compressed; 0x04 uncompressed; 0x06/0x07 hybrid
    with parity check (cf. eckey_pubkey_parse, src/eckey_impl.h:18-55)."""
    L = b.shape[-1]
    prefix = jnp.asarray(b[..., 0], jnp.uint32)
    if L == 33:
        x, xovf = F.from_bytes_be(b[..., 1:33])
        y, yok = F.sqrt(F.add(F.mul(F.sqr(x), x), F.fe(F.B_COEFF)))
        y = F.normalize(y)
        want_odd = prefix == 3
        y = F.select(F.is_odd(y) != want_odd, F.neg(y), y)
        y = F.normalize(y)
        ok = ((prefix == 2) | (prefix == 3)) & ~xovf & yok
        pt = G.GE(x, y, ~ok)
        return pt, ok
    assert L == 65
    x, xovf = F.from_bytes_be(b[..., 1:33])
    y, yovf = F.from_bytes_be(b[..., 33:65])
    on = G.ge_is_on_curve(G.GE(x, y, jnp.zeros(b.shape[:-1], bool)))
    parity_ok = jnp.where(
        (prefix == 6) | (prefix == 7),
        F.is_odd(y) == (prefix == 7),
        prefix == 4)
    ok = parity_ok & ~xovf & ~yovf & on
    return G.GE(x, y, ~ok), ok


def pubkey_serialize(p: G.GE, compressed: bool = True):
    """GE -> SEC1 bytes (cf. eckey_pubkey_serialize,
    src/eckey_impl.h:42-55).  Infinity lanes serialize as zeros."""
    x = F.to_bytes_be(p.x)
    if compressed:
        pre = jnp.where(F.is_odd(p.y), 3, 2).astype(jnp.uint8)[..., None]
        out = jnp.concatenate([pre, x], axis=-1)
    else:
        pre = jnp.full((*p.batch_shape, 1), 4, jnp.uint8)
        out = jnp.concatenate([pre, x, F.to_bytes_be(p.y)], axis=-1)
    return jnp.where(p.inf[..., None], jnp.zeros_like(out), out)


def privkey_tweak_add(sec: LB, tweak: LB):
    """(sec + tweak mod n, ok); ok false if result 0 or tweak >= n handled
    by caller's parse (cf. ec_seckey_tweak_add, secp256k1.c:705)."""
    r = S.normalize(S.add(sec, tweak))
    ok = ~S.is_zero(r) & ~S.is_zero(sec)
    return r, ok


def privkey_tweak_mul(sec: LB, tweak: LB):
    r = S.normalize(S.mul(sec, tweak))
    ok = ~S.is_zero(tweak) & ~S.is_zero(sec)
    return r, ok


def pubkey_tweak_add(p: G.GE, tweak: LB, table=None):
    """(P + tweak*G, ok) (cf. ec_pubkey_tweak_add, secp256k1.c:737 ->
    eckey_pubkey_tweak_add, src/eckey_impl.h:57)."""
    tj = ecmult.ecmult_gen(tweak, table)
    r = G.gej_add(tj, G.gej_from_ge(p))
    ok = ~r.inf & ~p.inf
    return G.ge_from_gej(r), ok


def pubkey_tweak_mul(p: G.GE, tweak: LB):
    """(tweak * P, ok) (cf. eckey_pubkey_tweak_mul, src/eckey_impl.h:79)."""
    r = ecmult.ecmult_const(tweak, p)
    ok = ~S.is_zero(tweak) & ~p.inf
    return G.ge_from_gej(r), ok


def pubkey_combine(points: list[G.GE]):
    """Sum of pubkeys (cf. ec_pubkey_combine, secp256k1.c:843)."""
    acc = G.gej_from_ge(points[0])
    for p in points[1:]:
        acc = G.gej_add_ge(acc, p)
    return G.ge_from_gej(acc), ~acc.inf


def pubkey_negate(p: G.GE):
    return G.ge_neg(p)


def pubkey_sort(points: G.GE):
    """Sort a batch of pubkeys by their compressed serialization
    (cf. secp256k1_ec_pubkey_sort, src/secp256k1.c + src/hsort.h).

    The reference needs an adversarial-input-safe heapsort because libc
    qsort can go quadratic; here the comparison keys are fixed-width
    33-byte rows, so the host does a radix-style lexsort on the
    serialized bytes (O(n log n) worst case, data-independent).
    Returns (sorted GE batch, permutation indices).
    """
    import numpy as np
    ser = np.asarray(pubkey_serialize(points))  # [n, 33]
    order = np.lexsort(ser.T[::-1])             # lexicographic rows
    idx = jnp.asarray(order)
    from ..ops.limb import LB
    out = G.GE(LB(points.x.v[idx], points.x.bound),
               LB(points.y.v[idx], points.y.bound), points.inf[idx])
    return out, order


def pubkey_cmp(a: G.GE, b: G.GE):
    """Lexicographic compare of compressed serializations -> [-1,0,1]
    per lane (cf. secp256k1_ec_pubkey_cmp)."""
    sa = jnp.asarray(pubkey_serialize(a), jnp.int32)
    sb = jnp.asarray(pubkey_serialize(b), jnp.int32)
    diff = sa - sb
    nz = diff != 0
    first = jnp.argmax(nz, axis=-1)
    any_nz = jnp.any(nz, axis=-1)
    d = jnp.take_along_axis(diff, first[..., None], axis=-1)[..., 0]
    return jnp.where(any_nz, jnp.sign(d), 0)


def seckey_negate(sec32):
    """(n - sec) mod n; zero stays zero (secp256k1_ec_seckey_negate,
    secp256k1.c:700). Returns (sec32', ok) with ok False on overflow."""
    d, ovf = S.from_bytes_be(sec32)
    out = S.normalize(S.neg(d))
    out = S.select(S.is_zero(d), d, out)
    b = S.to_bytes_be(out)
    b = jnp.where(ovf[..., None], jnp.zeros_like(b), b)
    return b, ~ovf
