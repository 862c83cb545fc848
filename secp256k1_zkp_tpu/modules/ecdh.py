"""Batched ECDH (X9.63-style), TPU-native.

Counterpart of the reference ecdh module
(src/modules/ecdh/main_impl.h:34-79): shared secret =
SHA256(compressed_point(d*Q)) with the default hash function
(ecdh_hash_function_sha256, main_impl.h:14-28); routed through the
constant-dataflow ecmult_const engine, as the reference routes through
ecmult_const.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import ecmult
from ..ops import field as F
from ..ops import group as G
from ..ops import scalar as S
from ..ops import sha256 as H


def ecdh(pub: G.GE, sec32):
    """(shared32 [...,32] uint8, ok).  ok false for invalid seckey or
    infinity result."""
    d, d_ovf = S.from_bytes_be(sec32)
    d_ok = ~d_ovf & ~S.is_zero(d)
    rj = ecmult.ecmult_const(d, pub)
    r = G.ge_from_gej(rj)
    # default kdf: sha256(0x02|parity || x)
    x32 = F.to_bytes_be(r.x)
    pre = jnp.where(F.is_odd(r.y), 3, 2).astype(jnp.uint8)[..., None]
    msg = jnp.concatenate([pre, x32], axis=-1)
    out = H.words_to_bytes32(H.sha256_bytes(msg))
    ok = d_ok & ~rj.inf & ~pub.inf
    return jnp.where(ok[..., None], out, jnp.zeros_like(out)), ok


def ecdh_xonly(pub: G.GE, sec32):
    """x-only variant (no hash): returns the x coordinate bytes of d*Q —
    the building block ellswift_xdh uses (main_impl.h:560).  Routed
    through the sqrt-free x-only ladder (ecmult_const_xonly,
    src/ecmult_const_impl.h:268): pub.y never enters the dataflow."""
    d, d_ovf = S.from_bytes_be(sec32)
    d_ok = ~d_ovf & ~S.is_zero(d)
    x_out, x_ok = ecmult.ecmult_const_xonly(d, pub.x, known_on_curve=True)
    ok = d_ok & x_ok & ~pub.inf
    return F.to_bytes_be(x_out), ok
