"""ElligatorSwift (BIP-324) 64-byte uniform public-key encoding, batched.

Counterpart of the reference ellswift module
(src/modules/ellswift/main_impl.h; include/secp256k1_ellswift.h):

* :func:`xswiftec` — decode (u, t) -> curve x coordinate
  (xswiftec_frac_var, main_impl.h:24-137), as a mask/select dataflow.
* :func:`xswiftec_inv` — the 8-branch partial inverse
  (xswiftec_inv_var, main_impl.h:163-310).
* :func:`encode` / :func:`create` — rejection-sample (u, t) using the
  SHA256-counter PRNG with the reference's exact tagged-hash midstates
  and (branch, u) consumption order (main_impl.h:310-460).  The
  reference retries forever; here attempts run in batched rounds of 64
  continuing the same counter stream: called EAGERLY, the host loop
  keeps adding rounds until every lane succeeds (the reference's
  retry-forever semantics, device shapes static per round); called
  under jit the loop cannot sync, so exactly one 64-attempt round runs
  and the ``ok`` mask reports the < 2^-40-probability failures (the
  reference's expected attempt count is ~2.5, so one round fails a
  lane with p ~ (1 - 1/2.5)^64).
* :func:`decode`, :func:`xdh` with the BIP-324 KDF.

All random choices are bit-exact with the reference, so encodings are
byte-identical given the same rnd32/auxrnd32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ecmult
from ..ops import field as F
from ..ops import group as G
from ..ops import scalar as S
from ..ops import sha256 as H
from ..ops.limb import LB, MASK16
from ..utils import sha256_host

# c0 = sqrt(-3) (principal root); c1..c4 per main_impl.h:14-21:
#   c1 = (c0-1)/2, c2 = (-c0-1)/2 = -(c1+1), c3 = -c1 = c2+1, c4 = -c2.
_C0 = pow(F.P - 3, (F.P + 1) // 4, F.P)
_C1 = (_C0 - 1) * pow(2, -1, F.P) % F.P
_C2 = (-_C0 - 1) * pow(2, -1, F.P) % F.P
_C3 = (F.P - _C1) % F.P
_C4 = (_C1 + 1) % F.P
assert _C3 == (_C2 + 1) % F.P and _C4 == (F.P - _C2) % F.P


def _x_on_curve(x: LB, b: int = F.B_COEFF):
    """Is x a valid X coordinate (x^3+b square)?"""
    return F.is_square(F.norm_weak(F.add(F.mul(F.sqr(x), x),
                                         F.fe(b))))


def _x_frac_on_curve(xn: LB, xd: LB, b: int = F.B_COEFF):
    """Is xn/xd a valid X coordinate (xd != 0)?  a/b square iff a*b^... :
    (xn/xd)^3+b square <=> xn^3*xd + b*xd^4 square (times xd^4)."""
    xd2 = F.sqr(xd)
    xd4 = F.sqr(xd2)
    n = F.add(F.mul(F.mul(F.sqr(xn), xn), xd),
              F.mul_int(xd4, b))
    return F.is_square(F.norm_weak(n)) & ~F.is_zero(xd)


def xswiftec_frac(u: LB, t: LB, b: int = F.B_COEFF):
    """(u, t) -> (xn, xd) with x = xn/xd (never fails)."""
    one = F.FP.one(u.batch_shape)
    u1 = F.select(F.is_zero(u), one, F.FP.norm_if_needed(u))
    s = F.sqr(t)
    s = F.select(F.is_zero(t), one, s)
    u2 = F.sqr(u1)
    g = F.norm_weak(F.add(F.mul(u2, u1), F.fe(b)))   # u^3+b
    p = F.norm_weak(F.add(g, s))
    szero = F.is_zero(p)
    s = F.select(szero, F.norm_weak(F.mul_int(s, 4)), s)
    p = F.select(szero, F.norm_weak(F.add(g, s)), p)
    d = F.norm_weak(F.mul_int(F.mul(s, u2), 3))              # 3*s*u^2
    n = F.norm_weak(F.sub(F.mul(d, u1), F.sqr(p)))           # 3su^3-(g+s)^2
    x3_ok = _x_frac_on_curve(n, d, b)

    n2 = F.mul(F.norm_weak(F.add(F.mul(F.fe(_C1), s), F.mul(F.fe(_C2), g))),
               u1)                                           # u*(c1 s+c2 g)
    x2_ok = _x_frac_on_curve(n2, p, b)

    n1 = F.norm_weak(F.neg(F.norm_weak(F.add(n2, F.mul(p, u1)))))

    xn = F.select(x3_ok, n, F.select(x2_ok, n2, n1))
    xd = F.select(x3_ok, d, p)
    return xn, xd


def xswiftec(u: LB, t: LB, b: int = F.B_COEFF) -> LB:
    xn, xd = xswiftec_frac(u, t, b)
    return F.normalize(F.mul(xn, F.inv(xd)))


def xswiftec_inv(x: LB, u: LB, c: int, b: int = F.B_COEFF):
    """Branch-c partial inverse: returns (t, ok). c in 0..7.
    x must be a valid X coordinate; u nonzero."""
    assert 0 <= c < 8
    x = F.FP.norm_if_needed(x)
    u1 = F.FP.norm_if_needed(u)
    if not (c & 2):
        m = F.norm_weak(F.neg(F.norm_weak(F.add(x, u1))))     # -u-x
        ok = ~_x_on_curve(m, b)
        # s = -(u^3+7)/(u^2+ux+x^2); square iff -(u^3+7)(u^2+ux+x^2) square
        s_neg_den = F.norm_weak(
            F.sub(F.mul(u1, x), F.sqr(F.norm_weak(F.add(u1, x)))))
        # s_neg_den = -(u^2+ux+x^2)
        g = F.norm_weak(F.add(F.mul(F.sqr(u1), u1), F.fe(b)))
        ok = ok & F.is_square(F.mul(s_neg_den, g))
        s = F.mul(F.inv(s_neg_den), g)
        v = x
    else:
        s = F.norm_weak(F.sub(x, u1))
        ok = F.is_square(s)
        u2 = F.sqr(u1)
        q = F.norm_weak(F.add(F.mul_int(F.mul(s, u2), 3),
                              F.norm_weak(F.add(F.mul_int(F.mul(u2, u1), 4),
                                                F.fe(4 * b)))))
        q = F.norm_weak(F.neg(F.norm_weak(F.mul(q, s))))
        # q = -s*(4*(u^3+7)+3*u^2*s)
        r, r_ok = F.sqrt(q)
        ok = ok & r_ok
        if c & 1:
            ok = ok & ~F.is_zero(r)
        ok = ok & ~F.is_zero(s)
        v = F.half(F.norm_weak(F.sub(F.mul(F.inv(s), r), u1)))
    w, w_ok = F.sqrt(s)
    ok = ok & w_ok
    if (c & 5) == 0 or (c & 5) == 5:
        w = F.norm_weak(F.neg(F.FP.norm_if_needed(w)))
    cmul = _C4 if (c & 1) else _C3
    t = F.mul(w, F.norm_weak(F.add(F.mul(F.fe(cmul), u1), v)))
    return F.normalize(t), ok


# -- SHA256-counter PRNG (main_impl.h:310) ----------------------------------


def _prng32(hasher_state, consumed_bytes, prefix_bytes, cnt):
    """SHA256(hasher || cnt_le32) — single extra compression.

    hasher_state: [..., 8] midstate after `consumed_bytes` whole blocks;
    prefix_bytes: [..., k] remaining unconsumed bytes (k + 4 + padding
    must fit one block); cnt: [...] uint32 counter."""
    cnt = jnp.asarray(cnt, jnp.uint32)
    b = jnp.stack([cnt & 0xFF, (cnt >> 8) & 0xFF, (cnt >> 16) & 0xFF,
                   (cnt >> 24) & 0xFF], axis=-1).astype(jnp.uint8)
    msg = jnp.concatenate([prefix_bytes, b], axis=-1)
    return H.sha256_bytes(msg, init_state=hasher_state,
                          consumed_bytes=consumed_bytes)


def _xswiftec_inv_lanes(x: LB, u: LB, branch, b: int = F.B_COEFF):
    """xswiftec_inv with a per-lane (traced) branch index in [0, 8).

    Shares the expensive exponentiations between the two branch groups
    (c&2==0: x1/x2 formulas; c&2==2: x3 formula) — only sign/constant
    selection differs within a group.  Returns (t, ok)."""
    # group A (c & 2 == 0)
    mA = F.norm_weak(F.neg(F.norm_weak(F.add(x, u))))
    okA = ~_x_on_curve(mA, b)
    den = F.norm_weak(F.sub(F.mul(u, x), F.sqr(F.norm_weak(F.add(u, x)))))
    g = F.norm_weak(F.add(F.mul(F.sqr(u), u), F.fe(b)))
    okA = okA & F.is_square(F.mul(den, g))
    sA = F.mul(F.inv(den), g)
    vA = x
    # group B (c & 2 == 2)
    sB = F.norm_weak(F.sub(x, u))
    okB = F.is_square(sB)
    u2 = F.sqr(u)
    q = F.norm_weak(F.add(F.mul_int(F.mul(sB, u2), 3),
                          F.norm_weak(F.mul_int(g, 4))))
    q = F.norm_weak(F.neg(F.norm_weak(F.mul(q, sB))))
    r, r_ok = F.sqrt(q)
    okB = okB & r_ok & ~F.is_zero(sB)
    vB = F.half(F.norm_weak(F.sub(F.mul(F.inv(sB), r), u)))
    # merge groups
    is_b = (branch & 2) == 2
    s = F.select(is_b, sB, sA)
    v = F.select(is_b, vB, vA)
    ok = jnp.where(is_b, okB, okA)
    odd_c = (branch & 1) == 1
    ok = ok & ~(is_b & odd_c & F.is_zero(r))
    w, w_ok = F.sqrt(s)
    ok = ok & w_ok
    negw = ((branch & 5) == 0) | ((branch & 5) == 5)
    w = F.select(negw, F.norm_weak(F.neg(F.FP.norm_if_needed(w))), w)
    cmul = F.select(odd_c, _fe_bcast(_C4, x.batch_shape),
                    _fe_bcast(_C3, x.batch_shape))
    t = F.mul(w, F.norm_weak(F.add(F.mul(cmul, u), v)))
    return F.normalize(t), ok


def _fe_bcast(c: int, batch_shape):
    fe = F.fe(c)
    return LB(jnp.broadcast_to(fe.v, (*batch_shape, 16)), fe.bound)


def _encode_common(x: LB, y_odd, hasher_state, prefix_bytes,
                   consumed_bytes, attempts: int = 64,
                   attempt_base: int = 0, b: int = F.B_COEFF):
    """Shared rejection-sampling loop of elligatorswift_var, as a
    lax.scan over attempts [attempt_base, attempt_base + attempts).

    Consumption order matches the reference exactly: cnt = 65k fills the
    64-entry 3-bit branch pool (consumed from the END, byte (i>>1),
    nibble (i&1)); the other cnt values are u draws.  ``attempt_base``
    lets retry rounds continue the identical counter stream."""
    batch = x.batch_shape
    found0 = jnp.zeros(batch, bool)
    t0 = LB(F.fe_zero(batch).v, MASK16)
    u0 = jnp.zeros((*batch, 32), jnp.uint8)

    # Precompute per-attempt (pool_cnt, u_cnt, nibble index) host-side.
    idx = np.arange(attempt_base, attempt_base + attempts)
    blocks = sorted(set(int(i) // 64 for i in idx))
    pool_cnts = np.array([blk * 65 for blk in blocks], np.uint32)
    u_cnts = ((idx // 64) * 65 + (idx % 64) + 1).astype(np.uint32)
    nib = (63 - (idx % 64)).astype(np.int32)
    pools = jnp.stack(
        [H.words_to_bytes32(_prng32(hasher_state, consumed_bytes,
                                    prefix_bytes,
                                    jnp.full(batch, int(c), jnp.uint32)))
         for c in pool_cnts], axis=0)  # [blocks, ..., 32]
    pool_idx = np.searchsorted(blocks, idx // 64).astype(np.int32)

    def body(carry, xs):
        found, t_v, u_b = carry
        ucnt, nibble, pidx = xs
        pool = jax.lax.dynamic_index_in_dim(pools, pidx, 0, keepdims=False)
        byte = jax.lax.dynamic_index_in_dim(pool, nibble >> 1, axis=-1,
                                            keepdims=False)
        branch = (byte.astype(jnp.int32) >> ((nibble & 1) << 2)) & 7
        u32b = H.words_to_bytes32(_prng32(
            hasher_state, consumed_bytes, prefix_bytes,
            jnp.broadcast_to(ucnt, batch)))
        uu, _ = F.from_bytes_be(u32b)  # set_b32_mod semantics
        t_i, ok_i = _xswiftec_inv_lanes(x, uu, branch, b)
        take = ~found & ok_i
        t_v = F.select(take, t_i, LB(t_v, MASK16)).v
        u_b = jnp.where(take[..., None], u32b, u_b)
        return (found | ok_i, t_v, u_b), None

    xs = (jnp.asarray(u_cnts), jnp.asarray(nib), jnp.asarray(pool_idx))
    (found, t_v, u_acc), _ = jax.lax.scan(body, (found0, t0.v, u0), xs)

    # match y parity: negate t if parity differs (elligatorswift_var)
    t_acc = F.normalize(LB(t_v, MASK16))
    flip = F.is_odd(t_acc) != y_odd
    t_acc = F.normalize(F.select(flip, F.neg(t_acc), t_acc))
    ell64 = jnp.concatenate([u_acc, F.to_bytes_be(t_acc)], axis=-1)
    return jnp.where(found[..., None], ell64, jnp.zeros_like(ell64)), found


def _encode_rounds(x, y_odd, state, tail, consumed_bytes,
                   b: int = F.B_COEFF, max_rounds: int = 64):
    """Rounds of 64 attempts continuing one counter stream.

    Eager: host-syncs after each round and keeps going until every
    lane found an encoding — the reference's retry-forever loop
    (main_impl.h:393-460) with static device shapes per round; rounds
    beyond the first are cryptographically rare (p < 2^-40 per lane),
    so their one-time compiles almost never happen.  Under jit the
    sync raises ConcretizationTypeError and exactly one round runs
    (callers check ``ok``)."""
    ell64, ok = _encode_common(x, y_odd, state, tail, consumed_bytes,
                               b=b)
    for r in range(1, max_rounds):
        try:
            done = bool(np.asarray(jnp.all(ok)))
        except (jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            return ell64, ok            # traced: single fixed round
        if done:
            return ell64, ok
        e_r, ok_r = _encode_common(x, y_odd, state, tail,
                                   consumed_bytes, attempt_base=64 * r,
                                   b=b)
        ell64 = jnp.where(ok[..., None], ell64, e_r)
        ok = ok | ok_r
    return ell64, ok


def _midstate(tag: str):
    return jnp.asarray(np.array(sha256_host.tagged_midstate(tag),
                                dtype=np.uint32))


def encode(pub: G.GE, rnd32, b: int = F.B_COEFF):
    """Pubkey -> 64-byte encoding (ellswift_encode, main_impl.h:393).
    PRNG: tagged "secp256k1_ellswift_encode" over ser33||0*31||rnd32."""
    ser33 = _ser33(pub)
    zero31 = jnp.zeros((*pub.batch_shape, 31), jnp.uint8)
    prefix = jnp.concatenate([ser33, zero31, rnd32], axis=-1)  # 96 bytes
    # midstate consumed 64 bytes (tag block); prefix is 96 bytes -> one
    # more whole block consumed inside sha256_bytes... we must keep the
    # prefix unconsumed-tail <= 59 bytes for the single-compression PRNG:
    # absorb the first block of the prefix into the state here.
    mid = _midstate("secp256k1_ellswift_encode")
    state = jnp.broadcast_to(mid, (*pub.batch_shape, 8))
    first_words = _bytes_to_words(prefix[..., :64])
    state = H.compress(state, first_words)
    tail = prefix[..., 64:]
    ell64, ok = _encode_rounds(F.FP.normalize(pub.x), F.is_odd(pub.y),
                               state, tail, 128, b=b)
    return ell64, ok & ~pub.inf


def create(sec32, auxrnd32=None, table=None, b: int = F.B_COEFF):
    """Seckey -> (ell64, ok) (ellswift_create, main_impl.h:432).
    PRNG: tagged "secp256k1_ellswift_create" over sec32||0*32[||aux]."""
    d, d_ovf = S.from_bytes_be(sec32)
    ok = ~d_ovf & ~S.is_zero(d)
    pj = ecmult.ecmult_gen(d, table)
    pub = G.ge_from_gej(pj)
    batch = d.batch_shape
    zero32 = jnp.zeros((*batch, 32), jnp.uint8)
    prefix = jnp.concatenate(
        [sec32, zero32] + ([auxrnd32] if auxrnd32 is not None else []),
        axis=-1)  # 64 or 96 bytes
    mid = _midstate("secp256k1_ellswift_create")
    state = jnp.broadcast_to(mid, (*batch, 8))
    first_words = _bytes_to_words(prefix[..., :64])
    state = H.compress(state, first_words)
    tail = prefix[..., 64:]
    ell64, enc_ok = _encode_rounds(F.FP.normalize(pub.x),
                                   F.is_odd(pub.y), state, tail, 128,
                                   b=b)
    ok = ok & enc_ok
    return jnp.where(ok[..., None], ell64, jnp.zeros_like(ell64)), ok


def decode(ell64, b: int = F.B_COEFF):
    """64 bytes -> (GE, ok=True always) (ellswift_decode, main_impl.h:470):
    y parity = parity of t."""
    u, _ = F.from_bytes_be(ell64[..., :32])    # mod p
    t, _ = F.from_bytes_be(ell64[..., 32:])
    x = xswiftec(u, t, b)
    y2 = F.add(F.mul(F.sqr(x), x), F.fe(b))
    y, _ = F.sqrt(y2)
    y = F.normalize(y)
    t_odd = F.is_odd(F.normalize(t))
    y = F.normalize(F.select(F.is_odd(y) != t_odd, F.neg(y), y))
    return G.GE(x, y, jnp.zeros(x.batch_shape, bool)), \
        jnp.ones(x.batch_shape, bool)


def xdh(ell_a64, ell_b64, sec32, party_a):
    """BIP-324 x-only ECDH (ellswift_xdh, main_impl.h:520): output =
    tagged_hash[bip324_ellswift_xonly_ecdh](ell_a||ell_b||x32).

    party_a: python bool — True if we are party A (peer key is ell_b).

    The peer key's y is never needed: xswiftec gives an on-curve x and
    the multiply runs through the sqrt-free x-only ladder
    (ecmult_const_xonly, src/ecmult_const_impl.h:268), exactly like the
    reference's ellswift_xdh (main_impl.h:520-560)."""
    theirs = ell_b64 if party_a else ell_a64
    u, _ = F.from_bytes_be(theirs[..., :32])
    t, _ = F.from_bytes_be(theirs[..., 32:])
    x = xswiftec(u, t)
    d, d_ovf = S.from_bytes_be(sec32)
    ok = ~d_ovf & ~S.is_zero(d)
    x_out, x_ok = ecmult.ecmult_const_xonly(d, x, known_on_curve=True)
    x32 = F.to_bytes_be(x_out)
    msg = jnp.concatenate([ell_a64, ell_b64, x32], axis=-1)
    out = H.words_to_bytes32(
        H.tagged_hash_bytes("bip324_ellswift_xonly_ecdh", msg))
    ok = ok & x_ok
    return jnp.where(ok[..., None], out, jnp.zeros_like(out)), ok


def _ser33(p: G.GE):
    pre = jnp.where(F.is_odd(p.y), 3, 2).astype(jnp.uint8)[..., None]
    return jnp.concatenate([pre, F.to_bytes_be(p.x)], axis=-1)


def _bytes_to_words(b):
    b = jnp.asarray(b, jnp.uint32)
    s = b.shape[:-1]
    n = b.shape[-1] // 4
    b4 = b.reshape(*s, n, 4)
    return (b4[..., 0] << 24) | (b4[..., 1] << 16) | (b4[..., 2] << 8) \
        | b4[..., 3]
