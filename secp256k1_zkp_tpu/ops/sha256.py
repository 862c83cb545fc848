"""Batched SHA-256 / tagged hash / HMAC / RFC6979 HMAC-DRBG for TPU.

TPU-native counterpart of the reference hash layer (``src/hash.h``,
``src/hash_impl.h``).  All message lengths here are **static** (the
protocols only hash fixed-size inputs: 32-byte scalars, 33-byte points,
tag midstates), so every hash compiles to a fixed number of compression
rounds — message-parallel across lanes, exactly the batching seam the
reference's pluggable compression hook anticipates
(include/secp256k1.h:420-446).

Data layout: 32-bit big-endian words as uint32 tensors ``[..., W]``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import sha256_host

_u32 = jnp.uint32
# Host numpy, NOT jnp: a module-level jnp constant lives on the default
# device and is fetched back at every lowering — 0.3-190 s per fetch
# over the axon tunnel (ops/limb.py:260 measured round 4).
_K = np.array(sha256_host.K, dtype=np.uint32)
_INIT = np.array(sha256_host.INIT, dtype=np.uint32)


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _compress_unrolled(state, block):
    """Fully unrolled 64 rounds (maximum ILP; ~1.6k HLO ops per call —
    use only where few compressions are traced)."""
    w = [block[..., i] for i in range(16)]
    for t in range(16, 64):
        s0 = _rotr(w[t - 15], 7) ^ _rotr(w[t - 15], 18) ^ (w[t - 15] >> 3)
        s1 = _rotr(w[t - 2], 17) ^ _rotr(w[t - 2], 19) ^ (w[t - 2] >> 10)
        w.append(w[t - 16] + s0 + w[t - 7] + s1)
    a, b, c, d, e, f, g, h = [state[..., i] for i in range(8)]
    for t in range(64):
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + _K[t] + w[t]
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    out = jnp.stack([a, b, c, d, e, f, g, h], axis=-1)
    return state + out


def _compress_scan(state, block):
    """Rolled 64-round scan with a sliding 16-word schedule window.

    Same dataflow as _compress_unrolled but ~50 HLO ops + one loop, so
    protocols that trace dozens of compressions (rangeproof genrand,
    MuSig nonces, bppp transcripts) stay compilable in seconds.  The
    round loop is sequential either way — lanes parallelize across the
    batch, not across rounds."""
    import jax

    def step(carry, kt):
        s, w = carry
        a, b, c, d, e, f, g, h = [s[..., i] for i in range(8)]
        wt = w[..., 0]
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + kt + wt
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        s = jnp.stack([t1 + t2, a, b, c, d + t1, e, f, g], axis=-1)
        # next schedule word (only consumed while t < 48; harmless after)
        w1, w14 = w[..., 1], w[..., 14]
        s0w = _rotr(w1, 7) ^ _rotr(w1, 18) ^ (w1 >> 3)
        s1w = _rotr(w14, 17) ^ _rotr(w14, 19) ^ (w14 >> 10)
        w16 = w[..., 0] + s0w + w[..., 9] + s1w
        w = jnp.concatenate([w[..., 1:], w16[..., None]], axis=-1)
        return (s, w), None

    (out, _), _ = jax.lax.scan(step, (state, block), _K)
    return state + out


_COMPRESS_OVERRIDE = None


def set_compress(fn):
    """Install a custom compression function (or None to reset).

    The TPU counterpart of the fork's signature feature — the
    per-context pluggable SHA256 compression hook
    (include/secp256k1.h:420-446, secp256k1_context_set_sha256_hasher,
    src/secp256k1.c:247-261): every hash in the library (tagged hashes,
    HMAC, RFC6979, stream objects) routes through :func:`compress`, so
    an override here redirects all of them.  ``fn(state, block)`` takes
    uint32 tensors [..., 8], [..., 16] and returns [..., 8].  Like the
    reference's hook this is process-global configuration; install it
    BEFORE tracing (jitted programs specialize on it, exactly like the
    frozen config).  Returns the previous override.  Use
    ``Context(hash_compress=fn)`` to install + KAT-validate in one step
    (src/selftest.h:14-34 analog)."""
    global _COMPRESS_OVERRIDE
    prev = _COMPRESS_OVERRIDE
    _COMPRESS_OVERRIDE = fn
    return prev


def compress(state, block):
    """One SHA-256 compression: state [..., 8], block [..., 16] -> [..., 8]
    (cf. sha256_transform, src/hash_impl.h:51-138).  Rolled by default
    (compile-size); config sha_unroll (SECP_TPU_UNROLL_SHA=1) selects
    the unrolled 64-round body; a :func:`set_compress` override wins
    over both."""
    if _COMPRESS_OVERRIDE is not None:
        return _COMPRESS_OVERRIDE(state, block)
    from ..config import config
    if config().sha_unrolled():
        return _compress_unrolled(state, block)
    return _compress_scan(state, block)


def _pad_words(words, msg_bytes: int, consumed_bytes: int = 0):
    """SHA-256 padding for a whole-word message of static length.

    ``words``: [..., W] with W*4 == msg_bytes (only whole-word messages
    are needed by the protocols; odd sizes handled by callers packing).
    ``consumed_bytes``: bytes already absorbed (e.g. 64 for midstates).
    Returns [..., 16*k] padded block words.
    """
    W = words.shape[-1]
    assert W * 4 == msg_bytes
    total = msg_bytes + consumed_bytes
    # pad: 0x80... then zeros, then 8-byte bit length
    pad_words_cnt = (-(W + 1 + 2)) % 16 + 1 + 2
    batch = words.shape[:-1]
    pad = jnp.zeros((*batch, pad_words_cnt), _u32)
    pad = pad.at[..., 0].set(0x80000000)
    bitlen = total * 8
    pad = pad.at[..., -2].set((bitlen >> 32) & 0xFFFFFFFF)
    pad = pad.at[..., -1].set(bitlen & 0xFFFFFFFF)
    return jnp.concatenate([words, pad], axis=-1)


def sha256_words(words, init_state=None, consumed_bytes: int = 0):
    """SHA-256 of a whole-word message [..., W] -> digest words [..., 8].

    ``init_state``/``consumed_bytes`` support midstate continuation."""
    msg = _pad_words(words, words.shape[-1] * 4, consumed_bytes)
    if init_state is None:
        state = jnp.broadcast_to(jnp.asarray(_INIT), (*words.shape[:-1], 8))
    else:
        state = jnp.broadcast_to(init_state, (*words.shape[:-1], 8))
    nblk = msg.shape[-1] // 16
    for i in range(nblk):
        state = compress(state, msg[..., 16 * i:16 * (i + 1)])
    return state


def tagged_hash_words(tag: str, words):
    """SHA256(SHA256(tag)||SHA256(tag)||msg) with the tag midstate
    precomputed on host (cf. hash_impl.h:196)."""
    mid = jnp.asarray(np.array(sha256_host.tagged_midstate(tag),
                               dtype=np.uint32))
    return sha256_words(words, init_state=mid, consumed_bytes=64)


def hmac_sha256(key8, msgs):
    """HMAC-SHA256 with a 32-byte key (key8: [..., 8] words) over a
    whole-word message [..., W] (cf. hmac_sha256, src/hash_impl.h:216).
    """
    batch = key8.shape[:-1]
    zeros = jnp.zeros((*batch, 8), _u32)
    kblock = jnp.concatenate([key8, zeros], axis=-1)
    init = jnp.broadcast_to(jnp.asarray(_INIT), (*batch, 8))
    inner = compress(init, kblock ^ _u32(0x36363636))
    outer = compress(init, kblock ^ _u32(0x5C5C5C5C))
    ihash = sha256_words(msgs, init_state=inner, consumed_bytes=64)
    return sha256_words(ihash, init_state=outer, consumed_bytes=64)


def bytes32_to_words(b):
    """[..., 32] uint8 -> [..., 8] big-endian words."""
    b = jnp.asarray(b, _u32)
    s = b.shape[:-1]
    b4 = b.reshape(*s, 8, 4)
    return (b4[..., 0] << 24) | (b4[..., 1] << 16) | (b4[..., 2] << 8) \
        | b4[..., 3]


def words_to_bytes32(w):
    """[..., 8] words -> [..., 32] uint8."""
    s = w.shape[:-1]
    out = jnp.stack([(w >> 24) & 0xFF, (w >> 16) & 0xFF,
                     (w >> 8) & 0xFF, w & 0xFF], axis=-1)
    return out.reshape(*s, 32).astype(jnp.uint8)


class RFC6979:
    """Batched RFC6979 HMAC-SHA256 DRBG (cf. rfc6979_hmac_sha256_*,
    src/hash_impl.h:255-318).  Key material: fixed 64 bytes
    (seckey32||msg32), optionally +32 (extra) as the reference's default
    nonce function builds it (src/secp256k1.c:519-560)."""

    def __init__(self, keydata_words=None, keydata_bytes=None):
        """keydata_words: [..., W] words, or keydata_bytes: [..., L]
        uint8 (any static length, e.g. rangeproof's 98+hlen-byte seeds)."""
        if keydata_bytes is not None:
            kb = jnp.asarray(keydata_bytes, jnp.uint8)
        else:
            W = keydata_words.shape[-1]
            batch0 = keydata_words.shape[:-1]
            kb = jnp.stack([(keydata_words >> 24) & 0xFF,
                            (keydata_words >> 16) & 0xFF,
                            (keydata_words >> 8) & 0xFF,
                            keydata_words & 0xFF],
                           axis=-1).reshape(*batch0, 4 * W) \
                .astype(jnp.uint8)
        batch = kb.shape[:-1]
        v = jnp.full((*batch, 8), _u32(0x01010101))
        k = jnp.zeros((*batch, 8), _u32)
        k = self._hmac_vbyte(k, v, kb, 0x00)
        v = hmac_sha256(k, v)
        k = self._hmac_vbyte(k, v, kb, 0x01)
        v = hmac_sha256(k, v)
        self.k, self.v = k, v

    @staticmethod
    def _hmac_vbyte(k, v, keydata_bytes, sep_byte):
        """HMAC(k, v || sep_byte || keydata) — byte message (the 1-byte
        separator makes it non-word-aligned)."""
        batch = v.shape[:-1]
        vb = words_to_bytes32(v)
        sep = jnp.full((*batch, 1), sep_byte, jnp.uint8)
        msg = jnp.concatenate([vb, sep, keydata_bytes], axis=-1)
        return hmac_sha256_bytes(k, msg)

    def generate32(self):
        """One 32-byte output; updates state for the next candidate
        (rfc6979_hmac_sha256_generate, src/hash_impl.h:295)."""
        self.v = hmac_sha256(self.k, self.v)
        out = self.v
        # prepare next candidate: k = HMAC(k, v||0x00); v = HMAC(k, v)
        vb = words_to_bytes32(self.v)
        zero = jnp.zeros((*vb.shape[:-1], 1), jnp.uint8)
        self.k = hmac_sha256_bytes(self.k, jnp.concatenate([vb, zero],
                                                           axis=-1))
        self.v = hmac_sha256(self.k, self.v)
        return out


def _pad_bytes_to_blocks(msg_bytes_arr, consumed_bytes: int):
    """[..., L] uint8 (static L) -> padded block words [..., 16k]."""
    L = msg_bytes_arr.shape[-1]
    total = L + consumed_bytes
    # message || 0x80 || zeros || 8-byte bitlen, to a 64-byte multiple
    rem = (L + 1 + 8) % 64
    zpad = (64 - rem) % 64
    batch = msg_bytes_arr.shape[:-1]
    parts = [msg_bytes_arr,
             jnp.full((*batch, 1), 0x80, jnp.uint8),
             jnp.zeros((*batch, zpad + 4), jnp.uint8)]
    bitlen = total * 8
    lenb = jnp.broadcast_to(
        jnp.asarray(np.array([(bitlen >> 24) & 0xFF, (bitlen >> 16) & 0xFF,
                              (bitlen >> 8) & 0xFF, bitlen & 0xFF],
                             dtype=np.uint8)), (*batch, 4))
    parts.append(lenb)
    full = jnp.concatenate(parts, axis=-1)
    assert full.shape[-1] % 64 == 0
    nw = full.shape[-1] // 4
    b4 = full.astype(_u32).reshape(*batch, nw, 4)
    return (b4[..., 0] << 24) | (b4[..., 1] << 16) | (b4[..., 2] << 8) \
        | b4[..., 3]


def sha256_bytes(msg, init_state=None, consumed_bytes: int = 0):
    """SHA-256 over a byte tensor [..., L] (static L) -> [..., 8] words."""
    words = _pad_bytes_to_blocks(msg, consumed_bytes)
    if init_state is None:
        state = jnp.broadcast_to(jnp.asarray(_INIT), (*msg.shape[:-1], 8))
    else:
        state = jnp.broadcast_to(init_state, (*msg.shape[:-1], 8))
    nblk = words.shape[-1] // 16
    for i in range(nblk):
        state = compress(state, words[..., 16 * i:16 * (i + 1)])
    return state


def hmac_sha256_bytes(key8, msg):
    """HMAC-SHA256, 32-byte key, byte-tensor message [..., L]."""
    batch = key8.shape[:-1]
    zeros = jnp.zeros((*batch, 8), _u32)
    kblock = jnp.concatenate([key8, zeros], axis=-1)
    init = jnp.broadcast_to(jnp.asarray(_INIT), (*batch, 8))
    inner = compress(init, kblock ^ _u32(0x36363636))
    outer = compress(init, kblock ^ _u32(0x5C5C5C5C))
    ihash = sha256_bytes(msg, init_state=inner, consumed_bytes=64)
    return sha256_words(ihash, init_state=outer, consumed_bytes=64)


def tagged_hash_bytes(tag: str, msg):
    mid = jnp.asarray(np.array(sha256_host.tagged_midstate(tag),
                               dtype=np.uint32))
    return sha256_bytes(msg, init_state=mid, consumed_bytes=64)


class Sha256Stream:
    """Incremental SHA-256 over statically-sized writes (batched).

    Mirrors the reference's streaming sha256 object (src/hash.h:19-23):
    protocols like half-aggregation keep a running transcript and
    finalize *copies* of it at every step.  All sizes are static, so the
    pending-buffer occupancy is tracked in Python."""

    def __init__(self, batch_shape=(), tag: str | None = None):
        if tag is None:
            self.state = jnp.broadcast_to(jnp.asarray(_INIT),
                                          (*batch_shape, 8))
            self.total = 0
        else:
            mid = jnp.asarray(np.array(sha256_host.tagged_midstate(tag),
                                       dtype=np.uint32))
            self.state = jnp.broadcast_to(mid, (*batch_shape, 8))
            self.total = 64
        self.pending = None  # [..., k] uint8, k < 64 (static)

    def copy(self):
        s = object.__new__(Sha256Stream)
        s.state, s.total, s.pending = self.state, self.total, self.pending
        return s

    def write(self, data):
        """data: [..., L] uint8, static L."""
        buf = data if self.pending is None else \
            jnp.concatenate([self.pending, data], axis=-1)
        nblk = buf.shape[-1] // 64
        if nblk:
            words = _bytes_to_words_generic(buf[..., :64 * nblk])
            st = self.state
            for i in range(nblk):
                st = compress(st, words[..., 16 * i:16 * (i + 1)])
            self.state = st
        rem = buf.shape[-1] % 64
        self.pending = buf[..., buf.shape[-1] - rem:] if rem else None
        self.total += data.shape[-1]
        return self

    def finalize_words(self):
        """Returns the digest [..., 8] words; the stream remains usable
        (finalization happens on a copy of the running state)."""
        tail = self.pending if self.pending is not None else \
            jnp.zeros((*self.state.shape[:-1], 0), jnp.uint8)
        return sha256_bytes(tail, init_state=self.state,
                            consumed_bytes=self.total - tail.shape[-1])


def _bytes_to_words_generic(b):
    b = jnp.asarray(b, _u32)
    s = b.shape[:-1]
    n = b.shape[-1] // 4
    b4 = b.reshape(*s, n, 4)
    return (b4[..., 0] << 24) | (b4[..., 1] << 16) | (b4[..., 2] << 8) \
        | b4[..., 3]
