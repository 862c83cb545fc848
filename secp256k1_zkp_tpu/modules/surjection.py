"""Asset surjection proofs, batched for TPU.

Counterpart of src/modules/surjection/{main_impl.h, surjection_impl.h}
(include/secp256k1_surjectionproof.h): a one-ring Borromean signature
over keys (output_tag - input_tag_i), proving the output asset tag is a
blinded version of one of n input tags.

Host/device split: ``initialize`` (the SHA256-csprng rejection sampling
of the used-input bitmap, main_impl.h:136-273) is inherently iterative
host logic and runs in Python; ``generate``/``verify`` run batched on
device with a static (n_inputs, n_used) shape per call.
"""

from __future__ import annotations

import hashlib

import jax.numpy as jnp
import numpy as np

from ..ops import field as F
from ..ops import group as G
from ..ops import scalar as S
from ..ops import sha256 as H
from ..ops.limb import LB, MASK16
from . import borromean

MAX_N_INPUTS = 256
MAX_USED_INPUTS = 256


# ---------------------------------------------------------------------------
# Host: csprng + initialize
# ---------------------------------------------------------------------------


class _Csprng:
    """surjectionproof_csprng (main_impl.h:136-171)."""

    def __init__(self, seed32: bytes):
        self.state = bytearray(seed32)
        self.i = 0

    def next(self, rand_max: int) -> int:
        inc = 2 if rand_max > 256 else 1
        sel = 0xFFFF if rand_max > 256 else 0xFF
        limit = ((sel + 1) // rand_max) * rand_max
        while True:
            if self.i + inc >= 32:
                self.state = bytearray(
                    hashlib.sha256(bytes(self.state)).digest())
                self.i = 0
            val = self.state[self.i]
            if inc > 1:
                val = (val << 8) + self.state[self.i + 1]
            self.i += inc
            if val < limit:
                return val % rand_max


def initialize(fixed_input_tags: list[bytes], n_use: int,
               fixed_output_tag: bytes, n_max_iterations: int,
               seed32: bytes):
    """Host: pick the used-input bitmap (surjectionproof_initialize,
    main_impl.h:214).  fixed tags are 32-byte asset ids.
    Returns (n_iterations, used_bitmap bytes, input_index) or None."""
    n = len(fixed_input_tags)
    assert n <= MAX_N_INPUTS and n_use <= n
    rng = _Csprng(seed32)
    n_iter = 0
    while True:
        used = bytearray((n + 7) // 8)
        input_index = None
        has_output = False
        for _ in range(n_use):
            while True:
                idx = rng.next(n)
                if fixed_input_tags[idx] == fixed_output_tag:
                    input_index = idx
                    has_output = True
                if not (used[idx // 8] & (1 << (idx % 8))):
                    used[idx // 8] |= 1 << (idx % 8)
                    break
        n_iter += 1
        if has_output:
            return n_iter, bytes(used), input_index
        if n_iter >= n_max_iterations:
            return None


# ---------------------------------------------------------------------------
# Device
# ---------------------------------------------------------------------------


def _ser33_tag(p: G.GE):
    """Generator tags hash-serialize like pubkeys: 02/03 prefix
    (surjection_genmessage, surjection_impl.h:18)."""
    pre = jnp.where(F.is_odd(p.y), 3, 2).astype(jnp.uint8)[..., None]
    return jnp.concatenate([pre, F.to_bytes_be(F.normalize(p.x))], axis=-1)


def genmessage(input_tags: list[G.GE], output_tag: G.GE):
    msg = jnp.concatenate([_ser33_tag(t) for t in input_tags]
                          + [_ser33_tag(output_tag)], axis=-1)
    return H.words_to_bytes32(H.sha256_bytes(msg))


def genrand(n_used: int, blinding_key: LB):
    """s_i = sha256(le32(i) || tail_i) (surjection_genrand,
    surjection_impl.h:38).  Returns (s list, ok).

    The reference hashes a single reused 36-byte buffer whose first 32
    bytes are overwritten by each round's digest (sha256_finalize writes
    into sec_input), so only round 0 hashes the blinding key directly;
    round i>=1 hashes le32(i) || digest_{i-1}[4:32] || blind32[28:32].
    This accidental chaining is deployed (Liquid) behavior and must be
    reproduced bit-exactly."""
    b32 = S.to_bytes_be(S.normalize(blinding_key))
    batch = b32.shape[:-1]
    out = []
    ok = jnp.ones(batch, bool)
    tail = b32                                  # sec_input[4:36]
    for i in range(n_used):
        pre = np.frombuffer(int(i).to_bytes(4, "little"), np.uint8)
        prefix = jnp.broadcast_to(jnp.asarray(pre), (*batch, 4))
        h = H.words_to_bytes32(H.sha256_bytes(
            jnp.concatenate([prefix, tail], axis=-1)))
        s, ovf = S.from_bytes_be(h)
        ok = ok & ~ovf
        out.append(s)
        tail = jnp.concatenate([h[..., 4:32], b32[..., 28:32]], axis=-1)
    return out, ok


def _ring_pubkeys(used_tags: list[G.GE], output_tag: G.GE):
    """pubkeys[j] = output_tag - used_input_tag_j
    (surjection_compute_public_keys)."""
    out = []
    for t in used_tags:
        pj = G.gej_add_ge(G.gej_from_ge(G.ge_neg(t)), output_tag)
        a = G.ge_from_gej(pj)
        out.append(G.GE(F.normalize(a.x), F.normalize(a.y), a.inf))
    return out


def generate(input_tags: list[G.GE], used_idx: list[int],
             output_tag: G.GE, ring_input_index,
             input_blind32, output_blind32, table=None):
    """Device: produce the proof's (e0, s values)
    (surjectionproof_generate, main_impl.h:273).

    used_idx: static list of used input positions (from initialize);
    ring_input_index: [...] int32 position of the real input within the
    used set.  Returns (e0 [...,32], s_bytes [..., 32*n_used], ok)."""
    n_used = len(used_idx)
    bi, bi_ovf = S.from_bytes_be(input_blind32)
    bo, bo_ovf = S.from_bytes_be(output_blind32)
    ok = ~bi_ovf & ~bo_ovf
    blind = S.normalize(S.sub(bo, bi))

    # equal input/output tags make the ring key zero -> reject, like the
    # reference (deployed Liquid semantics)
    for t in input_tags:
        eq = F.eq(t.x, output_tag.x) & F.eq(t.y, output_tag.y)
        ok = ok & ~eq

    used_tags = [input_tags[i] for i in used_idx]
    pubs = _ring_pubkeys(used_tags, output_tag)
    msg32 = genmessage(input_tags, output_tag)
    s_list, g_ok = genrand(n_used, blind)
    ok = ok & g_ok

    # nonce = the s at the ring input index (overwritten by sign)
    k = s_list[0]
    for j in range(1, n_used):
        k = S.select(ring_input_index == j, s_list[j], k)

    e0, s_out, b_ok = borromean.sign(
        [k], [blind], s_list, pubs, [n_used], [ring_input_index], msg32,
        table)
    ok = ok & b_ok
    s_bytes = jnp.concatenate([S.to_bytes_be(S.normalize(s))
                               for s in s_out], axis=-1)
    return e0, s_bytes, ok


def verify(input_tags: list[G.GE], used_idx: list[int],
           output_tag: G.GE, e0, s_bytes, table=None):
    """Device verify (surjectionproof_verify, main_impl.h:360)."""
    n_used = len(used_idx)
    used_tags = [input_tags[i] for i in used_idx]
    pubs = _ring_pubkeys(used_tags, output_tag)
    msg32 = genmessage(input_tags, output_tag)
    s_list = []
    batch = e0.shape[:-1]
    ok = jnp.ones(batch, bool)
    for j in range(n_used):
        s, ovf = S.from_bytes_be(s_bytes[..., 32 * j:32 * (j + 1)])
        ok = ok & ~ovf
        s_list.append(s)
    return ok & borromean.verify(e0, s_list, pubs, [n_used], msg32, table)


# ---------------------------------------------------------------------------
# Proof envelope (host): 2-byte n_inputs LE + bitmap + 32*(1+n_used)
# (surjectionproof_parse/serialize, main_impl.h:46-118)
# ---------------------------------------------------------------------------


def serialize(n_inputs: int, used_bitmap: bytes, e0: bytes,
              s_values: bytes) -> bytes:
    return (n_inputs.to_bytes(2, "little") + used_bitmap + e0 + s_values)


def parse(data: bytes):
    """Returns (n_inputs, used_bitmap, e0, s_bytes) or None."""
    if len(data) < 2:
        return None
    n = int.from_bytes(data[:2], "little")
    if n == 0 or n > MAX_N_INPUTS:
        return None
    nb = (n + 7) // 8
    if len(data) < 2 + nb + 32:
        return None
    bitmap = data[2:2 + nb]
    # reject trailing bits beyond n
    if n % 8 and (bitmap[-1] >> (n % 8)):
        return None
    n_used = sum(bin(b).count("1") for b in bitmap)
    if len(data) != 2 + nb + 32 * (1 + n_used):
        return None
    e0 = data[2 + nb:2 + nb + 32]
    s = data[2 + nb + 32:]
    return n, bitmap, e0, s


def n_total_inputs(n_inputs: int, used_bitmap: bytes) -> int:
    """(secp256k1_surjectionproof_n_total_inputs)."""
    del used_bitmap
    return n_inputs


def n_used_inputs(n_inputs: int, used_bitmap: bytes) -> int:
    """Popcount of the used-input bitmap
    (secp256k1_surjectionproof_n_used_inputs)."""
    nb = (n_inputs + 7) // 8
    return sum(bin(b).count("1") for b in used_bitmap[:nb])


def serialized_size(n_inputs: int, n_used: int) -> int:
    """(secp256k1_surjectionproof_serialized_size): 2-byte count +
    bitmap + 32*(1 + n_used)."""
    return 2 + (n_inputs + 7) // 8 + 32 * (1 + n_used)
