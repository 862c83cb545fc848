"""Back–Maxwell range proofs over Pedersen commitments, batched for TPU.

Counterpart of src/modules/rangeproof/rangeproof_impl.h (+ the module API
in include/secp256k1_rangeproof.h): base-4 digit rings proven with
Borromean ring signatures, message embedding and rewind.

Host/device split (SURVEY.md §7.2.4): the host computes the per-lane
proof *layout* (proveparams: exp/mantissa/rings; header bytes) and
assembles/parses the variable-length proof envelope; the device executes
all algebra and hashing with static shapes.  One batched call covers
lanes sharing a layout (exp, mantissa, has-min-value) — the natural TPU
grouping; the C-compatible per-proof API wraps it with batch=1.

A 64-bit proof is 32 rings x 4 members: ~128 masked double-scalar mults
+ ~130 SHA256 per sign/verify (SURVEY.md §3.5).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ops import ecmult
from ..ops import field as F
from ..ops import group as G
from ..ops import scalar as S
from ..ops import sha256 as H
from ..ops.limb import LB, MASK16
from . import borromean

U64 = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# Host-side layout (range_proveparams, rangeproof_impl.h:114-190)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Layout:
    """Static proof layout shared by all lanes of one batched call."""
    exp: int
    mantissa: int
    has_min: bool

    @property
    def rings(self):
        if self.mantissa == 0:
            return 1
        return (self.mantissa + 1) >> 1

    @property
    def rsizes(self):
        if self.mantissa == 0:
            return [1]
        r = [4] * (self.mantissa >> 1)
        if self.mantissa & 1:
            r.append(2)
        return r

    @property
    def npub(self):
        return sum(self.rsizes)

    @property
    def scale(self):
        return 10 ** self.exp

    @property
    def header_len(self):
        return 1 + (1 if self.mantissa else 0) + (8 if self.has_min else 0)


def proveparams(value: int, min_value: int, exp: int, min_bits: int):
    """Per-lane parameter derivation (range_proveparams).  Returns
    (v, adjusted_min_value, mantissa, exp) or None on failure."""
    if min_value > value or min_bits > 64 or min_bits < 0 or exp < -1 \
            or exp > 18:
        return None
    if min_value == U64:
        exp = -1
    if exp >= 0:
        if (min_value and value > 2 ** 63 - 1) or \
                (value and min_value >= 2 ** 63 - 1):
            return None
        max_bits = 64 - min_value.bit_length() if min_value else 64
        if min_bits > max_bits:
            min_bits = max_bits
        if min_bits > 61 or value > 2 ** 63 - 1:
            exp = 0
        v = value - min_value
        v2 = (U64 >> (64 - min_bits)) if min_bits else 0
        i = 0
        while i < exp and v2 <= U64 // 10:
            v //= 10
            v2 *= 10
            i += 1
        exp = i
        scale = 10 ** exp
        min_value = value - v * scale
        mantissa = v.bit_length() if v else 1
        if min_bits > mantissa:
            mantissa = min_bits
        return v, min_value, mantissa, exp
    else:
        return 0, value, 0, 0


def header_bytes(layout: Layout, min_values: np.ndarray) -> np.ndarray:
    """[B] uint64-ish ints -> [B, header_len] uint8 header."""
    B = len(min_values)
    out = np.zeros((B, layout.header_len), np.uint8)
    b0 = (64 | layout.exp) if layout.mantissa else 0
    if layout.has_min:
        b0 |= 32
    out[:, 0] = b0
    pos = 1
    if layout.mantissa:
        out[:, 1] = layout.mantissa - 1
        pos = 2
    if layout.has_min:
        for i, mv in enumerate(min_values):
            out[i, pos:pos + 8] = np.frombuffer(
                int(mv).to_bytes(8, "big"), np.uint8)
    return out


def parse_header(proof: bytes):
    """Host: (offset, exp, mantissa, scale, min_value, max_value) or None
    (rangeproof_getheader_impl)."""
    if len(proof) < 65 or (proof[0] & 128):
        return None
    off = 0
    has_nz = proof[0] & 64
    has_min = proof[0] & 32
    exp = -1
    mantissa = 0
    if has_nz:
        exp = proof[0] & 31
        off += 1
        if exp > 18:
            return None
        mantissa = proof[off] + 1
        if mantissa > 64:
            return None
        max_value = U64 >> (64 - mantissa)
    else:
        max_value = 0
    off += 1
    scale = 1
    for _ in range(exp if exp > 0 else 0):
        if max_value > U64 // 10:
            return None
        max_value *= 10
        scale *= 10
    min_value = 0
    if has_min:
        if len(proof) - off < 8:
            return None
        min_value = int.from_bytes(proof[off:off + 8], "big")
        off += 8
    if max_value > U64 - min_value:
        return None
    return off, exp, mantissa, scale, min_value, max_value + min_value, \
        bool(has_min)


# ---------------------------------------------------------------------------
# Device helpers
# ---------------------------------------------------------------------------


def _ser_rp(p: G.GE):
    """Rangeproof point serialization: [!is_square(y)] || x
    (rangeproof_serialize_point)."""
    sq = F.is_square(p.y)
    pre = jnp.where(sq, 0, 1).astype(jnp.uint8)[..., None]
    return jnp.concatenate([pre, F.to_bytes_be(F.normalize(p.x))], axis=-1)


def _u64_scalar(table64, digit):
    """digit in 0..3 ([...] int32), table64: python list of 4 u64 values.
    Returns the scalar digit -> table64[digit]."""
    arr = np.zeros((4, 16), np.uint32)
    for d, val in enumerate(table64):
        for i in range(4):
            arr[d, i] = (val >> (16 * i)) & 0xFFFF
    t = jnp.asarray(arr)
    return LB(t[digit], MASK16)


def _scalar_from_u64(val: int, batch):
    arr = np.zeros(16, np.uint32)
    for i in range(4):
        arr[i] = (val >> (16 * i)) & 0xFFFF
    return LB(jnp.broadcast_to(jnp.asarray(arr), (*batch, 16)), MASK16)


def _genrand(layout: Layout, nonce32, commit: G.GE, genp: G.GE,
             header, prep):
    """Device genrand (rangeproof_impl.h:61): returns (sec list, s list,
    prep', ok).  prep: [..., npub*32] uint8 message bytes (XOR-embedded
    into the s values and updated in place, for rewind parity)."""
    seed = jnp.concatenate(
        [nonce32, _ser_rp(commit), _ser_rp(genp), header], axis=-1)
    drbg = H.RFC6979(keydata_bytes=seed)
    batch = nonce32.shape[:-1]
    ok = jnp.ones(batch, bool)
    sec = []
    acc = S.zero(batch)
    s_list = []
    prep_out = prep
    npub = 0
    for i in range(layout.rings):
        if i < layout.rings - 1:
            drbg.generate32()  # discarded draw (genrand's do-loop shape)
            kb = H.words_to_bytes32(drbg.generate32())
            si, ovf = S.from_bytes_be(kb)
            ok = ok & ~ovf & ~S.is_zero(si)
            sec.append(si)
            acc = S.FN.norm_weak(S.add(acc, si))
        else:
            sec.append(S.normalize(S.neg(acc)))
        for j in range(layout.rsizes[i]):
            tmp = H.words_to_bytes32(drbg.generate32())
            blk = prep[..., 32 * npub:32 * (npub + 1)]
            tmp = jnp.bitwise_xor(tmp, blk)
            prep_out = jnp.concatenate(
                [prep_out[..., :32 * npub], tmp,
                 prep_out[..., 32 * (npub + 1):]], axis=-1)
            sj, ovf = S.from_bytes_be(tmp)
            ok = ok & ~ovf & ~S.is_zero(sj)
            s_list.append(sj)
            npub += 1
    return sec, s_list, prep_out, ok


def _pub_expand(ring_bases, layout: Layout, genp: G.GE):
    """rangeproof_pub_expand as one scan over flat members:
    pubs[base+j] = pubs[base+j-1] + step, step = -genp * 10^exp * 4^i.

    ring_bases: list[rings] of GEJ (first member of each ring).
    Returns pubs as a list[npub] of GE (batch-affine converted)."""
    import jax
    from .borromean import _flat_meta

    step0 = G.gej_neg(G.gej_from_ge(genp))
    for _ in range(layout.exp):
        t = G.gej_double(step0)
        step0 = G.gej_add(G.gej_double(G.gej_double(t)), t)  # *10

    ring_id, eidx, is_last, _ = _flat_meta(layout.rsizes)
    bx = jnp.stack([F.FP.norm_if_needed(b.x).v for b in ring_bases], 0)
    by = jnp.stack([F.FP.norm_if_needed(b.y).v for b in ring_bases], 0)
    bz = jnp.stack([F.FP.norm_if_needed(b.z).v for b in ring_bases], 0)
    binf = jnp.stack([b.inf for b in ring_bases], 0)

    def body(carry, xs):
        prev, step = carry
        rbx, rby, rbz, rbinf, eid, last = xs
        ring_base = G.GEJ(LB(rbx, MASK16), LB(rby, MASK16),
                          LB(rbz, MASK16), rbinf)
        nxt = G.gej_add(prev, step)
        cur = G.gej_select(eid == 0, ring_base, nxt)
        # between rings: step *= 4
        stepped = G.gej_double(G.gej_double(step))
        step = G.gej_select(last, stepped, step)
        out = (F.FP.norm_if_needed(cur.x).v, F.FP.norm_if_needed(cur.y).v,
               F.FP.norm_if_needed(cur.z).v, cur.inf)
        return (cur, step), out

    batch = genp.batch_shape
    init = (G.gej_infinity(batch), step0)
    xs = (bx[np.array(ring_id)], by[np.array(ring_id)],
          bz[np.array(ring_id)], binf[np.array(ring_id)],
          jnp.asarray(eidx), jnp.asarray(is_last))
    _, (ox, oy, oz, oinf) = jax.lax.scan(body, init, xs)
    all_j = G.GEJ(LB(ox, MASK16), LB(oy, MASK16), LB(oz, MASK16), oinf)
    all_aff = G.ge_from_gej_batch(all_j, axis=0)
    return [G.GE(LB(all_aff.x.v[i], MASK16), LB(all_aff.y.v[i], MASK16),
                 all_aff.inf[i]) for i in range(layout.npub)]


# ---------------------------------------------------------------------------
# Sign
# ---------------------------------------------------------------------------


def sign_core(layout: Layout, v_digits, min_values_u64, blind32, nonce32,
              commit: G.GE, genp: G.GE, header, prep, extra_commit=None,
              table=None):
    """Device core of rangeproof sign (rangeproof_sign_impl,
    rangeproof_impl.h:192).

    v_digits: list[rings] of [...] int32 (base-4 digits of v = secidx);
    min_values_u64: unused on device (already inside header);
    header: [..., header_len] uint8; prep: [..., npub*32] uint8 with the
    message + value-sidechannel already embedded (host: make_prep).

    Returns (signs_bits [..., rings-1] bool, inner_x [..., (rings-1)*32],
    e0 [...,32], s bytes [..., npub*32], ok)."""
    batch = blind32.shape[:-1]
    rings = layout.rings
    rsizes = layout.rsizes

    # m-hash transcript
    stream = H.Sha256Stream(batch)
    stream.write(_ser_rp(commit))
    stream.write(_ser_rp(genp))
    stream.write(header)

    sec, s_list, prep2, ok = _genrand(layout, nonce32, commit, genp,
                                      header, prep)

    # k_i = random s at the secret index; that slot is rewritten later.
    k = []
    for i in range(rings):
        ki = s_list[4 * i]
        for j in range(1, rsizes[i]):
            ki = S.select(v_digits[i] == j, s_list[4 * i + j], ki)
        k.append(ki)

    blind, b_ovf = S.from_bytes_be(blind32)
    sec[rings - 1] = S.normalize(S.add(sec[rings - 1], blind))
    ok = ok & ~b_ovf & ~S.is_zero(sec[rings - 1])

    # digit commitments pubs[base_i] = sec_i*G + digit*scale*4^i * genp,
    # as one scan over rings (compile-size: one pedersen body).
    import jax
    digit_scalars = []
    for i in range(rings):
        scale4i = (layout.scale << (2 * i)) & U64
        vals = [0, scale4i, 2 * scale4i, 3 * scale4i]
        digit_scalars.append(_u64_scalar(vals, v_digits[i]).v)
    sec_stack = jnp.stack([s.v for s in sec], 0)
    dig_stack = jnp.stack(digit_scalars, 0)

    def ring_body(carry, xs):
        sec_v, dig_v = xs
        vj = ecmult.ecmult_const(LB(dig_v, MASK16), genp)
        rj = ecmult.ecmult_gen(LB(sec_v, MASK16), table)
        bp = G.gej_add(rj, vj)
        return carry, (F.FP.norm_if_needed(bp.x).v,
                       F.FP.norm_if_needed(bp.y).v,
                       F.FP.norm_if_needed(bp.z).v, bp.inf)

    _, (bpx, bpy, bpz, bpinf) = jax.lax.scan(
        ring_body, 0, (sec_stack, dig_stack))
    ring_bases = [G.GEJ(LB(bpx[i], MASK16), LB(bpy[i], MASK16),
                        LB(bpz[i], MASK16), bpinf[i])
                  for i in range(rings)]
    signs = []
    inner_x = []
    # serialize the inner (first rings-1) base points; one shared batch
    # affine conversion
    inner_aff = G.ge_from_gej_batch(
        G.GEJ(LB(bpx[:rings - 1] if rings > 1 else bpx[:0], MASK16),
              LB(bpy[:rings - 1] if rings > 1 else bpy[:0], MASK16),
              LB(bpz[:rings - 1] if rings > 1 else bpz[:0], MASK16),
              bpinf[:rings - 1] if rings > 1 else bpinf[:0]),
        axis=0) if rings > 1 else None
    for i in range(rings):
        ok = ok & ~ring_bases[i].inf
        if i < rings - 1:
            c = G.GE(LB(inner_aff.x.v[i], MASK16),
                     LB(inner_aff.y.v[i], MASK16), inner_aff.inf[i])
            ser = _ser_rp(c)
            stream.write(ser)
            signs.append(ser[..., 0] == 1)
            inner_x.append(ser[..., 1:])

    # fill in the rest of each ring; batch-affine inside
    pubs_aff = _pub_expand(ring_bases, layout, genp)

    if extra_commit is not None:
        stream.write(extra_commit)
    m32 = H.words_to_bytes32(stream.finalize_words())

    e0, s_out, b_ok = borromean.sign(k, sec, s_list, pubs_aff, rsizes,
                                     v_digits, m32, table)
    ok = ok & b_ok
    s_bytes = jnp.concatenate([S.to_bytes_be(S.normalize(s))
                               for s in s_out], axis=-1)
    signs_arr = (jnp.stack(signs, axis=-1) if signs
                 else jnp.zeros((*batch, 0), bool))
    inner = (jnp.concatenate(inner_x, axis=-1) if inner_x
             else jnp.zeros((*batch, 0), jnp.uint8))
    return signs_arr, inner, e0, s_bytes, ok


def make_prep(layout: Layout, vs: np.ndarray, messages=None) -> np.ndarray:
    """Host: the prep buffer with message and the value sidechannel
    (rangeproof_impl.h:255-271). vs: [B] python-int array of v."""
    B = len(vs)
    npub = layout.npub
    prep = np.zeros((B, 128 * 32), np.uint8)
    if messages is not None:
        for b in range(B):
            m = messages[b]
            prep[b, :len(m)] = np.frombuffer(m, np.uint8)
    rings, rsizes = layout.rings, layout.rsizes
    if rsizes[rings - 1] > 1:
        for b in range(B):
            v = int(vs[b])
            idx = rsizes[rings - 1] - 1
            secidx_last = (v >> ((rings - 1) * 2)) & 3
            idx -= int(secidx_last == idx)
            idx = ((rings - 1) * 4 + idx) * 32
            vbytes = v.to_bytes(8, "big")
            prep[b, idx:idx + 8] = 0
            prep[b, idx] = 128
            for rep in (8, 16, 24):
                prep[b, idx + rep:idx + rep + 8] = \
                    np.frombuffer(vbytes, np.uint8)
    return prep[:, :npub * 32]


from functools import lru_cache


@lru_cache(maxsize=64)
def _sign_jit(layout: Layout, has_extra: bool):
    import jax

    if has_extra:
        def fn(digs, blind32, nonce32, commit, genp, header, prep, extra):
            return sign_core(layout, list(digs), None, blind32, nonce32,
                             commit, genp, header, prep, extra)
    else:
        def fn(digs, blind32, nonce32, commit, genp, header, prep):
            return sign_core(layout, list(digs), None, blind32, nonce32,
                             commit, genp, header, prep)
    return jax.jit(fn)


def sign(values, blinds32, nonces32, commits: G.GE, genp: G.GE,
         exp: int = 0, min_bits: int = 64, min_values=None,
         messages=None, extra_commit=None, table=None):
    """Batched rangeproof sign.  values/min_values: [B] numpy uint64-ish;
    all lanes share (exp, min_bits) and the resulting static layout
    (lanes are grouped by layout — the TPU-native granularity; per-lane
    layouts come from wrapping with batch=1).
    Returns (list[B] of proof bytes, ok)."""
    B = len(values)
    if min_values is None:
        min_values = np.zeros(B, np.uint64)
    vs, mvs = [], []
    mantissa = max(1, min_bits)
    eff_exp = None
    for b in range(B):
        pp = proveparams(int(values[b]), int(min_values[b]), exp, min_bits)
        assert pp is not None, "invalid range parameters"
        v, mv, man, e2 = pp
        vs.append(v)
        mvs.append(mv)
        mantissa = max(mantissa, man)
        assert eff_exp is None or eff_exp == e2, \
            "lanes disagree on effective exponent; split the batch"
        eff_exp = e2
    has_min = any(int(m) != 0 for m in mvs)
    layout = Layout(eff_exp, mantissa, has_min)
    hdr = header_bytes(layout, np.array(mvs, dtype=object))
    prep = make_prep(layout, vs, messages)
    digs = tuple(jnp.asarray(np.array([(v >> (2 * i)) & 3 for v in vs],
                                      np.int32))
                 for i in range(layout.rings))
    args = (digs, blinds32, nonces32, commits, genp,
            jnp.asarray(hdr.astype(np.uint8)), jnp.asarray(prep))
    if extra_commit is not None:
        args = args + (extra_commit,)
    signs_arr, inner, e0, s_bytes, ok = _sign_jit(
        layout, extra_commit is not None)(*args)
    # host assembly
    signs_np = np.asarray(signs_arr)
    inner_np = np.asarray(inner)
    e0_np = np.asarray(e0)
    s_np = np.asarray(s_bytes)
    proofs = []
    rings = layout.rings
    for b in range(B):
        p = bytearray(hdr[b].tobytes())
        nsign_bytes = (rings + 6) >> 3
        sb = bytearray(nsign_bytes)
        for i in range(rings - 1):
            if signs_np[b, i]:
                sb[i >> 3] |= 1 << (i & 7)
        p += sb
        p += inner_np[b].tobytes()
        p += e0_np[b].tobytes()
        p += s_np[b].tobytes()
        proofs.append(bytes(p))
    return proofs, np.asarray(ok)


# ---------------------------------------------------------------------------
# Verify
# ---------------------------------------------------------------------------


def verify_core(layout: Layout, header, signs_bits, inner_x, e0, s_bytes,
                min_value_scalars, commit: G.GE, genp: G.GE,
                extra_commit=None, table=None, return_evalues=False):
    """Device core of rangeproof verify (rangeproof_verify_impl).

    signs_bits: [..., rings-1] bool; inner_x: [..., (rings-1)*32] uint8;
    s_bytes: [..., npub*32]; min_value_scalars: scalar LB of min_value.
    """
    batch = e0.shape[:-1]
    rings, rsizes = layout.rings, layout.rsizes
    ok = jnp.ones(batch, bool)

    stream = H.Sha256Stream(batch)
    stream.write(_ser_rp(commit))
    stream.write(_ser_rp(genp))
    stream.write(header)

    # parse inner pubs (x + quadness sign); sqrt lifts batched over the
    # ring axis in one vectorized call (compile-size)
    accj = ecmult.ecmult_const(min_value_scalars, genp)
    ring_bases = []
    if rings > 1:
        xb_all = inner_x.reshape(*batch, rings - 1, 32)
        xb_m = jnp.moveaxis(xb_all, -2, 0)          # [rings-1, ..., 32]
        x_all, xovf = F.from_bytes_be(xb_m)
        y_all, y_ok = F.sqrt(F.add(F.mul(F.sqr(x_all), x_all),
                                   F.fe(F.B_COEFF)))
        y_all = F.normalize(y_all)
        sbits = jnp.moveaxis(signs_bits, -1, 0)      # [rings-1, ...]
        y_all = F.normalize(F.select(sbits, F.neg(y_all), y_all))
        ok = ok & jnp.all(~xovf & y_ok, axis=0)
        for i in range(rings - 1):
            xb = inner_x[..., 32 * i:32 * (i + 1)]
            c = G.GE(LB(x_all.v[i], MASK16), LB(y_all.v[i], MASK16),
                     ~y_ok[i])
            stream.write(signs_bits[..., i].astype(jnp.uint8)[..., None])
            stream.write(xb)
            ring_bases.append(G.gej_from_ge(c))
            accj = G.gej_add_ge(accj, c)
    accj = G.gej_neg(accj)
    last = G.gej_add_ge(accj, commit)
    ok = ok & ~last.inf
    ring_bases.append(last)

    pubs_aff = _pub_expand(ring_bases, layout, genp)

    if extra_commit is not None:
        stream.write(extra_commit)
    m32 = H.words_to_bytes32(stream.finalize_words())

    s_list = []
    for i in range(layout.npub):
        s, ovf = S.from_bytes_be(s_bytes[..., 32 * i:32 * (i + 1)])
        ok = ok & ~ovf
        s_list.append(s)

    if return_evalues:
        v_ok, ev = borromean.verify(e0, s_list, pubs_aff, rsizes, m32,
                                    table, return_evalues=True)
        return ok & v_ok, ev, s_list
    v_ok = borromean.verify(e0, s_list, pubs_aff, rsizes, m32, table)
    return ok & v_ok


def _split_proof(proof: bytes):
    """Host: header-parse + split one proof into device tensors.
    Returns (layout, parts dict) or None."""
    ph = parse_header(proof)
    if ph is None:
        return None
    off, exp, mantissa, scale, min_value, max_value, has_min = ph
    layout = Layout(exp if exp >= 0 else 0, mantissa, has_min)
    rings, npub = layout.rings, layout.npub
    need = 32 * (npub + rings - 1) + 32 + ((rings + 6) >> 3)
    if len(proof) - off < need:
        return None
    header = proof[:off]
    sb = proof[off:off + ((rings + 6) >> 3)]
    off2 = off + ((rings + 6) >> 3)
    signs = [(sb[i >> 3] >> (i & 7)) & 1 for i in range(rings - 1)]
    if (rings - 1) & 7:
        if (sb[-1] >> ((rings - 1) & 7)) != 0:
            return None
    inner = proof[off2:off2 + 32 * (rings - 1)]
    off2 += 32 * (rings - 1)
    e0 = proof[off2:off2 + 32]
    off2 += 32
    s = proof[off2:off2 + 32 * npub]
    off2 += 32 * npub
    if off2 != len(proof):
        return None
    return layout, {
        "header": header, "signs": signs, "inner": inner, "e0": e0,
        "s": s, "min_value": min_value, "max_value": max_value,
        "scale": scale, "off": off,
    }


@lru_cache(maxsize=64)
def _verify_jit(layout: Layout, has_extra: bool):
    import jax

    if has_extra:
        def fn(header, signs, inner, e0, s_bytes, mv, commit, genp, extra):
            return verify_core(layout, header, signs, inner, e0, s_bytes,
                               mv, commit, genp, extra)
    else:
        def fn(header, signs, inner, e0, s_bytes, mv, commit, genp):
            return verify_core(layout, header, signs, inner, e0, s_bytes,
                               mv, commit, genp)
    return jax.jit(fn)


def info(proof: bytes):
    """Header-only query (secp256k1_rangeproof_info,
    modules/rangeproof/main_impl.h): returns
    (exp, mantissa, min_value, max_value) or None."""
    ph = parse_header(proof)
    if ph is None:
        return None
    _off, exp, mantissa, _scale, min_value, max_value, _hm = ph
    return exp, mantissa, min_value, max_value


@lru_cache(maxsize=64)
def _rewind_jit(layout: Layout, has_extra: bool):
    """Device core for rewind: verify-with-evalues + genrand replay."""
    import jax

    def fn(header, signs, inner, e0, s_bytes, mv, commit, genp, nonce32,
           *extra):
        ok, ev, s_list = verify_core(
            layout, header, signs, inner, e0, s_bytes, mv, commit, genp,
            extra[0] if extra else None, return_evalues=True)
        prep0 = jnp.zeros((*e0.shape[:-1], layout.npub * 32), jnp.uint8)
        sec, s_orig, prep, g_ok = _genrand(layout, nonce32, commit, genp,
                                           header, prep0)
        return (ok, g_ok,
                jnp.stack([S.normalize(e).v for e in ev], 0),
                jnp.stack([S.normalize(s).v for s in s_list], 0),
                jnp.stack([S.normalize(x).v for x in sec], 0),
                jnp.stack([S.normalize(x).v for x in s_orig], 0),
                prep)

    return jax.jit(fn)


def _lane_int(stacked_v, i, lane):
    """stacked_v: [n, B, 16] device; -> python int of element [i, lane]."""
    from ..ops.limb import limbs_to_int_np
    return limbs_to_int_np(np.asarray(stacked_v)[i, lane])


def rewind(proofs: list[bytes], nonces32, commits: G.GE, genp: G.GE,
           extra_commit=None, table=None):
    """Batched rangeproof rewind (rangeproof_rewind_inner,
    rangeproof_impl.h:364-485): verify AND recover (blind, value,
    message) using the original nonce.

    Returns (ok [B] bool, blinds [B] bytes32|None, values [B] int|None,
    messages [B] bytes|None, min_values, max_values).
    """
    parts = [_split_proof(p) for p in proofs]
    B = len(proofs)
    okh = np.array([p is not None for p in parts])
    blinds: list = [None] * B
    values: list = [None] * B
    messages: list = [None] * B
    min_out = np.zeros(B, object)
    max_out = np.zeros(B, object)
    if not okh.any():
        return okh, blinds, values, messages, min_out, max_out
    layout = next(p[0] for p in parts if p is not None)
    for p in parts:
        assert p is None or p[0] == layout, \
            "rewind() batches must share a proof layout"
    idx = [i for i in range(B) if parts[i] is not None]

    def stackb(key):
        return jnp.asarray(np.stack(
            [np.frombuffer(parts[i][1][key], np.uint8) for i in idx]))

    header = stackb("header")
    inner = stackb("inner") if layout.rings > 1 else \
        jnp.zeros((len(idx), 0), jnp.uint8)
    e0 = stackb("e0")
    s_bytes = stackb("s")
    signs = jnp.asarray(np.array(
        [[bool(b) for b in parts[i][1]["signs"]] for i in idx],
        bool).reshape(len(idx), layout.rings - 1))
    mv_scalar = LB(jnp.asarray(np.array(
        [[(int(parts[i][1]["min_value"]) >> (16 * k)) & 0xFFFF
          for k in range(16)] for i in idx], np.uint32)), MASK16)

    def pick(ge, indices):
        return G.GE(LB(ge.x.v[np.array(indices)], ge.x.bound),
                    LB(ge.y.v[np.array(indices)], ge.y.bound),
                    ge.inf[np.array(indices)])

    sub_commits = pick(commits, idx) if commits.batch_shape else commits
    sub_genp = genp if genp.batch_shape == () else pick(genp, idx)
    nonce_arr = jnp.asarray(nonces32)[np.array(idx)]

    args = (header, signs, inner, e0, s_bytes, mv_scalar, sub_commits,
            sub_genp, nonce_arr)
    if extra_commit is not None:
        args = args + (extra_commit,)
    (v_ok, g_ok, ev_st, s_st, sec_st, sorig_st, prep) = _rewind_jit(
        layout, extra_commit is not None)(*args)

    v_ok = np.asarray(v_ok) & np.asarray(g_ok)
    ev_np, s_np = np.asarray(ev_st), np.asarray(s_st)
    sec_np, sorig_np = np.asarray(sec_st), np.asarray(sorig_st)
    prep_np = np.asarray(prep)
    rings, rsizes = layout.rings, layout.rsizes

    from ..ops.limb import limbs_to_int_np

    def ints(stacked, i, lane):
        return limbs_to_int_np(stacked[i, lane])

    for li, b in enumerate(idx):
        if not v_ok[li]:
            okh[b] = False
            continue
        min_out[b] = parts[b][1]["min_value"]
        max_out[b] = parts[b][1]["max_value"]
        scale = parts[b][1]["scale"]
        n = S.N
        if rings == 1 and rsizes[0] == 1:
            # only the blinding factor is recoverable
            e = ints(ev_np, 0, li)
            x = (ints(sorig_np, 0, li) - ints(s_np, 0, li)) * \
                pow(e, -1, n) % n
            blinds[b] = int(x).to_bytes(32, "big")
            values[b] = 0
            messages[b] = b""
            continue
        npub0 = (rings - 1) << 2
        found_j = None
        value = None
        prep_lane = prep_np[li].copy()
        for j in range(2):
            slot = npub0 + rsizes[rings - 1] - 1 - j
            tmp = (int(ints(s_np, slot, li)).to_bytes(32, "big"))
            blk = prep_lane[32 * slot:32 * (slot + 1)].tobytes()
            t = bytes(a ^ c for a, c in zip(tmp, blk))
            if (t[0] & 128) and t[16:24] == t[24:32] and t[8:16] == t[16:24]:
                value = int.from_bytes(t[24:32], "big")
                prep_lane[32 * slot:32 * (slot + 1)] = \
                    np.frombuffer(t, np.uint8)
                found_j = j
                break
        if found_j is None:
            okh[b] = False
            continue
        skip1 = rsizes[rings - 1] - 1 - found_j
        skip2 = (value >> ((rings - 1) << 1)) & 3
        if skip1 == skip2:
            okh[b] = False
            continue
        skip1 += (rings - 1) << 2
        skip2 += (rings - 1) << 2
        e2 = ints(ev_np, skip2, li)
        x = (ints(sorig_np, skip2, li) - ints(s_np, skip2, li)) * \
            pow(e2, -1, n) % n
        blind = (x - ints(sec_np, rings - 1, li)) % n
        blinds[b] = int(blind).to_bytes(32, "big")
        values[b] = value * scale + int(parts[b][1]["min_value"])
        # message recovery
        msg = bytearray()
        np_i = 0
        for i in range(rings):
            didx = (value >> (i << 1)) & 3
            for jj in range(rsizes[i]):
                if np_i in (skip1, skip2):
                    np_i += 1
                    continue
                if didx == jj:
                    st = (ints(s_np, np_i, li) +
                          ints(sec_np, i, li) * ints(ev_np, np_i, li)) % n
                else:
                    st = ints(s_np, np_i, li)
                blk = prep_lane[32 * np_i:32 * (np_i + 1)].tobytes()
                t = bytes(a ^ c for a, c in zip(
                    int(st).to_bytes(32, "big"), blk))
                msg += t
                np_i += 1
        messages[b] = bytes(msg)
    return okh, blinds, values, messages, min_out, max_out


def verify(proofs: list[bytes], commits: G.GE, genp: G.GE,
           extra_commit=None, table=None):
    """Batched verify of same-layout proofs.
    Returns (ok [B], min_values [B], max_values [B])."""
    parts = [_split_proof(p) for p in proofs]
    B = len(proofs)
    okh = np.array([p is not None for p in parts])
    if not okh.any():
        return okh, np.zeros(B, object), np.zeros(B, object)
    layout = next(p[0] for p in parts if p is not None)
    for p in parts:
        assert p is None or p[0] == layout, \
            "verify() batches must share a proof layout"
    idx = [i for i in range(B) if parts[i] is not None]

    def stackb(key, nbytes):
        return jnp.asarray(np.stack(
            [np.frombuffer(parts[i][1][key], np.uint8) for i in idx]))

    header = stackb("header", layout.header_len)
    inner = stackb("inner", 32 * (layout.rings - 1))
    e0 = stackb("e0", 32)
    s_bytes = stackb("s", 32 * layout.npub)
    signs = jnp.asarray(np.array(
        [[bool(b) for b in parts[i][1]["signs"]] for i in idx],
        bool).reshape(len(idx), layout.rings - 1))
    mvs = [parts[i][1]["min_value"] for i in idx]
    mv_scalar = LB(jnp.asarray(np.array(
        [[(int(m) >> (16 * k)) & 0xFFFF for k in range(16)]
         for m in mvs], np.uint32)), MASK16)

    def pick(ge, indices):
        return G.GE(LB(ge.x.v[np.array(indices)], ge.x.bound),
                    LB(ge.y.v[np.array(indices)], ge.y.bound),
                    ge.inf[np.array(indices)])

    sub_commits = pick(commits, idx)
    sub_genp = genp if genp.batch_shape == () or \
        genp.x.v.shape[0] != B else pick(genp, idx)

    ok_dev = _verify_jit(layout, extra_commit is not None)(
        header, signs, inner, e0, s_bytes, mv_scalar, sub_commits,
        sub_genp, *(() if extra_commit is None else (extra_commit,)))
    ok = okh.copy()
    ok[np.array(idx)] &= np.asarray(ok_dev)
    min_out = np.zeros(B, object)
    max_out = np.zeros(B, object)
    for i in range(B):
        if parts[i] is not None:
            min_out[i] = parts[i][1]["min_value"]
            max_out[i] = parts[i][1]["max_value"]
    return ok, min_out, max_out


def max_size(max_value: int, min_bits: int) -> int:
    """Upper bound on proof size (secp256k1_rangeproof_max_size,
    modules/rangeproof/main_impl.h:94-104)."""
    val_mantissa = max_value.bit_length() if max_value > 0 else 1
    mantissa = max(min_bits, val_mantissa)
    rings = (mantissa + 1) // 2
    npubs = rings * 4 - 2 * (mantissa % 2)
    return 10 + 32 * (npubs + rings - 1) + 32 + ((rings - 1 + 7) // 8)
