"""Batched ECDSA over secp256k1, TPU-native.

Counterpart of the reference's ECDSA core (src/ecdsa_impl.h) and API
layer (src/secp256k1.c:417-513,562-664), including RFC6979 deterministic
nonces, low-S normalization, recovery-id computation and public-key
recovery (src/modules/recovery/main_impl.h:87-121).

Batched-first: all byte tensors are [..., 32] uint8; results carry an
``ok`` validity mask instead of int return codes.  Signature compact
form is (r32 || s32); DER codecs live on host in utils/der.py (the
host/device seam of SURVEY.md §7.2.4).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import ecmult
from ..ops import field as F
from ..ops import group as G
from ..ops import scalar as S
from ..ops import sha256 as H
from ..ops.limb import LB, MASK16

# fe-representable bound: r + n < p  <=>  r < p - n.
_P_MINUS_N = F.P - S.N


def rfc6979_nonce(msg32, sec32, counter_rounds: int = 2):
    """Batched RFC6979 candidates; returns ([rounds, ..., 8] words).

    Matches nonce_function_rfc6979 with no extra data
    (src/secp256k1.c:519-560): key = sec32||msg32."""
    kw = jnp.concatenate([H.bytes32_to_words(sec32),
                          H.bytes32_to_words(msg32)], axis=-1)
    drbg = H.RFC6979(kw)
    outs = [drbg.generate32() for _ in range(counter_rounds)]
    return jnp.stack(outs, axis=0)


def _pick_nonce(nonces_words):
    """Select the first candidate that is nonzero and < n, as the
    reference's retry loop does (secp256k1.c:585-634).  Two candidates
    cover failure probability ~2^-127."""
    chosen = None
    chosen_ok = None
    for i in range(nonces_words.shape[0]):
        b = H.words_to_bytes32(nonces_words[i])
        k, ovf = S.from_bytes_be(b)
        ok = ~ovf & ~S.is_zero(k)
        if chosen is None:
            chosen, chosen_ok = k, ok
        else:
            take = ~chosen_ok & ok
            chosen = S.select(take, k, chosen)
            chosen_ok = chosen_ok | ok
    return chosen, chosen_ok


def sign_scalars(m: LB, d: LB, k: LB, table=None, sc=S):
    """Sign core on parsed scalars (ecdsa_sig_sign, src/ecdsa_impl.h:274):
    R = k*G, r = x(R) mod n (+overflow flag), s = k^-1 (m + r d), low-S
    normalization, recovery id.  ``sc`` is the scalar engine — the real
    GF(n) by default, a tiny-order SmallScalar under the exhaustive
    harness (the analog of recompiling with scalar_low).

    Returns (r LB, s LB, recid [...] int32, ok [...] bool)."""
    rj = ecmult.ecmult_gen(k, table)
    R = G.ge_from_gej(rj)
    rx = F.normalize(R.x)
    ry_odd = F.is_odd(R.y)

    # r = R.x mod n; overflow flag = (R.x >= n)
    r, r_ovf = sc.from_bytes_be(F.to_bytes_be(rx))

    kinv = sc.inv(k)
    s = sc.mul(kinv, sc.add(m, sc.mul(r, d)))
    s = sc.normalize(s)

    high = sc.is_high(s)
    s = sc.select(high, sc.normalize(sc.neg(s)), s)
    recid = (jnp.where(r_ovf, 2, 0) | ry_odd.astype(jnp.int32)) \
        ^ high.astype(jnp.int32)
    ok = ~sc.is_zero(r) & ~sc.is_zero(s)
    return r, s, recid, ok


def sign(msg32, sec32, table=None):
    """Deterministic ECDSA sign (cf. ecdsa_sig_sign, src/ecdsa_impl.h:274).

    Returns (sig64 [...,64] uint8, recid [...] int32, ok [...] bool).
    Low-S normalized; recid as in the reference (bit0: R.y odd, bit1:
    R.x >= n), both adjusted by the low-S negation."""
    d, d_ovf = S.from_bytes_be(sec32)
    d_ok = ~d_ovf & ~S.is_zero(d)

    k, k_ok = _pick_nonce(rfc6979_nonce(msg32, sec32))
    m, _ = S.from_bytes_be(msg32)

    r, s, recid, sig_ok = sign_scalars(m, d, k, table)
    ok = d_ok & k_ok & sig_ok
    sig64 = jnp.concatenate([S.to_bytes_be(r), S.to_bytes_be(s)], axis=-1)
    sig64 = jnp.where(ok[..., None], sig64, jnp.zeros_like(sig64))
    return sig64, recid, ok


def sig_parse_compact(sig64):
    """[..., 64] -> (r, s, ok).  ok false on r/s overflow (cf.
    ecdsa_signature_parse_compact, secp256k1.c:417)."""
    r, rovf = S.from_bytes_be(sig64[..., :32])
    s, sovf = S.from_bytes_be(sig64[..., 32:])
    return r, s, ~rovf & ~sovf


def verify_scalars(m: LB, r: LB, s: LB, pub: G.GE, table=None,
                   enforce_low_s: bool = True, sc=S):
    """Core verification on parsed scalars (cf. ecdsa_sig_verify,
    src/ecdsa_impl.h:195-272).  Returns a bool lane mask.  ``sc`` is the
    scalar engine; under a tiny-order engine the x(R) check switches to
    the full affine-x-mod-order comparison, exactly as the reference's
    EXHAUSTIVE_TEST_ORDER branch does (src/ecdsa_impl.h:218-229)."""
    nonzero = ~sc.is_zero(r) & ~sc.is_zero(s)
    sinv = sc.inv(s)
    u1 = sc.mul(m, sinv)
    u2 = sc.mul(r, sinv)
    pr = ecmult.ecmult(u1, u2, pub, table)

    if sc.N.bit_length() <= 128:
        # tiny-order mode: h in x = r + h*n spans many values; compare
        # the affine x reduced mod the order instead.
        pr_ge = G.ge_from_gej(pr)
        computed_r, _ = sc.from_bytes_be(F.to_bytes_be(F.normalize(pr_ge.x)))
        ok = nonzero & ~pr.inf & sc.eq(r, computed_r) & ~pub.inf
        if enforce_low_s:
            ok = ok & ~sc.is_high(s)
        return ok

    # x(R) == r (mod n) without field inversion: check r and r+n as field
    # elements against X/Z^2 (src/ecdsa_impl.h:241-268).
    r_bytes = sc.to_bytes_be(r)
    xr, _ = F.from_bytes_be(r_bytes)
    match = G.gej_eq_x(pr, xr)
    # r + n representable iff r < p - n
    lt = _scalar_lt(r, F.P - sc.N)
    xr2 = F.norm_weak(F.add(xr, F.fe(sc.N)))
    match2 = G.gej_eq_x(pr, xr2) & lt
    ok = nonzero & ~pr.inf & (match | match2) & ~pub.inf
    if enforce_low_s:
        ok = ok & ~sc.is_high(s)
    return ok


def _scalar_lt(a: LB, c: int):
    """a < c for canonical a and Python-int c: a + (2^256 - c) < 2^256."""
    from ..ops.limb import _ks_carry, LIMBS
    import numpy as np
    comp = (1 << 256) - c
    arr = np.array([(comp >> (16 * i)) & 0xFFFF for i in range(LIMBS)],
                   dtype=np.uint32)
    _, carry = _ks_carry(a.v + jnp.asarray(arr))
    return carry == 0


def verify(msg32, sig64, pub: G.GE, table=None):
    """Batched ECDSA verify on compact signatures; low-S enforced like
    secp256k1_ecdsa_verify (secp256k1.c:498)."""
    m, _ = S.from_bytes_be(msg32)
    r, s, sig_ok = sig_parse_compact(sig64)
    return verify_scalars(m, r, s, pub, table) & sig_ok


def recover_scalars(m: LB, r: LB, s: LB, recid, table=None, sc=S,
                    b_coeff: int = F.B_COEFF):
    """Recovery core on parsed scalars (cf. ecdsa_sig_recover,
    src/modules/recovery/main_impl.h:87-121).  ``sc``/``b_coeff``
    parameterize the scalar engine and curve for the exhaustive
    tiny-order harness.  Returns (GE, ok)."""
    # x = r + n if recid bit1 else r, as a field element
    xr, _ = F.from_bytes_be(sc.to_bytes_be(r))
    add_n = (recid & 2) == 2
    xr_hi = F.norm_weak(F.add(xr, F.fe(sc.N)))
    x = F.select(add_n, xr_hi, xr)
    fits = jnp.where(add_n, _scalar_lt(r, F.P - sc.N), True)

    y2 = F.add(F.mul(F.sqr(x), x), F.fe(b_coeff))
    y, y_ok = F.sqrt(y2)
    y = F.normalize(y)
    want_odd = (recid & 1) == 1
    y = F.normalize(F.select(F.is_odd(y) != want_odd, F.neg(y), y))

    Rpt = G.GE(x, y, ~y_ok)
    rinv = sc.inv(r)
    u_point = sc.mul(rinv, s)                                # r^-1 * s
    u_gen = sc.normalize(sc.neg(sc.mul(rinv, m)))            # -r^-1 * m
    qj = ecmult.ecmult(u_gen, u_point, Rpt, table)
    ok = y_ok & fits & ~qj.inf & ~sc.is_zero(r) & ~sc.is_zero(s)
    return G.ge_from_gej(qj), ok


def recover(msg32, sig64, recid, table=None):
    """Recover pubkey from (sig, recid) (cf. ecdsa_sig_recover,
    src/modules/recovery/main_impl.h:87-121). Returns (GE, ok)."""
    r, s, sig_ok = sig_parse_compact(sig64)
    m, _ = S.from_bytes_be(msg32)
    q, ok = recover_scalars(m, r, s, recid, table)
    return q, ok & sig_ok


def signature_normalize(sig64):
    """Lower-S normalize (secp256k1_ecdsa_signature_normalize,
    secp256k1.c:476).  Returns (sig64_normalized, was_high [...] bool)."""
    r = sig64[..., :32]
    s, _ = S.from_bytes_be(sig64[..., 32:])
    high = S.is_high(s)
    s = S.select(high, S.normalize(S.neg(s)), S.normalize(s))
    return jnp.concatenate([r, S.to_bytes_be(s)], axis=-1), high


# ---------------------------------------------------------------------------
# TPU fast path: fused Pallas kernels (ops/pallas_group.py,
# ops/pallas_scalar.py) — limb-major layout, batch on the VPU lanes.
# ---------------------------------------------------------------------------


def _pallas_ok() -> bool:
    from ..config import config
    return config().pallas_enabled()


def _pad_to(v, mult, axis=-1):
    b = v.shape[axis]
    pad = (-b) % mult
    if pad == 0:
        return v
    widths = [(0, 0)] * v.ndim
    widths[axis] = (0, pad)
    return jnp.pad(v, widths)


def sign_tpu(msg32, sec32, tb: int | None = None, blind=None):
    """Batched deterministic ECDSA sign through the Pallas sign
    pipeline: RFC6979 in XLA (word-sliced SHA256 is lane-parallel and
    cheap), then the fixed-base k*G kernel (pallas_gen.ecmult_gen_tpu —
    the TPU re-expression of the ecmult_gen comb, ecmult_gen_impl.h:54)
    and one fused epilogue kernel (affine conversion, r = x(R) mod n,
    s = k^-1(m + r d), low-S, recid — ecdsa_impl.h:282-310).
    Semantics match :func:`sign`.  Requires a 1-D batch.
    ``blind`` is Context.blind generator-blinding state (or None)."""
    from ..ops import pallas_field as PF
    from ..ops import pallas_gen as PGEN

    B = msg32.shape[0]
    if tb is None:
        tb = PF.auto_tb(B)
    d, d_ovf = S.from_bytes_be(sec32)
    d_ok = ~d_ovf & ~S.is_zero(d)
    k, k_ok = _pick_nonce(rfc6979_nonce(msg32, sec32))
    m, _ = S.from_bytes_be(msg32)

    k_t = _pad_to(jnp.transpose(k.v), tb)
    m_t = _pad_to(jnp.transpose(m.v), tb)
    d_t = _pad_to(jnp.transpose(d.v), tb)
    x, y, z = PGEN.ecmult_gen_tpu(k_t, tb=tb, blind=blind)
    r_t, s_t, recid_t, fin_ok = PGEN.ecdsa_sign_finish_tpu(
        x, y, z, k_t, m_t, d_t, tb=tb)

    r = LB(jnp.transpose(r_t)[:B], MASK16)
    s = LB(jnp.transpose(s_t)[:B], MASK16)
    ok = d_ok & k_ok & fin_ok[:B]
    recid = recid_t[:B].astype(jnp.int32)
    sig64 = jnp.concatenate([S.to_bytes_be(r), S.to_bytes_be(s)], axis=-1)
    sig64 = jnp.where(ok[..., None], sig64, jnp.zeros_like(sig64))
    return sig64, recid, ok


def verify_tpu(msg32, sig64, pub: G.GE, tb: int | None = None):
    """Batched verify through the fused Pallas pipeline: one *prep*
    kernel (s^-1 Fermat chain, u1/u2, GLV lambda split, digit streams —
    pallas_scalar.ecdsa_prep_tpu) and one *ecmult* kernel (GLV Strauss
    with the x(R)===r check fused into the epilogue —
    pallas_group.ecmult_glv_tpu).  No 256-bit multiply runs in the XLA
    glue.  Semantics identical to :func:`verify` (low-S enforced).
    Requires a 1-D batch; pads internally to a multiple of ``tb``."""
    from ..ops import pallas_field as PF
    from ..ops import pallas_gen as PGEN
    from ..ops import pallas_group as PG
    from ..ops import pallas_scalar as PS

    B = msg32.shape[0]
    if tb is None:
        tb = PF.auto_tb(B)
    m, _ = S.from_bytes_be(msg32)
    r, s, sig_ok = sig_parse_compact(sig64)
    nonzero = ~S.is_zero(r) & ~S.is_zero(s)

    m_t = _pad_to(jnp.transpose(m.v), tb)
    r_t = _pad_to(jnp.transpose(r.v), tb)
    s_t = _pad_to(jnp.transpose(s.v), tb)
    digs, gdigs, flags = PS.ecdsa_prep_tpu(m_t, r_t, s_t, tb=tb)
    gjac = PGEN.fixedbase_digits_tpu(gdigs, tb=tb)

    px = _pad_to(jnp.transpose(F.normalize(pub.x).v), tb)
    py = _pad_to(jnp.transpose(F.normalize(pub.y).v), tb)
    pinf = _pad_to(pub.inf, tb, axis=0)
    _, _, _, _, ok = PG.ecmult_glv_tpu(digs, flags, px, py, pinf, gjac,
                                       rx=r_t, tb=tb)
    ok = ok[:B] & nonzero & ~pub.inf & ~S.is_high(s)
    return ok & sig_ok
