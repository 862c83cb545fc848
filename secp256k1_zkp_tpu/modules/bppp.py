"""Bulletproofs++ scaffolding: generator sets and the norm-argument
prover/verifier, batched for TPU.

Counterpart of the reference bppp module (src/modules/bppp/main_impl.h,
bppp_norm_product_impl.h, bppp_transcript_impl.h, bppp_util.h;
include/secp256k1_bppp.h).  The norm argument proves
``<n, n>_mu + <c, l> = v`` for a commitment
``C = v*G + <n, G_vec> + <l, H_vec>`` in log-many halving rounds.

TPU shape: the scalar *vectors* of the protocol live on the vector axis
(axis 0) of batched LB tensors, so every per-element scalar mul / fold
is one VPU op, and every per-round multi-scalar multiplication routes
through the shared MSM engine (ops/msm.py) — the reference instead walks
callbacks point-by-point through ``ecmult_multi_var``
(bppp_norm_product_impl.h:145,300,310,531,543).  The round structure
(log2(max(g_len, h_len)) rounds) is static Python, so the whole prover
and verifier jit to fixed dataflow programs.

Proof layout (identical to the reference): rounds x 65 bytes
(packed-parity X,R point pair) then 32+32 bytes (final n, l scalars).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import ecmult
from ..ops import field as F
from ..ops import group as G
from ..ops import msm
from ..ops import scalar as S
from ..ops import sha256 as H
from ..ops.limb import LB, MASK16
from . import generator as gen_mod

# -- vector helpers (vector axis = axis 0) ----------------------------------


def _vec_sum(a: LB) -> LB:
    """Sum of scalar lanes along axis 0 (exact columnwise, then reduce)."""
    n = a.v.shape[0]
    assert a.bound * n <= 0xFFFFFFFF, "normalize before summing"
    if n == 0:
        return S.zero(a.v.shape[1:-1])
    return S.FN.norm_weak(LB(a.v.sum(axis=0), a.bound * n))


def _inner(a: LB, b: LB) -> LB:
    """<a, b> = sum a_i * b_i  (scalar_inner_product,
    bppp_norm_product_impl.h:24)."""
    return _vec_sum(S.mul(a, b))


def _mu_powers(mu: LB, n: int) -> LB:
    """[n, 16] powers mu^1..mu^n via log-depth doubling."""
    pows = LB(S.FN.norm_if_needed(mu).v[None], MASK16)
    while pows.v.shape[0] < n:
        last = LB(pows.v[-1], MASK16)
        ext = S.mul(pows, last)
        pows = LB(jnp.concatenate([pows.v, S.FN.norm_if_needed(ext).v],
                                  axis=0)[:n * 2], MASK16)
    return LB(pows.v[:n], MASK16)


def _weighted_inner(a: LB, b: LB, mu: LB) -> LB:
    """sum a_i * b_i * mu^(i+1)  (weighted_scalar_inner_product,
    bppp_norm_product_impl.h:47)."""
    n = a.v.shape[0]
    if n == 0:
        return S.zero(())
    w = _mu_powers(mu, n)
    return _vec_sum(S.mul(S.mul(a, b), w))


def _even(a: LB) -> LB:
    return LB(a.v[0::2], a.bound)


def _odd(a: LB) -> LB:
    return LB(a.v[1::2], a.bound)


def _ge_slice(g: G.GE, sl) -> G.GE:
    return G.GE(LB(g.x.v[sl], g.x.bound), LB(g.y.v[sl], g.y.bound),
                g.inf[sl])


def _ge_concat(a: G.GE, b: G.GE) -> G.GE:
    return G.GE(LB(jnp.concatenate([a.x.v, b.x.v], 0),
                   max(a.x.bound, b.x.bound)),
                LB(jnp.concatenate([a.y.v, b.y.v], 0),
                   max(a.y.bound, b.y.bound)),
                jnp.concatenate([a.inf, b.inf], 0))


def _lb_concat(a: LB, b: LB) -> LB:
    return LB(jnp.concatenate([a.v, b.v], 0), max(a.bound, b.bound))


def _bc(x: LB, batch_shape) -> LB:
    """Broadcast an unbatched scalar LB over a leading batch shape."""
    x = S.FN.norm_if_needed(x)
    return LB(jnp.broadcast_to(x.v, (*batch_shape, 16)), MASK16)


def _interleave_swapped(a: LB) -> LB:
    """[2k] -> [2k] with pairs swapped: out[2i] = a[2i+1], out[2i+1] = a[2i].
    The index pattern of ecmult_x_cb (bppp_norm_product_impl.h:163-184)."""
    k = a.v.shape[0] // 2
    pairs = a.v.reshape(k, 2, *a.v.shape[1:])
    return LB(pairs[:, ::-1].reshape(a.v.shape), a.bound)


# -- transcript (bppp_transcript_impl.h) -------------------------------------

TAG_COMMITMENT = "Bulletproofs_pp/v0/commitment"


def transcript_new(tag: str | None = TAG_COMMITMENT) -> H.Sha256Stream:
    """Fresh transcript.  tag=None gives a plain SHA256 state (the
    reference's standalone norm-arg tests use sha256_initialize)."""
    return H.Sha256Stream(batch_shape=(), tag=tag)


def _le64_bytes(n: int):
    return jnp.asarray(np.frombuffer(int(n).to_bytes(8, "little"),
                                     dtype=np.uint8))


def challenge_scalar(transcript: H.Sha256Stream, idx: int = 0) -> LB:
    """Finalize a copy of transcript||le64(idx) into a scalar
    (bppp_challenge_scalar, bppp_transcript_impl.h:25)."""
    sha = transcript.copy()
    sha.write(jnp.broadcast_to(_le64_bytes(idx),
                               (*sha.state.shape[:-1], 8)))
    k, _ = S.from_bytes_be(H.words_to_bytes32(sha.finalize_words()))
    return k


# -- point-pair codec (bppp_util.h:18-45) -------------------------------------


def serialize_points_pair(x_pt: G.GE, r_pt: G.GE):
    """(X, R) -> [..., 65] bytes: parity byte then two x coords; the
    point at infinity encodes as zero-x with parity bit 0."""
    def enc(p):
        xb = F.to_bytes_be(p.x)
        xb = jnp.where(p.inf[..., None], jnp.zeros_like(xb), xb)
        par = (F.is_odd(p.y) & ~p.inf).astype(jnp.uint8)
        return xb, par

    lx, lp = enc(x_pt)
    rx, rp = enc(r_pt)
    first = ((lp << 1) | rp)[..., None]
    return jnp.concatenate([first, lx, rx], axis=-1)


def parse_one_of_points(b65, idx: int):
    """Parse point ``idx`` (0=X, 1=R) out of a 65-byte pair. -> (GE, ok)."""
    first = jnp.asarray(b65[..., 0], jnp.uint32)
    xb = b65[..., 1 + 32 * idx:33 + 32 * idx]
    sign = (first >> (1 - idx)) & 1
    hdr_ok = first <= 3
    is_zero_x = jnp.all(jnp.asarray(xb, jnp.uint32) == 0, axis=-1)
    x, xovf = F.from_bytes_be(xb)
    y2 = F.norm_weak(F.add(F.mul(F.sqr(x), x), F.fe(F.B_COEFF)))
    y, y_ok = F.sqrt(y2)
    y = F.normalize(y)
    y = F.normalize(F.select(F.is_odd(y) != (sign == 1), F.neg(y), y))
    inf = is_zero_x
    ok = hdr_ok & jnp.where(is_zero_x, sign == 0, y_ok & ~xovf)
    return G.GE(x, y, inf), ok


# -- generator sets (main_impl.h:18-105) --------------------------------------


def generators_create(n: int):
    """n NUMS generators from the fixed RFC6979 stream seeded with
    G.x||G.y (bppp_generators_create, main_impl.h:18). -> GE [n].
    Jitted per n (one fixed program: DRBG chain + batched SvdW)."""
    import jax

    @jax.jit
    def go(seed):
        rng = H.RFC6979(keydata_bytes=seed)
        keys = [H.words_to_bytes32(rng.generate32()) for _ in range(n)]
        key32 = jnp.stack(keys, axis=0)  # [n, 32]
        gens, _ok = gen_mod.generator_generate(key32)
        return gens.x.v, gens.y.v, gens.inf

    seed = np.frombuffer(
        F.GX.to_bytes(32, "big") + F.GY.to_bytes(32, "big"), dtype=np.uint8)
    x, y, inf = go(jnp.asarray(seed))
    return G.GE(LB(x, MASK16), LB(y, MASK16), inf)


def generators_serialize(gens: G.GE):
    """GE [n] -> [n*33] bytes (33-byte generator serialization each)."""
    b = gen_mod.generator_serialize(gens)
    return b.reshape(-1)


def generators_parse(data):
    """[n*33] bytes -> (GE [n], ok [n])."""
    b = jnp.asarray(data, jnp.uint8).reshape(-1, 33)
    return gen_mod.generator_parse(b)


# -- commitment (bppp_commit, bppp_norm_product_impl.h:105) -------------------


def commit(gens: G.GE, n_vec: LB, l_vec: LB, c_vec: LB, mu: LB,
           table=None) -> G.GE:
    """C = v*G + <n_vec, G_vec> + <l_vec, H_vec> with
    v = <n,n>_mu + <l,c>.  gens: GE [g_len + h_len]."""
    g_len = n_vec.v.shape[0]
    v = S.add(_weighted_inner(n_vec, n_vec, mu), _inner(l_vec, c_vec))
    sc = _lb_concat(S.FN.norm_if_needed(n_vec), S.FN.norm_if_needed(l_vec))
    acc = msm.ecmult_multi(sc, gens)
    acc = G.gej_add(acc, ecmult.ecmult_gen(S.normalize(v), table))
    return G.ge_from_gej(acc)


# -- norm argument prover (bppp_norm_product_impl.h:223) ----------------------


def _msm_with_g(sc: LB, pts: G.GE, q: LB, table=None) -> G.GEJ:
    """sum sc_i * pts_i + q*G (the ecmult_multi shape used per round)."""
    acc = ecmult.ecmult_gen(S.normalize(q), table)
    if sc.v.shape[0]:
        acc = G.gej_add(acc, msm.ecmult_multi(S.FN.norm_if_needed(sc), pts))
    return acc


def norm_product_prove(transcript: H.Sha256Stream, rho: LB, gens: G.GE,
                       n_vec: LB, l_vec: LB, c_vec: LB, table=None):
    """Produce the norm-argument proof.  gens: GE [g_len + h_len];
    n_vec: LB [g_len]; l_vec/c_vec: LB [h_len]; lengths powers of two.

    Returns (proof bytes [65*rounds + 64] uint8, transcript).  Mirrors
    secp256k1_bppp_rangeproof_norm_product_prove
    (bppp_norm_product_impl.h:223-367) with vectorized folds.
    """
    g_len = n_vec.v.shape[0]
    h_len = l_vec.v.shape[0]
    assert c_vec.v.shape[0] == h_len
    assert gens.inf.shape[0] == g_len + h_len
    assert g_len & (g_len - 1) == 0 and h_len & (h_len - 1) == 0

    gs = _ge_slice(gens, slice(0, g_len))
    hs = _ge_slice(gens, slice(g_len, g_len + h_len))
    rho_f = S.FN.norm_if_needed(rho)
    mu_f = S.sqr(rho_f)
    n_vec = S.FN.norm_if_needed(n_vec)
    l_vec = S.FN.norm_if_needed(l_vec)
    c_vec = S.FN.norm_if_needed(c_vec)

    proof_parts = []
    while g_len > 1 or h_len > 1:
        rho_inv = S.inv(rho_f)
        mu_sq = S.sqr(mu_f)

        # X = x_v*G + sum(swap-scaled n over g) + sum(swapped l over h)
        c0_l1 = _inner(_even(c_vec), _odd(l_vec)) if h_len >= 2 else S.zero(())
        c1_l0 = _inner(_odd(c_vec), _even(l_vec)) if h_len >= 2 else S.zero(())
        if g_len >= 2:
            wip = _weighted_inner(_even(n_vec), _odd(n_vec), mu_sq)
            x_v = S.mul(wip, rho_inv)
            x_v = S.add(x_v, x_v)
        else:
            x_v = S.zero(())
        x_v = S.add(S.FN.norm_if_needed(x_v), S.add(c0_l1, c1_l0))

        sc_parts, pt_parts = [], []
        if g_len >= 2:
            # even idx: n[i+1]*rho_f; odd idx: n[i-1]*rho_inv
            swapped = _interleave_swapped(n_vec)
            fac = LB(jnp.where(
                (jnp.arange(g_len) % 2 == 0)[:, None],
                jnp.broadcast_to(S.FN.norm_if_needed(rho_f).v, (g_len, 16)),
                jnp.broadcast_to(S.FN.norm_if_needed(rho_inv).v, (g_len, 16))),
                MASK16)
            sc_parts.append(S.mul(swapped, fac))
            pt_parts.append(gs)
        if h_len >= 2:
            sc_parts.append(_interleave_swapped(l_vec))
            pt_parts.append(hs)
        if sc_parts:
            sc = sc_parts[0] if len(sc_parts) == 1 else \
                _lb_concat(S.FN.norm_if_needed(sc_parts[0]),
                           S.FN.norm_if_needed(sc_parts[1]))
            pts = pt_parts[0] if len(pt_parts) == 1 else \
                _ge_concat(pt_parts[0], pt_parts[1])
        else:
            sc = LB(jnp.zeros((0, 16), jnp.uint32), MASK16)
            pts = G.ge_infinity((0,))
        xj = _msm_with_g(sc, pts, x_v, table)

        # R = r_v*G + sum(n_odd over g_odd) + sum(l_odd over h_odd)
        r_v = S.add(
            S.FN.norm_if_needed(
                _weighted_inner(_odd(n_vec), _odd(n_vec), mu_sq)
                if g_len >= 2 else S.zero(())),
            _inner(_odd(c_vec), _odd(l_vec)) if h_len >= 2 else S.zero(()))
        sc_r, pt_r = [], []
        if g_len >= 2:
            sc_r.append(_odd(n_vec))
            pt_r.append(_ge_slice(gs, slice(1, None, 2)))
        if h_len >= 2:
            sc_r.append(_odd(l_vec))
            pt_r.append(_ge_slice(hs, slice(1, None, 2)))
        if sc_r:
            scr = sc_r[0] if len(sc_r) == 1 else \
                _lb_concat(S.FN.norm_if_needed(sc_r[0]),
                           S.FN.norm_if_needed(sc_r[1]))
            ptr = pt_r[0] if len(pt_r) == 1 else _ge_concat(pt_r[0], pt_r[1])
        else:
            scr = LB(jnp.zeros((0, 16), jnp.uint32), MASK16)
            ptr = G.ge_infinity((0,))
        rj = _msm_with_g(scr, ptr, r_v, table)

        # serialize (X, R), extend transcript, pull challenge
        both = G.ge_from_gej_batch(G.GEJ(
            LB(jnp.stack([F.FP.norm_if_needed(xj.x).v,
                          F.FP.norm_if_needed(rj.x).v], 0), MASK16),
            LB(jnp.stack([F.FP.norm_if_needed(xj.y).v,
                          F.FP.norm_if_needed(rj.y).v], 0), MASK16),
            LB(jnp.stack([F.FP.norm_if_needed(xj.z).v,
                          F.FP.norm_if_needed(rj.z).v], 0), MASK16),
            jnp.stack([xj.inf, rj.inf], 0)))
        x_ge = G.GE(LB(F.normalize(both.x).v[0], MASK16),
                    LB(F.normalize(both.y).v[0], MASK16), both.inf[0])
        r_ge = G.GE(LB(F.normalize(both.x).v[1], MASK16),
                    LB(F.normalize(both.y).v[1], MASK16), both.inf[1])
        chunk = serialize_points_pair(x_ge, r_ge)
        proof_parts.append(chunk)
        transcript.write(chunk)
        gamma = challenge_scalar(transcript, 0)

        if g_len > 1:
            # n' = n_even*rho_inv + n_odd*gamma; g' = g_even*rho_f + g_odd*gamma
            n_vec = S.FN.norm_weak(S.add(S.mul(_even(n_vec), rho_inv),
                                         S.mul(_odd(n_vec), gamma)))
            half = (g_len // 2,)
            gl = ecmult.ecmult_const(_bc(rho_f, half),
                                     _ge_slice(gs, slice(0, None, 2)))
            gr = ecmult.ecmult_const(_bc(gamma, half),
                                     _ge_slice(gs, slice(1, None, 2)))
            gs = G.ge_from_gej_batch(G.gej_add(gl, gr))
        if h_len > 1:
            c_vec = S.FN.norm_weak(S.add(_even(c_vec),
                                         S.mul(_odd(c_vec), gamma)))
            l_vec = S.FN.norm_weak(S.add(_even(l_vec),
                                         S.mul(_odd(l_vec), gamma)))
            hr = ecmult.ecmult_const(_bc(gamma, (h_len // 2,)),
                                     _ge_slice(hs, slice(1, None, 2)))
            hs = G.ge_from_gej_batch(
                G.gej_add_ge(hr, _ge_slice(hs, slice(0, None, 2))))
        g_len //= 2
        h_len //= 2
        rho_f = mu_f
        mu_f = mu_sq

    tail = jnp.concatenate([
        S.to_bytes_be(LB(S.FN.norm_if_needed(n_vec).v[0], MASK16)),
        S.to_bytes_be(LB(S.FN.norm_if_needed(l_vec).v[0], MASK16))], axis=-1)
    proof_parts.append(tail)
    return jnp.concatenate(proof_parts, axis=-1), transcript


# -- norm argument verifier (bppp_norm_product_impl.h:425) --------------------


def _log2i(n: int) -> int:
    return n.bit_length() - 1


def norm_product_verify(proof, transcript: H.Sha256Stream, rho: LB,
                        gens: G.GE, g_len: int, c_vec: LB,
                        commit_pt: G.GE, table=None):
    """Verify a norm-argument proof. -> bool scalar (device).

    proof: [65*rounds + 64] uint8; gens: GE [g_len + h_len];
    c_vec: LB [h_len].  Static sizes; returns False (not an error) on
    any parse/structure failure, matching the reference's 0-returns.
    """
    h_len = c_vec.v.shape[0]
    if g_len == 0 or h_len == 0 or \
            (g_len & (g_len - 1)) or (h_len & (h_len - 1)) or \
            gens.inf.shape[0] != g_len + h_len:
        return jnp.asarray(False)
    log_g, log_h = _log2i(g_len), _log2i(h_len)
    n_rounds = max(log_g, log_h)
    proof = jnp.asarray(proof, jnp.uint8)
    if proof.shape[-1] != 65 * n_rounds + 64:
        return jnp.asarray(False)

    n_sc, n_ovf = S.from_bytes_be(proof[65 * n_rounds:65 * n_rounds + 32])
    l_sc, l_ovf = S.from_bytes_be(proof[65 * n_rounds + 32:])
    ok = ~n_ovf & ~l_ovf & ~S.is_zero(rho)

    # challenges
    gammas = []
    for i in range(n_rounds):
        transcript.write(proof[65 * i:65 * (i + 1)])
        gammas.append(challenge_scalar(transcript, 0))

    rho_inv = S.inv(S.FN.norm_if_needed(rho))
    rho_inv_pows = [rho_inv]
    for _ in range(1, log_g):
        rho_inv_pows.append(S.sqr(rho_inv_pows[-1]))
    rho_f = S.FN.norm_if_needed(rho)
    for _ in range(log_g):
        rho_f = S.sqr(rho_f)

    # s_g[i] = n * rho_f * rho_inv * prod_{j in bits(i)} gamma_j*rho_inv^(2^j)
    s_g = LB(S.FN.norm_if_needed(
        S.mul(S.mul(n_sc, rho_f), rho_inv)).v[None], MASK16)
    for j in range(log_g):
        fac = S.mul(gammas[j], rho_inv_pows[j])
        s_g = _lb_concat(s_g, S.FN.norm_weak(S.mul(s_g, fac)))
    # s_h[i] = l * prod_{j in bits(i)} gamma_j
    s_h = LB(S.FN.norm_if_needed(l_sc).v[None], MASK16)
    for j in range(log_h):
        s_h = _lb_concat(s_h, S.FN.norm_weak(S.mul(s_h, gammas[j])))

    h_c = _inner(c_vec, s_h)
    mu_f = S.sqr(rho_f)
    v = S.add(S.FN.norm_if_needed(S.mul(S.mul(n_sc, n_sc), mu_f)),
              S.FN.norm_if_needed(h_c))

    # res1 = commit + sum gamma_i*X_i + (gamma_i^2 - 1)*R_i
    res1 = G.gej_from_ge(commit_pt)
    for i in range(n_rounds):
        chunk = proof[65 * i:65 * (i + 1)]
        x_pt, x_ok = parse_one_of_points(chunk, 0)
        r_pt, r_ok = parse_one_of_points(chunk, 1)
        ok = ok & x_ok & r_ok
        gi = gammas[i]
        gi2m1 = S.sub(S.sqr(gi), S.one(()))
        res1 = G.gej_add(res1, ecmult.ecmult_const(gi, x_pt))
        res1 = G.gej_add(res1, ecmult.ecmult_const(
            S.normalize(gi2m1), r_pt))

    # res2 = v*G + <s_g, G_vec> + <s_h, H_vec>
    res2 = _msm_with_g(_lb_concat(s_g, s_h), gens, v, table)

    return ok & G.gej_eq(res1, res2)


# -- jitted entry points ------------------------------------------------------
#
# The recursion above is pure dataflow with static sizes, so each
# (g_len, h_len, tag) instance compiles to ONE fixed XLA program.  These
# wrappers are what callers should use: one compile per size (persistent
# across processes via the JAX compilation cache) instead of per-op
# dispatch of the eager path.

from functools import lru_cache
import jax as _jax


@lru_cache(maxsize=32)
def _prove_jit(g_len: int, h_len: int, tag: str | None):
    def fn(rho, gens, n_vec, l_vec, c_vec):
        proof, _ = norm_product_prove(transcript_new(tag), rho, gens,
                                      n_vec, l_vec, c_vec)
        return proof
    return _jax.jit(fn)


def prove(rho: LB, gens: G.GE, n_vec: LB, l_vec: LB, c_vec: LB,
          tag: str | None = TAG_COMMITMENT):
    """Jitted norm-argument prove with a fresh transcript."""
    return _prove_jit(n_vec.v.shape[0], l_vec.v.shape[0], tag)(
        rho, gens, n_vec, l_vec, c_vec)


@lru_cache(maxsize=32)
def _verify_jit(g_len: int, h_len: int, tag: str | None):
    def fn(proof, rho, gens, c_vec, commit_pt):
        return norm_product_verify(proof, transcript_new(tag), rho, gens,
                                   g_len, c_vec, commit_pt)
    return _jax.jit(fn)


def verify(proof, rho: LB, gens: G.GE, g_len: int, c_vec: LB,
           commit_pt: G.GE, tag: str | None = TAG_COMMITMENT):
    """Jitted norm-argument verify with a fresh transcript."""
    h_len = c_vec.v.shape[0]
    if g_len == 0 or h_len == 0 or (g_len & (g_len - 1)) or \
            (h_len & (h_len - 1)) or gens.inf.shape[0] != g_len + h_len:
        return jnp.asarray(False)
    n_rounds = max(_log2i(g_len), _log2i(h_len))
    proof = jnp.asarray(proof, jnp.uint8)
    if proof.shape[-1] != 65 * n_rounds + 64:
        return jnp.asarray(False)
    return _verify_jit(g_len, h_len, tag)(proof, rho, gens, c_vec,
                                          commit_pt)


@lru_cache(maxsize=32)
def _commit_jit(g_len: int, h_len: int):
    def fn(gens, n_vec, l_vec, c_vec, mu):
        c = commit(gens, n_vec, l_vec, c_vec, mu)
        return c.x.v, c.y.v, c.inf
    return _jax.jit(fn)


def commit_jitted(gens: G.GE, n_vec: LB, l_vec: LB, c_vec: LB,
                  mu: LB) -> G.GE:
    x, y, inf = _commit_jit(n_vec.v.shape[0], l_vec.v.shape[0])(
        gens, n_vec, l_vec, c_vec, mu)
    return G.GE(LB(x, MASK16), LB(y, MASK16), inf)
