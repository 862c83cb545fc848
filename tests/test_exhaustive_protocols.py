"""Exhaustive tiny-order protocol model checking: the REAL ecmult
engines and ECDSA/Schnorr module code run over the order-13 test group
with the scalar engine swapped for ops/small_scalar.SmallScalar — the
TPU-native analog of recompiling the reference with
EXHAUSTIVE_TEST_ORDER (src/tests_exhaustive.c:136-330,
src/modules/recovery/tests_exhaustive_impl.h,
src/modules/schnorrsig/tests_exhaustive_impl.h).

Every (scalar, point) combination is enumerated as ONE batched lane
array — the loops of the reference become lanes.

Group constants are the sage-generated public values from the
reference (src/group_impl.h:23-28,60: order 13 on y^2 = x^3 + 2);
their claimed properties are re-verified from scratch below.
"""

import hashlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from secp256k1_zkp_tpu.ops import ecmult, field as F, group as G
from secp256k1_zkp_tpu.ops.limb import LB, MASK16, limbs_to_int_np
from secp256k1_zkp_tpu.ops.small_scalar import SmallScalar
from secp256k1_zkp_tpu.modules import ecdsa, schnorrsig

P = F.P
ORDER = 13
CURVE_B = 2
G13_X = 0xa2482ff84bf34edfa51262fde57921dbe0dd2cb7a5914790bc71631fc09704fb
G13_Y = 0x942536cba3e494923a701cc3ee3e443fdf182aa915b8aa6a166d3b19ba84b045

SMALL = SmallScalar(ORDER)


def _host_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2 and (y1 + y2) % P == 0:
        return None
    if a == b:
        lam = (3 * x1 * x1) * pow(2 * y1, P - 2, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, P - 2, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


@pytest.fixture(scope="module")
def group():
    """group[i] = i * G13 (index 0 = infinity), verified from scratch."""
    assert (G13_Y * G13_Y - G13_X ** 3 - CURVE_B) % P == 0
    pts = [None]
    cur = None
    g = (G13_X, G13_Y)
    for _ in range(ORDER - 1):
        cur = _host_add(cur, g)
        pts.append(cur)
    assert _host_add(cur, g) is None, "generator order != 13"
    assert len({p for p in pts if p}) == ORDER - 1
    return pts


@pytest.fixture(scope="module")
def table():
    return ecmult.GenTable(gen=(G13_X, G13_Y))


def mk_sc(vals):
    """ints mod ORDER -> canonical LB batch."""
    arr = np.zeros((len(vals), 16), np.uint32)
    arr[:, 0] = np.asarray(vals, np.uint32) % ORDER
    return LB(jnp.asarray(arr), MASK16)


def mk_ge(idx, group):
    xs = np.zeros((len(idx), 16), np.uint32)
    ys = np.zeros((len(idx), 16), np.uint32)
    infs = np.zeros(len(idx), bool)
    for k, i in enumerate(idx):
        if group[i % ORDER] is None:
            infs[k] = True
            continue
        x, y = group[i % ORDER]
        for l in range(16):
            xs[k, l] = (x >> (16 * l)) & 0xFFFF
            ys[k, l] = (y >> (16 * l)) & 0xFFFF
    return G.GE(LB(jnp.asarray(xs), MASK16), LB(jnp.asarray(ys), MASK16),
                jnp.asarray(infs))


def assert_points(j, expect_idx, group):
    a = jax.jit(G.ge_from_gej)(j)
    xs = np.asarray(F.normalize(a.x).v)
    ys = np.asarray(F.normalize(a.y).v)
    infs = np.asarray(a.inf)
    for lane, ei in enumerate(expect_idx):
        want = group[ei % ORDER]
        if want is None:
            assert infs[lane], lane
        else:
            assert not infs[lane], lane
            assert (limbs_to_int_np(xs[lane]),
                    limbs_to_int_np(ys[lane])) == want, lane


def _r_from_k(group, k):
    """r = x(k*G) mod order + overflow flag (r_from_k,
    tests_exhaustive.c:228)."""
    if group[k % ORDER] is None:
        return 0, False
    x = group[k % ORDER][0]
    return x % ORDER, x >= ORDER


@pytest.mark.slow
def test_exhaustive_ecmult(group, table):
    """u1*G + u2*P over every (u1, u2, P) combination
    (test_exhaustive_ecmult, tests_exhaustive.c:136)."""
    lanes = [(i, j, r_log)
             for r_log in range(1, ORDER)
             for j in range(ORDER)
             for i in range(ORDER)]
    u2 = mk_sc([l[0] for l in lanes])      # point scalar
    u1 = mk_sc([l[1] for l in lanes])      # gen scalar
    pts = mk_ge([l[2] for l in lanes], group)
    got = jax.jit(lambda a, b, p: ecmult.ecmult(a, b, p, table))(u1, u2, pts)
    assert_points(got, [(i * r + j) % ORDER for i, j, r in lanes], group)


@pytest.mark.slow
def test_exhaustive_ecmult_const_and_xonly(group):
    lanes = [(i, j) for j in range(ORDER) for i in range(ORDER)]
    ks = mk_sc([j for i, j in lanes])
    pts = mk_ge([i for i, j in lanes], group)
    got = jax.jit(ecmult.ecmult_const)(ks, pts)
    assert_points(got, [(i * j) % ORDER for i, j in lanes], group)

    # x-only over every nonzero (point, scalar) pair
    lanes = [(i, j) for j in range(1, ORDER) for i in range(1, ORDER)]
    ks = mk_sc([j for i, j in lanes])
    xs = mk_ge([i for i, j in lanes], group).x
    x_out, ok = jax.jit(lambda k, x: ecmult.ecmult_const_xonly(
        k, x, b_coeff=CURVE_B))(ks, xs)
    assert np.asarray(ok).all()
    xv = np.asarray(x_out.v)
    for lane, (i, j) in enumerate(lanes):
        assert limbs_to_int_np(xv[lane]) == group[(i * j) % ORDER][0], lane


@pytest.mark.slow
def test_exhaustive_ecdsa_sign_and_recover(group, table):
    """Every (msg, key, nonce) triple through the real sign core, with
    hand-computed expectations (test_exhaustive_sign,
    tests_exhaustive.c:291; recid checks per
    modules/recovery/tests_exhaustive_impl.h:13-80), then public-key
    recovery of every valid signature."""
    lanes = [(m, d, k)
             for m in range(1, ORDER)
             for d in range(1, ORDER)
             for k in range(1, ORDER)]
    m = mk_sc([l[0] for l in lanes])
    d = mk_sc([l[1] for l in lanes])
    k = mk_sc([l[2] for l in lanes])
    r, s, recid, ok = jax.jit(lambda m, d, k: ecdsa.sign_scalars(
        m, d, k, table, sc=SMALL))(m, d, k)
    rv = np.asarray(r.v)[:, 0]
    sv = np.asarray(s.v)[:, 0]
    recv = np.asarray(recid)
    okv = np.asarray(ok)

    for lane, (mi, di, ki) in enumerate(lanes):
        exp_r, ovf = _r_from_k(group, ki)
        s_raw = pow(ki, -1, ORDER) * (mi + exp_r * di) % ORDER
        if exp_r == 0 or s_raw == 0:
            assert not okv[lane], lane
            continue
        assert okv[lane], lane
        assert rv[lane] == exp_r, lane
        high = s_raw > (ORDER - 1) // 2
        assert sv[lane] == (ORDER - s_raw if high else s_raw), lane
        y_odd = group[ki][1] & 1
        exp_recid = ((2 if ovf else 0) | y_odd) ^ high
        assert recv[lane] == exp_recid, lane

    # recover every valid signature back to its public key
    q, rec_ok = jax.jit(lambda m, r, s, recid: ecdsa.recover_scalars(
        m, r, s, recid, table, sc=SMALL, b_coeff=CURVE_B))(
            m, r, s, jnp.asarray(recv))
    xs = np.asarray(jax.jit(lambda v: F.normalize(v).v)(q.x))
    ys = np.asarray(jax.jit(lambda v: F.normalize(v).v)(q.y))
    rec_okv = np.asarray(rec_ok)
    for lane, (mi, di, ki) in enumerate(lanes):
        if not okv[lane]:
            continue
        # recid bit1 conveys overflow, which at tiny order cannot encode
        # floor(x/order) (recovery/tests_exhaustive_impl.h:45-50): only
        # lanes where x = r + order*(recid>>1) exactly can recover.
        x_true = group[ki][0]
        h = recv[lane] >> 1
        if x_true != (rv[lane] + ORDER * h):
            continue
        assert rec_okv[lane], lane
        assert (limbs_to_int_np(xs[lane]),
                limbs_to_int_np(ys[lane])) == group[di], lane


@pytest.mark.slow
def test_exhaustive_ecdsa_verify(group, table):
    """Every (s, r, msg, key) quadruple vs a hand-computed acceptance
    predicate (test_exhaustive_verify, tests_exhaustive.c:236)."""
    lanes = [(s, r, m, d)
             for s in range(1, ORDER)
             for r in range(1, ORDER)
             for m in range(1, ORDER)
             for d in range(1, ORDER)]
    s = mk_sc([l[0] for l in lanes])
    r = mk_sc([l[1] for l in lanes])
    m = mk_sc([l[2] for l in lanes])
    pub = mk_ge([l[3] for l in lanes], group)
    got = np.asarray(jax.jit(lambda m, r, s, pub: ecdsa.verify_scalars(
        m, r, s, pub, table, sc=SMALL))(m, r, s, pub))

    # hand predicate: some nonce k gives this r and k*s == m + r*d
    r_of_k = [_r_from_k(group, k)[0] for k in range(ORDER)]
    for lane, (si, ri, mi, di) in enumerate(lanes):
        should = any(r_of_k[k] == ri and (k * si) % ORDER ==
                     (mi + ri * di) % ORDER for k in range(ORDER))
        should = should and not si > (ORDER - 1) // 2
        assert got[lane] == should, (lane, si, ri, mi, di)


def _host_tagged(tag: bytes, msg: bytes) -> bytes:
    th = hashlib.sha256(tag).digest()
    return hashlib.sha256(th + th + msg).digest()


@pytest.mark.slow
def test_exhaustive_schnorrsig(group, table):
    """Every (key, nonce) pair through the real BIP-340 sign with a
    forced smallint nonce, several messages each; verify acceptance of
    exactly the expected s and rejection of a perturbed s
    (modules/schnorrsig/tests_exhaustive_impl.h:141-186, with the
    random-message challenge sweep shrunk to a fixed message set)."""
    n_msgs = 4
    rng = np.random.default_rng(7)
    msgs = [rng.bytes(32) for _ in range(n_msgs)]

    # parity/xonly data for the whole group
    x_bytes = [None] + [group[i][0].to_bytes(32, "big")
                        for i in range(1, ORDER)]
    parity = [None] + [group[i][1] & 1 for i in range(1, ORDER)]

    lanes = [(d, k, mi)
             for d in range(1, ORDER)
             for k in range(1, ORDER)
             for mi in range(n_msgs)]
    sec = np.zeros((len(lanes), 32), np.uint8)
    nonce = np.zeros((len(lanes), 32), np.uint8)
    msg = np.zeros((len(lanes), 32), np.uint8)
    for lane, (d, k, mi) in enumerate(lanes):
        sec[lane, 31] = d
        nonce[lane, 31] = k
        msg[lane] = np.frombuffer(msgs[mi], np.uint8)

    sig, ok = jax.jit(lambda m, s, n: schnorrsig.sign(
        m, s, table=table, sc=SMALL, nonce32=n))(
            jnp.asarray(msg), jnp.asarray(sec), jnp.asarray(nonce))
    sigv = np.asarray(sig)
    assert np.asarray(ok).all()

    exp_sig = np.zeros_like(sigv)
    for lane, (d, k, mi) in enumerate(lanes):
        actual_d = ORDER - d if parity[d] else d
        actual_k = ORDER - k if parity[k] else k
        e = int.from_bytes(_host_tagged(
            b"BIP0340/challenge",
            x_bytes[k] + x_bytes[d] + msgs[mi]), "big") % ORDER
        s_exp = (actual_k + e * actual_d) % ORDER
        exp_sig[lane, :32] = np.frombuffer(x_bytes[k], np.uint8)
        exp_sig[lane, 60:] = np.frombuffer(
            s_exp.to_bytes(4, "big"), np.uint8)
    assert (sigv == exp_sig).all()

    # verify accepts every signature against the signer's xonly key
    px = np.zeros((len(lanes), 32), np.uint8)
    for lane, (d, k, mi) in enumerate(lanes):
        px[lane] = np.frombuffer(x_bytes[d], np.uint8)
    ver = np.asarray(jax.jit(lambda m, s, p: schnorrsig.verify(
        m, s, p, table=table, sc=SMALL, b_coeff=CURVE_B))(
            jnp.asarray(msg), jnp.asarray(sigv), jnp.asarray(px)))
    assert ver.all()

    # a perturbed s must always be rejected (exactly-one-valid-s rule)
    bad = sigv.copy()
    bad[:, 63] = (bad[:, 63] + 1) % ORDER
    ver_bad = np.asarray(jax.jit(lambda m, s, p: schnorrsig.verify(
        m, s, p, table=table, sc=SMALL, b_coeff=CURVE_B))(
            jnp.asarray(msg), jnp.asarray(bad), jnp.asarray(px)))
    assert not ver_bad.any()

    # s >= order (stored big-endian) must be rejected
    bad2 = sigv.copy()
    bad2[:, 33] = 1  # s += 2^240 -> overflow flag
    ver_bad2 = np.asarray(jax.jit(lambda m, s, p: schnorrsig.verify(
        m, s, p, table=table, sc=SMALL, b_coeff=CURVE_B))(
            jnp.asarray(msg), jnp.asarray(bad2), jnp.asarray(px)))
    assert not ver_bad2.any()


def test_exhaustive_extrakeys(group, table):
    """keypair/xonly sweep at order 13
    (modules/extrakeys/tests_exhaustive_impl.h): xonly pubkey bytes ==
    group[i].x, parity == oddness of group[i].y, the high-half mirror
    symmetry, parse/serialize round-trip, and the even-y secret fold."""
    secs = np.zeros((ORDER - 1, 32), np.uint8)
    for i in range(1, ORDER):
        secs[i - 1, 31] = i
    d_even, px32, pk_even, parity, ok = jax.jit(
        lambda s: schnorrsig.keypair_xonly(s, table, sc=SMALL))(
        jnp.asarray(secs))
    assert np.asarray(ok).all()
    px = np.asarray(px32)
    par = np.asarray(parity)
    de = np.asarray(d_even.v)[:, 0]
    for i in range(1, ORDER):
        x, y = group[i]
        assert px[i - 1].tobytes() == x.to_bytes(32, "big"), i
        assert bool(par[i - 1]) == bool(y & 1), i
        assert int(de[i - 1]) == (ORDER - i if (y & 1) else i), i
    # mirror: i and ORDER-i share the x coordinate; parities flip
    for i in range(ORDER // 2 + 1, ORDER):
        j = ORDER - i
        assert (px[i - 1] == px[j - 1]).all(), i
        assert bool(par[i - 1]) != bool(par[j - 1]), i
    # xonly parse (lift on the tiny curve) -> serialize round-trip
    ge, lok = jax.jit(lambda p: schnorrsig.lift_x(p, b_coeff=CURVE_B))(
        jnp.asarray(px))
    assert np.asarray(lok).all()
    rt = np.asarray(jax.jit(F.to_bytes_be)(ge.x))
    assert (rt == px).all()


@pytest.mark.slow
def test_exhaustive_ellswift(group, table):
    """create -> decode round-trip for every subgroup scalar at order
    13 (modules/ellswift/tests_exhaustive_impl.h — like the reference,
    this checks the subgroup's points through the full curve-level
    SwiftEC maps on y^2 = x^3 + 2)."""
    from secp256k1_zkp_tpu.modules import ellswift

    secs = np.zeros((ORDER - 1, 32), np.uint8)
    for i in range(1, ORDER):
        secs[i - 1, 31] = i
    ell, ok = jax.jit(lambda s: ellswift.create(s, table=table,
                                                b=CURVE_B))(
        jnp.asarray(secs))
    assert np.asarray(ok).all()
    ge, dok = jax.jit(lambda e: ellswift.decode(e, b=CURVE_B))(ell)
    assert np.asarray(dok).all()
    xs = np.asarray(jax.jit(lambda v: F.normalize(v).v)(ge.x))
    ys = np.asarray(jax.jit(lambda v: F.normalize(v).v)(ge.y))
    for i in range(1, ORDER):
        x, y = group[i]
        assert limbs_to_int_np(xs[i - 1]) == x, i
        assert limbs_to_int_np(ys[i - 1]) == y, i
