"""Parity tests for the TPU-only Pallas fast paths against the host
oracle.  These need real TPU hardware (Mosaic kernels): run with

    SECP_TPU_TEST_PLATFORM=tpu python -m pytest tests/test_pallas_tpu.py

On the default CPU suite they skip (the same algebra is covered by the
jnp-path tests; kernels and jnp path share formulas, and test_glv.py
checks the split helpers directly on CPU).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import oracle
from secp256k1_zkp_tpu.utils import hostcurve

pytestmark = pytest.mark.skipif(
    jax.default_backend() in ("cpu",),
    reason="Mosaic kernels need TPU; CPU suite covers the jnp path")

B = 512  # one kernel block (tb=512): smallest compile


@pytest.fixture(scope="module")
def ecdsa_batch(rng):
    msgs = np.zeros((B, 32), np.uint8)
    sigs = np.zeros((B, 64), np.uint8)
    pub65 = np.zeros((B, 65), np.uint8)
    expect = np.zeros(B, bool)
    for i in range(B):
        d = int.from_bytes(rng.bytes(32), "big") % hostcurve.N or 1
        msg = rng.bytes(32)
        r_, s_, _rec = oracle.ecdsa_sign(msg, d)
        sig = bytearray(r_.to_bytes(32, "big") + s_.to_bytes(32, "big"))
        P = hostcurve.mul(d)
        pub65[i, 0] = 4
        pub65[i, 1:33] = np.frombuffer(P[0].to_bytes(32, "big"), np.uint8)
        pub65[i, 33:] = np.frombuffer(P[1].to_bytes(32, "big"), np.uint8)
        good = True
        if i % 5 == 1:
            sig[40] ^= 1
            good = False
        elif i % 5 == 2:
            msg = bytes([msg[0] ^ 0x80]) + msg[1:]
            good = False
        elif i % 5 == 3:  # high-s rejection
            s2 = hostcurve.N - s_
            sig[32:] = s2.to_bytes(32, "big")
            good = False
        msgs[i] = np.frombuffer(msg, np.uint8)
        sigs[i] = np.frombuffer(bytes(sig), np.uint8)
        expect[i] = good
    return msgs, sigs, pub65, expect


def test_ecdsa_verify_tpu(ecdsa_batch):
    from secp256k1_zkp_tpu.modules import ecdsa
    from secp256k1_zkp_tpu.modules.eckey import pubkey_parse
    msgs, sigs, pub65, expect = ecdsa_batch
    pub, pok = pubkey_parse(jnp.asarray(pub65))
    assert np.asarray(pok).all()
    ok = np.asarray(jax.block_until_ready(
        ecdsa.verify_tpu(jnp.asarray(msgs), jnp.asarray(sigs), pub)))
    assert (ok == expect).all()


def test_schnorr_verify_tpu(rng):
    from secp256k1_zkp_tpu.modules import schnorrsig
    msgs = np.zeros((B, 32), np.uint8)
    sigs = np.zeros((B, 64), np.uint8)
    pxs = np.zeros((B, 32), np.uint8)
    expect = np.zeros(B, bool)
    for i in range(B):
        d = int.from_bytes(rng.bytes(32), "big") % hostcurve.N or 1
        msg = rng.bytes(32)
        sig = bytearray(oracle.schnorr_sign(msg, d))
        P = hostcurve.mul(d)
        if P[1] & 1:
            d = hostcurve.N - d
            P = hostcurve.mul(d)
        good = True
        if i % 4 == 1:
            sig[50] ^= 4
            good = False
        elif i % 4 == 2:
            msg = bytes([msg[3] ^ 1]) + msg[1:31] + bytes([msg[31]])
            good = False
        msgs[i] = np.frombuffer(msg, np.uint8)
        sigs[i] = np.frombuffer(bytes(sig), np.uint8)
        pxs[i] = np.frombuffer(P[0].to_bytes(32, "big"), np.uint8)
        expect[i] = good
    ok = np.asarray(jax.block_until_ready(schnorrsig.verify_tpu(
        jnp.asarray(msgs), jnp.asarray(sigs), jnp.asarray(pxs))))
    assert (ok == expect).all()


def test_batch_verify_tpu(rng):
    """batch_verify_tpu: accepts a valid batch, matches batch_verify
    and per-sig verify_tpu, rejects corrupted lanes, and rejects the
    round-4 two-lane cancellation forgery (VERDICT r4)."""
    from secp256k1_zkp_tpu.modules import schnorrsig
    n = B
    msgs = np.zeros((n, 32), np.uint8)
    sigs = np.zeros((n, 64), np.uint8)
    pxs = np.zeros((n, 32), np.uint8)
    for i in range(n):
        d = int.from_bytes(rng.bytes(32), "big") % hostcurve.N or 1
        msg = rng.bytes(32)
        sig = oracle.schnorr_sign(msg, d)
        P = hostcurve.mul(d)
        msgs[i] = np.frombuffer(msg, np.uint8)
        sigs[i] = np.frombuffer(sig, np.uint8)
        pxs[i] = np.frombuffer(P[0].to_bytes(32, "big"), np.uint8)
    m_j, s_j, p_j = jnp.asarray(msgs), jnp.asarray(sigs), jnp.asarray(pxs)

    bfn = jax.jit(schnorrsig.batch_verify_tpu)
    assert bool(np.asarray(bfn(m_j, s_j, p_j)))
    # parity: per-signature kernel verify and the jnp batch path agree
    assert np.asarray(schnorrsig.verify_tpu(m_j, s_j, p_j)).all()
    assert bool(np.asarray(jax.jit(schnorrsig.batch_verify)(
        m_j, s_j, p_j)))

    # corrupted-lane negatives: s half, r half, msg, pk
    for (row, col) in [(3, 40), (5, 2), (-1, -1), (7, 0)]:
        m2, s2, p2 = np.array(msgs), np.array(sigs), np.array(pxs)
        if (row, col) == (-1, -1):
            m2[11, 4] ^= 0x20
        elif col == 0:
            p2[row, 16] ^= 1
        else:
            s2[row, col] ^= 1
        assert not bool(np.asarray(bfn(
            jnp.asarray(m2), jnp.asarray(s2), jnp.asarray(p2)))), \
            (row, col)

    # the round-4 cancellation forgery: s_0 += z_1*t, s_1 -= t with z
    # computed on the unmodified batch (the attacker's best guess now
    # that z binds every s) must be rejected
    z = np.asarray(schnorrsig._batch_randomizers(m_j, s_j, p_j,
                                                 None, n).v)
    z1 = sum(int(z[1, i]) << (16 * i) for i in range(16))
    t = 0xDEADBEEF
    s0 = int.from_bytes(bytes(sigs[0, 32:]), "big")
    s1 = int.from_bytes(bytes(sigs[1, 32:]), "big")
    sf = np.array(sigs)
    sf[0, 32:] = np.frombuffer(
        ((s0 + z1 * t) % hostcurve.N).to_bytes(32, "big"), np.uint8)
    sf[1, 32:] = np.frombuffer(
        ((s1 - t) % hostcurve.N).to_bytes(32, "big"), np.uint8)
    assert not bool(np.asarray(bfn(m_j, jnp.asarray(sf), p_j)))


def test_pedersen_commit_tpu(rng):
    from secp256k1_zkp_tpu.modules import generator as gen_mod
    from secp256k1_zkp_tpu.ops import field as F, group as G

    key = np.frombuffer(rng.bytes(32), np.uint8).reshape(1, 32)
    Hgen_j, okg = gen_mod.generator_generate(jnp.asarray(np.repeat(key, B,
                                                                   0)))
    blinds = np.zeros((B, 32), np.uint8)
    vhi = rng.integers(0, 2 ** 32, B, dtype=np.uint64).astype(np.uint32)
    vlo = rng.integers(0, 2 ** 32, B, dtype=np.uint64).astype(np.uint32)
    for i in range(B):
        blinds[i] = np.frombuffer(rng.bytes(32), np.uint8)
    blinds[:, 0] &= 0x7F

    c33, ok = gen_mod.pedersen_commit_tpu(
        jnp.asarray(blinds), jnp.asarray(vhi), jnp.asarray(vlo), Hgen_j)
    c33 = np.asarray(jax.block_until_ready(c33))
    assert np.asarray(ok).all()

    # host oracle: commit = blind*G + v*H
    Hx = int.from_bytes(bytes(np.asarray(
        F.to_bytes_be(F.normalize(Hgen_j.x))[0])), "big")
    Hy = int.from_bytes(bytes(np.asarray(
        F.to_bytes_be(F.normalize(Hgen_j.y))[0])), "big")
    for i in range(0, B, 37):
        b = int.from_bytes(bytes(blinds[i]), "big") % hostcurve.N
        v = (int(vhi[i]) << 32) | int(vlo[i])
        C = hostcurve.add(hostcurve.mul(b),
                          hostcurve.mul(v, (Hx, Hy)))
        sq = pow(C[1], (hostcurve.P - 1) // 2, hostcurve.P) == 1
        want = bytes([8 if sq else 9]) + C[0].to_bytes(32, "big")
        assert bytes(c33[i]) == want, i


def test_ecdsa_sign_tpu(rng):
    """Kernel sign path is bit-exact vs the RFC6979 host oracle."""
    from secp256k1_zkp_tpu.modules import ecdsa
    msgs = np.zeros((B, 32), np.uint8)
    secs = np.zeros((B, 32), np.uint8)
    want_sig = np.zeros((B, 64), np.uint8)
    want_rec = np.zeros(B, np.int32)
    for i in range(B):
        d = int.from_bytes(rng.bytes(32), "big") % hostcurve.N or 1
        msg = rng.bytes(32)
        r_, s_, rec = oracle.ecdsa_sign(msg, d)
        msgs[i] = np.frombuffer(msg, np.uint8)
        secs[i] = np.frombuffer(d.to_bytes(32, "big"), np.uint8)
        want_sig[i] = np.frombuffer(
            r_.to_bytes(32, "big") + s_.to_bytes(32, "big"), np.uint8)
        want_rec[i] = rec
    sig, recid, ok = jax.block_until_ready(
        ecdsa.sign_tpu(jnp.asarray(msgs), jnp.asarray(secs)))
    assert np.asarray(ok).all()
    assert (np.asarray(sig) == want_sig).all()
    assert (np.asarray(recid) == want_rec).all()


def test_schnorr_sign_tpu(rng):
    """Kernel BIP-340 sign is bit-exact vs the host oracle."""
    from secp256k1_zkp_tpu.modules import schnorrsig
    msgs = np.zeros((B, 32), np.uint8)
    secs = np.zeros((B, 32), np.uint8)
    want = np.zeros((B, 64), np.uint8)
    for i in range(B):
        d = int.from_bytes(rng.bytes(32), "big") % hostcurve.N or 1
        msg = rng.bytes(32)
        msgs[i] = np.frombuffer(msg, np.uint8)
        secs[i] = np.frombuffer(d.to_bytes(32, "big"), np.uint8)
        want[i] = np.frombuffer(oracle.schnorr_sign(msg, d), np.uint8)
    sig, ok = jax.block_until_ready(
        schnorrsig.sign_tpu(jnp.asarray(msgs), jnp.asarray(secs)))
    assert np.asarray(ok).all()
    assert (np.asarray(sig) == want).all()


@pytest.mark.parametrize("N", [1024, 16384])
def test_msm_pippenger_tpu(rng, N):
    """Bucketed Pippenger at scale vs an analytic oracle: points are
    P_i = a_i*G (computed by the tested-elsewhere gen kernel), so
    sum k_i*P_i = (sum k_i a_i mod n)*G is one host point_mul."""
    import jax.numpy as jnp
    from secp256k1_zkp_tpu.ops import msm, field as F, group as G
    from secp256k1_zkp_tpu.ops import pallas_gen as PGEN
    from secp256k1_zkp_tpu.ops.limb import LB, MASK16, limbs_to_int_np

    a_int = [int.from_bytes(rng.bytes(32), "big") % hostcurve.N or 1
             for _ in range(N)]
    k_int = [int.from_bytes(rng.bytes(32), "big") % hostcurve.N
             for _ in range(N)]
    k_int[0] = 0

    def rows(vals):
        arr = np.zeros((16, len(vals)), np.uint32)
        for j, v in enumerate(vals):
            for i in range(16):
                arr[i, j] = (v >> (16 * i)) & 0xFFFF
        return jnp.asarray(arr)

    x, y, z = PGEN.ecmult_gen_tpu(rows(a_int))
    xa, ya = PGEN.affine_xy_tpu(x, y, z)
    pts = G.GE(LB(jnp.transpose(xa), MASK16), LB(jnp.transpose(ya), MASK16),
               jnp.zeros((N,), bool))
    ks = LB(jnp.transpose(rows(k_int)), MASK16)
    total = jax.jit(msm.msm_pippenger)(ks, pts)
    got = jax.block_until_ready(jax.jit(G.ge_from_gej)(total))
    expect = hostcurve.mul(
        sum(k * a for k, a in zip(k_int, a_int)) % hostcurve.N)
    gx = limbs_to_int_np(np.asarray(
        jax.jit(lambda v: F.normalize(v).v)(got.x)))
    assert gx == expect[0]


@pytest.mark.parametrize("N,nbits", [(1000, 256), (4096, 128)])
def test_msm_windowed_tpu(rng, N, nbits):
    """Fused windowed-table MSM vs the analytic P_i = a_i*G oracle
    (incl. non-multiple-of-block N, 128-bit scalars, and an inf lane)."""
    import jax.numpy as jnp
    from secp256k1_zkp_tpu.ops import field as F, group as G
    from secp256k1_zkp_tpu.ops import pallas_gen as PGEN, pallas_msm
    from secp256k1_zkp_tpu.ops.limb import LB, MASK16, limbs_to_int_np

    a_int = [int.from_bytes(rng.bytes(32), "big") % hostcurve.N or 1
             for _ in range(N)]
    k_int = [int.from_bytes(rng.bytes(nbits // 8), "big")
             for _ in range(N)]
    k_int[1] = 0

    def rows(vals):
        arr = np.zeros((16, len(vals)), np.uint32)
        for j, v in enumerate(vals):
            for i in range(16):
                arr[i, j] = (v >> (16 * i)) & 0xFFFF
        return jnp.asarray(arr)

    # generate the points at a block-multiple width, slice to N
    # (ecmult_gen_tpu's grid needs B % tb == 0)
    npad = -(-N // 512) * 512
    a_pad = a_int + [1] * (npad - N)
    x, y, z = PGEN.ecmult_gen_tpu(rows(a_pad), tb=512)
    xa, ya = PGEN.affine_xy_tpu(x, y, z, tb=512)
    inf = jnp.zeros((N,), bool).at[2].set(True)   # lane 2 -> identity
    pts = G.GE(LB(jnp.transpose(xa)[:N], MASK16),
               LB(jnp.transpose(ya)[:N], MASK16), inf)
    ks = LB(jnp.transpose(rows(k_int)), MASK16)
    total = jax.jit(lambda k, p: pallas_msm.msm_windowed_tpu(
        k, p, nbits=nbits))(ks, pts)
    got = jax.block_until_ready(jax.jit(G.ge_from_gej)(total))
    expect = hostcurve.mul(sum(
        k * a for i, (k, a) in enumerate(zip(k_int, a_int)) if i != 2)
        % hostcurve.N)
    gx = limbs_to_int_np(np.asarray(
        jax.jit(lambda v: F.normalize(v).v)(got.x)))
    assert gx == expect[0]


def test_lift_x_and_affine_meta(rng):
    from secp256k1_zkp_tpu.ops import pallas_field as PF
    xs = np.zeros((16, B), np.uint32)
    vals = []
    for i in range(B):
        x = int.from_bytes(rng.bytes(32), "big") % hostcurve.P
        vals.append(x)
        for l in range(16):
            xs[l, i] = (x >> (16 * l)) & 0xFFFF
    y, on = jax.block_until_ready(PF.lift_x_tpu(jnp.asarray(xs)))
    y = np.asarray(y)
    on = np.asarray(on)
    for i in range(0, B, 29):
        x = vals[i]
        y2 = (pow(x, 3, hostcurve.P) + 7) % hostcurve.P
        yy = pow(y2, (hostcurve.P + 1) // 4, hostcurve.P)
        valid = (yy * yy) % hostcurve.P == y2
        assert bool(on[i]) == valid, i
        if valid:
            if yy & 1:
                yy = hostcurve.P - yy
            got = 0
            for l in range(16):
                got |= int(y[l, i]) << (16 * l)
            assert got == yy, i


def test_ecmult_gen_blinded(rng):
    """Blinded fixed-base multiply ((k+b)*G + (-b)*G) must equal the
    unblinded k*G for every lane — ecmult_gen_impl.h:285-339 semantics:
    blinding changes the addition chain, never the result."""
    from secp256k1_zkp_tpu.context import Context
    from secp256k1_zkp_tpu.ops import pallas_gen as PGEN

    ctx = Context().randomize(b"\x42" * 32)
    assert ctx.blind is not None
    k_int = [int.from_bytes(rng.bytes(32), "big") % hostcurve.N or 1
             for _ in range(B)]
    # include the k = n - b edge (k + b == 0 mod n -> result is gb)
    b_int = sum(int(c) << (16 * i) for i, c in enumerate(ctx.blind[0]))
    k_int[3] = hostcurve.N - b_int
    arr = np.zeros((16, B), np.uint32)
    for j, v in enumerate(k_int):
        for i in range(16):
            arr[i, j] = (v >> (16 * i)) & 0xFFFF
    k_t = jnp.asarray(arr)
    xb, yb, zb = PGEN.ecmult_gen_tpu(k_t, blind=ctx.blind)
    xab, yab = np.asarray(PGEN.affine_xy_tpu(xb, yb, zb)[0]), None
    x0, y0, z0 = PGEN.ecmult_gen_tpu(k_t)
    xa0 = np.asarray(PGEN.affine_xy_tpu(x0, y0, z0)[0])
    assert (xab == xa0).all()


def test_sign_tpu_blinded_matches(rng):
    """ctx.randomize must not change any signature bit."""
    from secp256k1_zkp_tpu.context import Context
    from secp256k1_zkp_tpu.modules import ecdsa, schnorrsig

    ctx = Context().randomize(rng.bytes(32))
    msgs = np.frombuffer(rng.bytes(B * 32), np.uint8).reshape(B, 32).copy()
    secs = np.frombuffer(rng.bytes(B * 32), np.uint8).reshape(B, 32).copy()
    secs[:, 0] &= 0x7F
    msgs_j, secs_j = jnp.asarray(msgs), jnp.asarray(secs)

    sig0, rec0, ok0 = jax.block_until_ready(ecdsa.sign_tpu(msgs_j, secs_j))
    sig1, rec1, ok1 = jax.block_until_ready(
        ecdsa.sign_tpu(msgs_j, secs_j, blind=ctx.blind))
    assert (np.asarray(sig0) == np.asarray(sig1)).all()
    assert (np.asarray(rec0) == np.asarray(rec1)).all()
    assert (np.asarray(ok0) == np.asarray(ok1)).all()

    ss0, sok0 = jax.block_until_ready(schnorrsig.sign_tpu(msgs_j, secs_j))
    ss1, sok1 = jax.block_until_ready(
        schnorrsig.sign_tpu(msgs_j, secs_j, blind=ctx.blind))
    assert (np.asarray(ss0) == np.asarray(ss1)).all()
    assert (np.asarray(sok0) == np.asarray(sok1)).all()
