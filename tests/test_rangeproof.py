"""Rangeproof differential tests vs the compiled reference C library
(bit-exact proof bytes) plus roundtrip/tamper properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from secp256k1_zkp_tpu.modules import generator as gen_mod
from secp256k1_zkp_tpu.modules import rangeproof as rp
from secp256k1_zkp_tpu.ops import field as F, group as G
from secp256k1_zkp_tpu.ops.limb import LB, MASK16

import coracle
import oracle

pytestmark = pytest.mark.skipif(not coracle.available(),
                                reason="reference C oracle unavailable")


def mk_ge(pts):
    mk = lambda vals: LB(jnp.asarray(np.array(
        [[(v >> (16 * i)) & 0xFFFF for i in range(16)] for v in vals],
        dtype=np.uint32)), MASK16)
    return G.GE(mk([p[0] for p in pts]), mk([p[1] for p in pts]),
                jnp.zeros(len(pts), bool))


def b2a(bs):
    return jnp.asarray(np.array([list(b) for b in bs], dtype=np.uint8))


@pytest.fixture(scope="module")
def ref():
    return coracle.Ref()


def setup_case(rng, ref, n, vmax=2 ** 32 - 1):
    Hpt = oracle.generator_generate(b"\x07" * 32)
    gser = oracle.generator_serialize(Hpt)
    blinds = [(int.from_bytes(rng.bytes(32), "big") % oracle.N or 1)
              .to_bytes(32, "big") for _ in range(n)]
    nonces = [rng.bytes(32) for _ in range(n)]
    values = [int(rng.integers(0, vmax)) for _ in range(n)]
    commits = [oracle.pedersen_commit(b, v, Hpt)
               for b, v in zip(blinds, values)]
    commit_sers = [oracle.pedersen_commitment_serialize(c)
                   for c in commits]
    return Hpt, gser, blinds, nonces, values, commits, commit_sers


def test_sign_bitexact_vs_reference(rng, ref):
    n = 2
    Hpt, gser, blinds, nonces, values, commits, commit_sers = \
        setup_case(rng, ref, n)

    proofs, ok = rp.sign(
        np.array(values, dtype=np.uint64), b2a(blinds), b2a(nonces),
        mk_ge(commits), mk_ge([Hpt] * n), exp=0, min_bits=32)
    assert ok.all()

    for i in range(n):
        exp_proof = ref.rangeproof_sign(0, commit_sers[i], blinds[i],
                                        nonces[i], 0, 32, values[i], gser)
        assert exp_proof is not None
        assert proofs[i] == exp_proof, f"lane {i} proof differs"
        # cross-verify: C accepts our proof (identical), we accept C's
        assert ref.rangeproof_verify(commit_sers[i], proofs[i], gser)


def test_verify_and_tamper(rng, ref):
    n = 2
    Hpt, gser, blinds, nonces, values, commits, commit_sers = \
        setup_case(rng, ref, n)
    proofs = [ref.rangeproof_sign(0, commit_sers[i], blinds[i], nonces[i],
                                  0, 32, values[i], gser)
              for i in range(n)]
    ok, mn, mx = rp.verify(proofs, mk_ge(commits), mk_ge([Hpt] * n))
    assert ok.all()
    assert all(int(m) == 0 for m in mn)
    assert all(int(m) == 2 ** 32 - 1 for m in mx)

    # tampered s-value must fail
    bad = [bytearray(p) for p in proofs]
    for b in bad:
        b[-1] ^= 1
    okb, _, _ = rp.verify([bytes(b) for b in bad], mk_ge(commits),
                          mk_ge([Hpt] * n))
    assert not okb.any()

    # wrong commitment must fail
    okw, _, _ = rp.verify(proofs, mk_ge(commits[::-1]),
                          mk_ge([Hpt] * n))
    assert not okw.any()


def test_sign_with_message_and_exp(rng, ref):
    n = 2
    Hpt, gser, blinds, nonces, values, commits, commit_sers = \
        setup_case(rng, ref, n, vmax=2 ** 20)
    values = [v * 100 for v in values]  # exact multiples for exp=2
    commits = [oracle.pedersen_commit(
        int.from_bytes(b, "big").to_bytes(32, "big"), v, Hpt)
        for b, v in zip(blinds, values)]
    commit_sers = [oracle.pedersen_commitment_serialize(c)
                   for c in commits]
    msgs = [rng.bytes(48) for _ in range(n)]

    proofs, ok = rp.sign(
        np.array(values, dtype=np.uint64), b2a(blinds), b2a(nonces),
        mk_ge(commits), mk_ge([Hpt] * n), exp=2, min_bits=24,
        messages=msgs)
    assert ok.all()
    for i in range(n):
        exp_proof = ref.rangeproof_sign(0, commit_sers[i], blinds[i],
                                        nonces[i], 2, 24, values[i], gser,
                                        message=msgs[i])
        assert proofs[i] == exp_proof, f"lane {i} (exp/message) differs"
        assert ref.rangeproof_verify(commit_sers[i], proofs[i], gser)
    ok2, _, _ = rp.verify(proofs, mk_ge(commits), mk_ge([Hpt] * n))
    assert ok2.all()


def test_rewind_vs_reference(rng, ref):
    """Our rewind recovers (blind, value, message, min, max) identically
    to secp256k1_rangeproof_rewind."""
    n = 2
    Hpt, gser, blinds, nonces, values, commits, commit_sers = \
        setup_case(rng, ref, n, vmax=2 ** 24)
    msgs = [rng.bytes(40) for _ in range(n)]

    proofs, ok = rp.sign(
        np.array(values, dtype=np.uint64), b2a(blinds), b2a(nonces),
        mk_ge(commits), mk_ge([Hpt] * n), exp=0, min_bits=32,
        messages=msgs)
    assert ok.all()

    rok, rblinds, rvalues, rmsgs, rmn, rmx = rp.rewind(
        proofs, b2a(nonces), mk_ge(commits), mk_ge([Hpt] * n))
    assert rok.all()
    for i in range(n):
        want = ref.rangeproof_rewind(True, commit_sers[i], proofs[i],
                                     nonces[i], gser)
        assert want is not None
        wblind, wvalue, wmsg, wmn, wmx = want
        assert rblinds[i] == wblind, f"lane {i} blind differs"
        assert rvalues[i] == wvalue == values[i]
        assert rmsgs[i][:len(wmsg)] == wmsg
        assert rmsgs[i][:40] == msgs[i]
        assert int(rmn[i]) == wmn and int(rmx[i]) == wmx

    # wrong nonce: either fails or recovers garbage, never the message
    bad_nonces = [bytes(32) for _ in range(n)]
    rok2, _, rv2, rmsg2, _, _ = rp.rewind(
        proofs, b2a(bad_nonces), mk_ge(commits), mk_ge([Hpt] * n))
    for i in range(n):
        assert (not rok2[i]) or rv2[i] != values[i] or \
            rmsg2[i][:40] != msgs[i]


def test_info():
    """rangeproof_info parity on a synthetic header."""
    # exp=2, mantissa=24, min_value=7
    hdr = bytes([64 | 32 | 2, 23]) + (7).to_bytes(8, "big")
    proof = hdr + bytes(3000)
    got = rp.info(proof)
    assert got is not None
    exp, mantissa, mn, mx = got
    assert exp == 2 and mantissa == 24 and mn == 7
    assert mx == (0xFFFFFFFFFFFFFFFF >> 40) * 100 + 7
