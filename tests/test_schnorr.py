"""BIP-340 Schnorr parity vs the oracle and BIP-340 test vectors
(mirrors modules/schnorrsig/tests_impl.h, SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from secp256k1_zkp_tpu.modules import schnorrsig

import oracle


def b2a(bs):
    return jnp.asarray(np.array([list(b) for b in bs], dtype=np.uint8))


def test_sign_matches_oracle(rng):
    n = 6
    secs = [int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
            for _ in range(n)]
    msgs = [rng.bytes(32) for _ in range(n)]
    auxs = [rng.bytes(32) for _ in range(n)]
    sig64, ok = jax.jit(schnorrsig.sign)(
        b2a(msgs), b2a([s.to_bytes(32, "big") for s in secs]), b2a(auxs))
    assert np.asarray(ok).all()
    sigs = np.asarray(sig64)
    for i in range(n):
        exp = oracle.schnorr_sign(msgs[i], secs[i], auxs[i])
        assert bytes(sigs[i]) == exp


def test_sign_verify_roundtrip(rng):
    n = 6
    secs = [int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
            for _ in range(n)]
    msgs = [rng.bytes(32) for _ in range(n)]
    pubx = [oracle.point_mul(d, oracle.G)[0] for d in secs]
    sec_b = b2a([s.to_bytes(32, "big") for s in secs])
    msg_b = b2a(msgs)
    px_b = b2a([x.to_bytes(32, "big") for x in pubx])

    @jax.jit
    def go(msg_b, sec_b, px_b):
        sig64, ok = schnorrsig.sign(msg_b, sec_b)
        good = schnorrsig.verify(msg_b, sig64, px_b)
        bad = schnorrsig.verify(msg_b[::-1], sig64, px_b)
        return ok, good, bad

    ok, good, bad = go(msg_b, sec_b, px_b)
    assert np.asarray(ok).all()
    assert np.asarray(good).all()
    assert not np.asarray(bad).any()


# BIP-340 reference vectors (index, seckey, pubkey, aux, msg, sig, valid).
# Data from the BIP; same vectors the reference embeds in
# modules/schnorrsig/tests_impl.h.
BIP340_SIGN_VECTORS = [
    (0, "0000000000000000000000000000000000000000000000000000000000000003",
     "F9308A019258C31049344F85F89D5229B531C845836F99B08601F113BCE036F9",
     "0000000000000000000000000000000000000000000000000000000000000000",
     "0000000000000000000000000000000000000000000000000000000000000000",
     "E907831F80848D1069A5371B402410364BDF1C5F8307B0084C55F1CE2DCA8215"
     "25F66A4A85EA8B71E482A74F382D2CE5EBEEE8FDB2172F477DF4900D310536C0"),
    (1, "B7E151628AED2A6ABF7158809CF4F3C762E7160F38B4DA56A784D9045190CFEF",
     "DFF1D77F2A671C5F36183726DB2341BE58FEAE1DA2DECED843240F7B502BA659",
     "0000000000000000000000000000000000000000000000000000000000000001",
     "243F6A8885A308D313198A2E03707344A4093822299F31D0082EFA98EC4E6C89",
     "6896BD60EEAE296DB48A229FF71DFE071BDE413E6D43F917DC8DCF8C78DE3341"
     "8906D11AC976ABCCB20B091292BFF4EA897EFCB639EA871CFA95F6DE339E4B0A"),
    (2, "C90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74020BBEA63B14E5C9",
     "DD308AFEC5777E13121FA72B9CC1B7CC0139715309B086C960E18FD969774EB8",
     "C87AA53824B4D7AE2EB035A2B5BBBCCC080E76CDC6D1692C4B0B62D798E6D906",
     "7E2D58D8B3BCDF1ABADEC7829054F90DDA9805AAB56C77333024B9D0A508B75C",
     "5831AAEED7B44BB74E5EAB94BA9D4294C49BCF2A60728D8B4C200F50DD313C1B"
     "AB745879A5AD954A72C45A91C3A51D3C7ADEA98D82F8481E0E1E03674A6F3FB7"),
    (3, "0B432B2677937381AEF05BB02A66ECD012773062CF3FA2549E44F58ED2401710",
     "25D1DFF95105F5253C4022F628A996AD3A0D95FBF21D468A1B33F8C160D8F517",
     "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF",
     "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF",
     "7EB0509757E246F19449885651611CB965ECC1A187DD51B64FDA1EDC9637D5EC"
     "97582B9CB13DB3933705B32BA982AF5AF25FD78881EBB32771FC5922EFC66EA3"),
]

# Verify-only vectors (pubkey, msg, sig, valid, comment).
BIP340_VERIFY_VECTORS = [
    ("D69C3509BB99E412E68B0FE8544E72837DFA30746D8BE2AA65975F29D22DC7B9",
     "4DF3C3F68FCC83B27E9D42C90431A72499F17875C81A599B566C9889B9696703",
     "00000000000000000000003B78CE563F89A0ED9414F5AA28AD0D96D6795F9C63"
     "76AFB1548AF603B3EB45C9F8207DEE1060CB71C04E80F593060B07D28308D7F4",
     True),
    ("EEFDEA4CDB677750A420FEE807EACF21EB9898AE79B9768766E4FAA04A2D4A34",
     "243F6A8885A308D313198A2E03707344A4093822299F31D0082EFA98EC4E6C89",
     "6CFF5C3BA86C69EA4B7376F31A9BCB4F74C1976089B2D9963DA2E5543E177769"
     "69E89B4C5564D00349106B8497785DD7D1D713A8AE82B32FA79D5F7FC407D39B",
     False),  # public key not on the curve
    ("DFF1D77F2A671C5F36183726DB2341BE58FEAE1DA2DECED843240F7B502BA659",
     "243F6A8885A308D313198A2E03707344A4093822299F31D0082EFA98EC4E6C89",
     "FFF97BD5755EEEA420453A14355235D382F6472F8568A18B2F057A1460297556"
     "3CC27944640AC607CD107AE10923D9EF7A73C643E166BE5EBEAFA34B1AC553E2",
     False),  # has_even_y(R) is false
    ("DFF1D77F2A671C5F36183726DB2341BE58FEAE1DA2DECED843240F7B502BA659",
     "243F6A8885A308D313198A2E03707344A4093822299F31D0082EFA98EC4E6C89",
     "6CFF5C3BA86C69EA4B7376F31A9BCB4F74C1976089B2D9963DA2E5543E177769"
     "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141",
     False),  # sig[32:64] is equal to curve order
    ("FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFC30",
     "243F6A8885A308D313198A2E03707344A4093822299F31D0082EFA98EC4E6C89",
     "6CFF5C3BA86C69EA4B7376F31A9BCB4F74C1976089B2D9963DA2E5543E177769"
     "69E89B4C5564D00349106B8497785DD7D1D713A8AE82B32FA79D5F7FC407D39B",
     False),  # pubkey x exceeds field size
]


def test_bip340_sign_vectors():
    secs = b2a([bytes.fromhex(v[1]) for v in BIP340_SIGN_VECTORS])
    auxs = b2a([bytes.fromhex(v[3]) for v in BIP340_SIGN_VECTORS])
    msgs = b2a([bytes.fromhex(v[4]) for v in BIP340_SIGN_VECTORS])
    sig64, ok = jax.jit(schnorrsig.sign)(msgs, secs, auxs)
    assert np.asarray(ok).all()
    sigs = np.asarray(sig64)
    for i, v in enumerate(BIP340_SIGN_VECTORS):
        assert bytes(sigs[i]).hex().upper() == v[5], f"vector {v[0]}"
    # and they verify
    pxs = b2a([bytes.fromhex(v[2]) for v in BIP340_SIGN_VECTORS])
    vok = jax.jit(schnorrsig.verify)(msgs, sig64, pxs)
    assert np.asarray(vok).all()


def test_bip340_verify_vectors():
    pxs = b2a([bytes.fromhex(v[0]) for v in BIP340_VERIFY_VECTORS])
    msgs = b2a([bytes.fromhex(v[1]) for v in BIP340_VERIFY_VECTORS])
    sigs = b2a([bytes.fromhex(v[2]) for v in BIP340_VERIFY_VECTORS])
    ok = np.asarray(jax.jit(schnorrsig.verify)(msgs, sigs, pxs))
    for i, v in enumerate(BIP340_VERIFY_VECTORS):
        assert bool(ok[i]) == v[3], f"verify vector {i}"


def test_batch_verify(rng):
    import oracle
    from secp256k1_zkp_tpu.utils import hostcurve
    n = 8
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
    ok = jax.jit(schnorrsig.batch_verify)(
        jnp.asarray(msgs), jnp.asarray(sigs), jnp.asarray(pxs))
    assert bool(np.asarray(ok))
    # one corrupted signature must fail the whole batch
    sigs2 = np.array(sigs)
    sigs2[3, 40] ^= 1
    ok = jax.jit(schnorrsig.batch_verify)(
        jnp.asarray(msgs), jnp.asarray(sigs2), jnp.asarray(pxs))
    assert not bool(np.asarray(ok))


def _make_schnorr_batch(rng, n):
    from secp256k1_zkp_tpu.utils import hostcurve
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
    return msgs, sigs, pxs


def test_batch_verify_rejects_cancellation_forgery(rng):
    """Execute the round-4 forgery (VERDICT r4 'What's weak' #1) and
    assert it now FAILS: when randomizers were z_i = H(seed||m_i||r_i)
    (independent of s and pk), shifting s_0 += z_1*t and s_1 -= t
    preserved sum z_i s_i while breaking both individual signatures,
    and batch_verify accepted the forged pair.  With z_i derived from a
    digest of the ENTIRE batch (every pk, msg and full sig), the
    randomizers move when any s moves, so the cancellation no longer
    lines up."""
    from secp256k1_zkp_tpu.utils import hostcurve
    n = 2
    msgs, sigs, pxs = _make_schnorr_batch(rng, n)
    # the attacker's best shot: z of the (public) unmodified batch
    z = schnorrsig._batch_randomizers(
        jnp.asarray(msgs), jnp.asarray(sigs), jnp.asarray(pxs), None, n)
    zv = np.asarray(z.v)
    z1 = sum(int(zv[1, i]) << (16 * i) for i in range(16))
    N = hostcurve.N
    t = 0x1234567
    s0 = int.from_bytes(bytes(sigs[0, 32:]), "big")
    s1 = int.from_bytes(bytes(sigs[1, 32:]), "big")
    sigs_f = np.array(sigs)
    sigs_f[0, 32:] = np.frombuffer(
        ((s0 + z1 * t) % N).to_bytes(32, "big"), np.uint8)
    sigs_f[1, 32:] = np.frombuffer(
        ((s1 - t) % N).to_bytes(32, "big"), np.uint8)
    # both forged signatures are individually invalid ...
    ok_ind = np.asarray(jax.jit(schnorrsig.verify)(
        jnp.asarray(msgs), jnp.asarray(sigs_f), jnp.asarray(pxs)))
    assert not ok_ind.any()
    # ... and the batch must reject them too
    ok = jax.jit(schnorrsig.batch_verify)(
        jnp.asarray(msgs), jnp.asarray(sigs_f), jnp.asarray(pxs))
    assert not bool(np.asarray(ok))


def test_batch_randomizers_bind_every_input(rng):
    """z must move when ANY input byte moves — pk, msg, r or s half —
    otherwise the corresponding term can be shifted out of the batch
    equation (the mechanism behind the round-4 forgery)."""
    msgs, sigs, pxs = _make_schnorr_batch(rng, 3)
    base = np.asarray(schnorrsig._batch_randomizers(
        jnp.asarray(msgs), jnp.asarray(sigs), jnp.asarray(pxs),
        None, 3).v)
    variants = []
    m2 = np.array(msgs); m2[2, 0] ^= 1; variants.append((m2, sigs, pxs))
    s2 = np.array(sigs); s2[1, 5] ^= 1; variants.append((msgs, s2, pxs))  # r half
    s3 = np.array(sigs); s3[1, 60] ^= 1; variants.append((msgs, s3, pxs))  # s half
    p2 = np.array(pxs); p2[0, 9] ^= 1; variants.append((msgs, sigs, p2))
    for m, s, p in variants:
        zz = np.asarray(schnorrsig._batch_randomizers(
            jnp.asarray(m), jnp.asarray(s), jnp.asarray(p), None, 3).v)
        # z_0 is pinned to 1; lanes 1.. must change
        assert not np.array_equal(zz[1:], base[1:])
