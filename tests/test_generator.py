"""NUMS generator (SvdW hash-to-curve) + Pedersen commitment parity vs
the oracle (mirrors modules/generator tests, SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from secp256k1_zkp_tpu.modules import generator as gen
from secp256k1_zkp_tpu.ops import field as F, group as G
from secp256k1_zkp_tpu.ops.limb import LB, MASK16, limbs_to_int_np

import oracle


def b2a(bs):
    return jnp.asarray(np.array([list(b) for b in bs], dtype=np.uint8))


def ge_ints(p: G.GE, i):
    return (limbs_to_int_np(np.asarray(F.normalize(p.x).v)[i]),
            limbs_to_int_np(np.asarray(F.normalize(p.y).v)[i]))


def test_svdw(rng):
    ts = [int.from_bytes(rng.bytes(32), "big") % oracle.P
          for _ in range(6)] + [0, 1]
    t = LB(jnp.asarray(np.array(
        [[(v >> (16 * i)) & 0xFFFF for i in range(16)] for v in ts],
        dtype=np.uint32)), MASK16)
    out = jax.jit(gen.svdw)(t)
    assert np.asarray(jax.jit(G.ge_is_on_curve)(out)).all()
    for i, tv in enumerate(ts):
        assert ge_ints(out, i) == oracle.svdw(tv), f"t={tv:#x}"


def test_generator_generate(rng):
    keys = [rng.bytes(32) for _ in range(4)]
    out, ok = jax.jit(gen.generator_generate)(b2a(keys))
    assert np.asarray(ok).all()
    ser = np.asarray(jax.jit(gen.generator_serialize)(out))
    for i, k in enumerate(keys):
        exp = oracle.generator_serialize(oracle.generator_generate(k))
        assert bytes(ser[i]) == exp
    # parse roundtrip
    p2, ok2 = jax.jit(gen.generator_parse)(jnp.asarray(ser))
    assert np.asarray(ok2).all()
    for i, k in enumerate(keys):
        assert ge_ints(p2, i) == oracle.generator_generate(k)


def test_generator_generate_blinded(rng):
    keys = [rng.bytes(32) for _ in range(3)]
    blinds = [rng.bytes(32) for _ in range(3)]
    # keep blinds < n
    blinds = [(int.from_bytes(b, "big") % oracle.N).to_bytes(32, "big")
              for b in blinds]
    out, ok = jax.jit(gen.generator_generate)(b2a(keys), b2a(blinds))
    assert np.asarray(ok).all()
    for i in range(3):
        assert ge_ints(out, i) == oracle.generator_generate(
            keys[i], blinds[i])


def test_pedersen_commit_and_tally(rng):
    n = 4
    blinds = [(int.from_bytes(rng.bytes(32), "big") % oracle.N)
              .to_bytes(32, "big") for _ in range(n)]
    values = [int(rng.integers(0, 2 ** 52)) for _ in range(n)]
    Hgen = oracle.generator_generate(b"\x07" * 32)

    @jax.jit
    def go(blind_b, hi, lo, hx, hy):
        Hge = G.GE(hx, hy, jnp.zeros(blind_b.shape[:-1], bool))
        cj, ok = gen.pedersen_commit(blind_b, hi, lo, Hge)
        ser = gen.pedersen_commitment_serialize(G.ge_from_gej(cj))
        return cj, ser, ok

    mk = lambda v: LB(jnp.broadcast_to(jnp.asarray(np.array(
        [(v >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)),
        (n, 16)), MASK16)
    hi = jnp.asarray(np.array([v >> 32 for v in values], np.uint32))
    lo = jnp.asarray(np.array([v & 0xFFFFFFFF for v in values], np.uint32))
    cj, ser, ok = go(b2a(blinds), hi, lo, mk(Hgen[0]), mk(Hgen[1]))
    assert np.asarray(ok).all()
    ser = np.asarray(ser)
    for i in range(n):
        exp = oracle.pedersen_commitment_serialize(
            oracle.pedersen_commit(blinds[i], values[i], Hgen))
        assert bytes(ser[i]) == exp

    # tally: commits(v, b) balance iff sum v and sum b balance
    bsum = sum(int.from_bytes(b, "big") for b in blinds) % oracle.N
    vsum = sum(values)
    blinds2 = [b"\x00" * 31 + b"\x01",
               (bsum - 1 if bsum else oracle.N - 1).to_bytes(32, "big")]
    values2 = [vsum - 3, 3]
    hi2 = jnp.asarray(np.array([v >> 32 for v in values2], np.uint32))
    lo2 = jnp.asarray(np.array([v & 0xFFFFFFFF for v in values2],
                               np.uint32))
    mk2 = lambda v: LB(jnp.broadcast_to(jnp.asarray(np.array(
        [(v >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)),
        (2, 16)), MASK16)
    cj2, _, ok2 = go(b2a(blinds2), hi2, lo2, mk2(Hgen[0]), mk2(Hgen[1]))
    assert np.asarray(ok2).all()

    tally = jax.jit(gen.pedersen_verify_tally)(cj, cj2)
    assert bool(np.asarray(tally))

    # imbalanced must fail
    values3 = [vsum - 3, 4]
    hi3 = jnp.asarray(np.array([v >> 32 for v in values3], np.uint32))
    lo3 = jnp.asarray(np.array([v & 0xFFFFFFFF for v in values3],
                               np.uint32))
    cj3, _, _ = go(b2a(blinds2), hi3, lo3, mk2(Hgen[0]), mk2(Hgen[1]))
    tally3 = jax.jit(gen.pedersen_verify_tally)(cj, cj3)
    assert not bool(np.asarray(tally3))


def test_pedersen_blind_sum(rng):
    blinds = [(int.from_bytes(rng.bytes(32), "big") % oracle.N)
              .to_bytes(32, "big") for _ in range(5)]
    arr = jnp.asarray(np.array([[list(b)] for b in blinds],
                               dtype=np.uint8))  # [5, 1, 32]
    out, ok = jax.jit(lambda a: gen.pedersen_blind_sum(a, 3))(arr)
    assert np.asarray(ok).all()
    ints = [int.from_bytes(b, "big") for b in blinds]
    exp = (sum(ints[:3]) - sum(ints[3:])) % oracle.N
    assert int.from_bytes(bytes(np.asarray(out)[0]), "big") == exp
