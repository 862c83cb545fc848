"""Bulletproofs++ norm-argument tests.

Drives the TPU implementation against the reference's committed
prove/verify vectors (src/modules/bppp/test_vectors/{prove,verify}.h,
exercised by norm_arg_{prove,verify}_vectors in
src/modules/bppp/tests_impl.h) plus self-consistency round-trips.
The vector headers are parsed straight out of the read-only reference
checkout at test time.
"""

import os
import re

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from secp256k1_zkp_tpu.modules import bppp  # noqa: E402
from secp256k1_zkp_tpu.ops import field as F  # noqa: E402
from secp256k1_zkp_tpu.ops import group as G  # noqa: E402
from secp256k1_zkp_tpu.ops import scalar as S  # noqa: E402
from secp256k1_zkp_tpu.ops.limb import LB, MASK16  # noqa: E402

VEC_DIR = "/root/reference/src/modules/bppp/test_vectors"


def _parse_header(path):
    """Extract `name -> bytes|int` from a C test-vector header."""
    with open(path) as f:
        text = f.read()
    out = {}
    for m in re.finditer(
            r"static const (?:unsigned char|int|size_t)\s+(\w+)\s*"
            r"((?:\[\w*\])*)\s*="
            r"\s*([^;]+);", text, re.S):
        name, _dims, body = m.groups()
        if "{" in body:
            vals = [int(x, 0) for x in re.findall(r"0x[0-9A-Fa-f]+|\b\d+\b",
                                                  body)]
            out[name] = bytes(vals)
        else:
            out[name] = int(body.strip())
    return out


def _sc(b32: bytes) -> LB:
    v = np.array([(int.from_bytes(b32, "big") >> (16 * i)) & 0xFFFF
                  for i in range(16)], np.uint32)
    return LB(jnp.asarray(v), MASK16)


def _sc_vec(raw: bytes) -> LB:
    n = len(raw) // 32
    v = np.zeros((n, 16), np.uint32)
    for i in range(n):
        x = int.from_bytes(raw[32 * i:32 * (i + 1)], "big") % S.N
        for j in range(16):
            v[i, j] = (x >> (16 * j)) & 0xFFFF
    return LB(jnp.asarray(v), MASK16)


def _gens(raw: bytes, n: int) -> G.GE:
    """The reference's vector gens are compressed *pubkeys*
    (bppp_generators_parse_regular, tests_impl.h:511), not the 10/11
    generator encoding."""
    from secp256k1_zkp_tpu.modules import eckey
    arr = jnp.asarray(np.frombuffer(raw[:33 * n], np.uint8).reshape(n, 33))
    g, ok = eckey.pubkey_parse(arr)
    assert bool(jnp.all(ok))
    return g


def _parse_commit33(b: bytes):
    arr = jnp.asarray(np.frombuffer(b, np.uint8))
    if all(x == 0 for x in b):
        return G.ge_infinity(())
    # ge_parse_ext == compressed pubkey parse
    x, _ = F.from_bytes_be(arr[1:])
    y, ok = F.sqrt(F.norm_weak(F.add(F.mul(F.sqr(x), x), F.fe(F.B_COEFF))))
    assert bool(ok)
    y = F.normalize(y)
    want_odd = b[0] == 3
    y = F.normalize(F.select(F.is_odd(y) != want_odd, F.neg(y), y))
    return G.GE(x, y, jnp.asarray(False))


@pytest.fixture(scope="module")
def prove_vecs():
    if not os.path.exists(VEC_DIR):
        pytest.skip("reference checkout unavailable")
    return _parse_header(os.path.join(VEC_DIR, "prove.h"))


@pytest.fixture(scope="module")
def verify_vecs():
    if not os.path.exists(VEC_DIR):
        pytest.skip("reference checkout unavailable")
    return _parse_header(os.path.join(VEC_DIR, "verify.h"))


def test_norm_arg_prove_vectors(prove_vecs):
    v = prove_vecs
    for i in range(5):
        if v.get(f"prove_vector_{i}_result", 1) != 1:
            continue
        n_vec = _sc_vec(v[f"prove_vector_{i}_n_vec32"])
        l_vec = _sc_vec(v[f"prove_vector_{i}_l_vec32"])
        c_vec = _sc_vec(v[f"prove_vector_{i}_c_vec32"])
        rho = _sc(v[f"prove_vector_{i}_r32"])
        g_len, h_len = n_vec.v.shape[0], l_vec.v.shape[0]
        gens = _gens(v["prove_vector_gens"], g_len + h_len)

        proof = bppp.prove(rho, gens, n_vec, l_vec, c_vec, tag=None)
        got = bytes(np.asarray(proof))
        want = v[f"prove_vector_{i}_proof"]
        assert got == want, f"prove vector {i} mismatch"

        # round-trip: commit + verify
        mu = S.sqr(rho)
        commit = bppp.commit_jitted(gens, n_vec, l_vec, c_vec, mu)
        ok = bppp.verify(proof, rho, gens, g_len, c_vec, commit, tag=None)
        assert bool(ok), f"prove vector {i} verify failed"


def test_norm_arg_verify_vectors(verify_vecs):
    v = verify_vecs
    for i in range(13):
        key = f"verify_vector_{i}_result"
        if key not in v:
            continue
        expect = v[key] == 1
        c_vec = _sc_vec(v[f"verify_vector_{i}_c_vec32"])
        rho = _sc(v[f"verify_vector_{i}_r32"])
        n_len = v[f"verify_vector_{i}_n_vec_len"]
        h_len = c_vec.v.shape[0]
        gens = _gens(v["verify_vector_gens"], n_len + h_len)
        commit = _parse_commit33(v[f"verify_vector_{i}_commit33"])
        proof = np.frombuffer(v[f"verify_vector_{i}_proof"], np.uint8)
        got = bppp.verify(proof, rho, gens, n_len, c_vec, commit,
                          tag=None)
        assert bool(got) == expect, f"verify vector {i}: {bool(got)} != {expect}"


def test_norm_arg_roundtrip(rng):
    """Random prove->verify (norm_arg_test shape, small sizes) + a
    corrupted-proof rejection."""
    # sizes chosen to reuse the prove-vector compile cache entries
    for (g_len, h_len) in [(2, 1), (2, 4)]:
        def r(n):
            v = np.zeros((n, 16), np.uint32)
            for i in range(n):
                x = int.from_bytes(rng.bytes(32), "big") % S.N
                for j in range(16):
                    v[i, j] = (x >> (16 * j)) & 0xFFFF
            return LB(jnp.asarray(v), MASK16)

        n_vec, l_vec, c_vec = r(g_len), r(h_len), r(h_len)
        rho = LB(r(1).v[0], MASK16)
        gens = bppp.generators_create(g_len + h_len)

        proof = bppp.prove(rho, gens, n_vec, l_vec, c_vec)
        mu = S.sqr(rho)
        commit = bppp.commit_jitted(gens, n_vec, l_vec, c_vec, mu)
        ok = bppp.verify(proof, rho, gens, g_len, c_vec, commit)
        assert bool(ok), f"roundtrip ({g_len},{h_len}) failed"

        bad = np.asarray(proof).copy()
        bad[-1] ^= 1
        ok2 = bppp.verify(bad, rho, gens, g_len, c_vec, commit)
        assert not bool(ok2), "corrupted proof accepted"


def test_generators_create_serialize_roundtrip():
    gens = bppp.generators_create(4)
    data = bppp.generators_serialize(gens)
    g2, ok = bppp.generators_parse(data)
    assert bool(jnp.all(ok))
    assert bool(jnp.all(F.eq(gens.x, g2.x))) and \
        bool(jnp.all(F.eq(gens.y, g2.y)))
