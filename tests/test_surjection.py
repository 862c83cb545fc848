"""Surjection-proof differential tests vs the compiled reference C
library (bit-exact proof bytes + cross-verification), plus tamper
properties.  Reference test model: src/modules/surjection/tests_impl.h.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from secp256k1_zkp_tpu.modules import surjection as sj
from secp256k1_zkp_tpu.ops import group as G
from secp256k1_zkp_tpu.ops.limb import LB, MASK16

import coracle
import oracle

pytestmark = pytest.mark.skipif(not coracle.available(),
                                reason="reference C oracle unavailable")


@pytest.fixture(scope="module")
def ref():
    return coracle.Ref()


def mk_ge1(pt):
    mk = lambda v: LB(jnp.asarray(np.array(
        [[(v >> (16 * i)) & 0xFFFF for i in range(16)]], np.uint32)),
        MASK16)
    return G.GE(mk(pt[0]), mk(pt[1]), jnp.zeros(1, bool))


def setup_case(rng, n_inputs, n_use, input_index_tag=0):
    """fixed tags + blinds + ephemeral generator tags, host-side."""
    fixed = [bytes(rng.integers(0, 256, 32, dtype=np.uint8))
             for _ in range(n_inputs)]
    blinds = [(int.from_bytes(rng.bytes(32), "big") % oracle.N or 1)
              .to_bytes(32, "big") for _ in range(n_inputs + 1)]
    eph = [oracle.generator_generate(fixed[i], blinds[i])
           for i in range(n_inputs)]
    fixed_out = fixed[input_index_tag]
    out_tag = oracle.generator_generate(fixed_out, blinds[n_inputs])
    seed = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    init = sj.initialize(fixed, n_use, fixed_out, 100, seed)
    assert init is not None
    n_iter, bitmap, input_index = init
    used_idx = [i for i in range(n_inputs)
                if bitmap[i // 8] & (1 << (i % 8))]
    return (fixed, blinds, eph, fixed_out, out_tag, seed, bitmap,
            input_index, used_idx)


@pytest.mark.parametrize("n_inputs,n_use", [(3, 2), (5, 3)])
def test_bitexact_vs_reference(rng, ref, n_inputs, n_use):
    (fixed, blinds, eph, fixed_out, out_tag, seed, bitmap, input_index,
     used_idx) = setup_case(rng, n_inputs, n_use)

    # reference: initialize must pick the same bitmap (same csprng)
    rinit = ref.surjection_initialize(fixed, n_use, fixed_out, 100, seed)
    assert rinit is not None
    rproof, ridx, _ = rinit
    assert ridx == input_index

    in_blind = blinds[input_index]
    out_blind = blinds[n_inputs]
    rindex = used_idx.index(input_index)
    e0, s_bytes, ok = sj.generate(
        [mk_ge1(t) for t in eph], used_idx, mk_ge1(out_tag),
        jnp.asarray(np.array([rindex], np.int32)),
        jnp.asarray(np.array([list(in_blind)], np.uint8)),
        jnp.asarray(np.array([list(out_blind)], np.uint8)))
    assert np.asarray(ok).all()
    mine = sj.serialize(n_inputs, bitmap,
                        bytes(np.asarray(e0)[0]),
                        bytes(np.asarray(s_bytes)[0]))

    eph_sers = [oracle.generator_serialize(t) for t in eph]
    out_ser = oracle.generator_serialize(out_tag)
    assert ref.surjection_generate(rproof, eph_sers, out_ser,
                                   input_index, in_blind, out_blind)
    theirs = ref.surjection_serialize(rproof)
    assert mine == theirs, "proof bytes differ from reference"

    # cross-verification both ways
    assert ref.surjection_verify(ref.surjection_parse(mine), eph_sers,
                                 out_ser)
    parsed = sj.parse(theirs)
    assert parsed is not None
    n_p, bm_p, e0_p, s_p = parsed
    okv = sj.verify([mk_ge1(t) for t in eph], used_idx, mk_ge1(out_tag),
                    jnp.asarray(np.array([list(e0_p)], np.uint8)),
                    jnp.asarray(np.array([list(s_p)], np.uint8)))
    assert np.asarray(okv).all()


def test_tamper_rejected(rng, ref):
    (fixed, blinds, eph, fixed_out, out_tag, seed, bitmap, input_index,
     used_idx) = setup_case(rng, 3, 2)
    rindex = used_idx.index(input_index)
    e0, s_bytes, ok = sj.generate(
        [mk_ge1(t) for t in eph], used_idx, mk_ge1(out_tag),
        jnp.asarray(np.array([rindex], np.int32)),
        jnp.asarray(np.array([list(blinds[input_index])], np.uint8)),
        jnp.asarray(np.array([list(blinds[3])], np.uint8)))
    assert np.asarray(ok).all()
    e0_np = np.asarray(e0).copy()
    e0_np[0, 5] ^= 1
    bad = sj.verify([mk_ge1(t) for t in eph], used_idx, mk_ge1(out_tag),
                    jnp.asarray(e0_np), jnp.asarray(np.asarray(s_bytes)))
    assert not np.asarray(bad).any()


def test_envelope_roundtrip(rng):
    bitmap = bytes([0b101])
    data = sj.serialize(3, bitmap, b"\x11" * 32, b"\x22" * 64)
    n, bm, e0, s = sj.parse(data)
    assert (n, bm, e0, s) == (3, bitmap, b"\x11" * 32, b"\x22" * 64)
    assert sj.parse(data[:-1]) is None
    assert sj.n_used_inputs(3, bitmap) == 2
    assert sj.serialized_size(3, 2) == len(data)
