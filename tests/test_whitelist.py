"""Whitelist ring-signature differential tests vs the compiled reference
C library (bit-exact signature bytes + cross-verification).
Reference test model: src/modules/whitelist/tests_impl.h."""

import jax.numpy as jnp
import numpy as np
import pytest

from secp256k1_zkp_tpu.modules import whitelist as wl
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


def ser33(pt):
    return bytes([2 + (pt[1] & 1)]) + pt[0].to_bytes(32, "big")


def setup_case(rng, n, index):
    def keypair():
        d = int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
        return d, oracle.point_mul(d, oracle.G)

    online = [keypair() for _ in range(n)]
    offline = [keypair() for _ in range(n)]
    sub_d, sub_p = keypair()
    summed_d = (offline[index][0] + sub_d) % oracle.N
    return online, offline, (sub_d, sub_p), summed_d


@pytest.mark.parametrize("n,index", [(1, 0), (3, 1), (4, 3)])
def test_bitexact_vs_reference(rng, ref, n, index):
    online, offline, sub, summed_d = setup_case(rng, n, index)
    on_sec = online[index][0].to_bytes(32, "big")
    summed = summed_d.to_bytes(32, "big")

    e0, s_bytes, ok = wl.sign(
        [mk_ge1(p) for _, p in online], [mk_ge1(p) for _, p in offline],
        mk_ge1(sub[1]),
        jnp.asarray(np.array([list(on_sec)], np.uint8)),
        jnp.asarray(np.array([list(summed)], np.uint8)),
        jnp.asarray(np.array([index], np.int32)))
    assert np.asarray(ok).all()
    mine = wl.signature_serialize(n, bytes(np.asarray(e0)[0]),
                                  bytes(np.asarray(s_bytes)[0]))

    theirs = ref.whitelist_sign(
        [ser33(p) for _, p in online], [ser33(p) for _, p in offline],
        ser33(sub[1]), on_sec, summed, index)
    assert theirs is not None
    assert mine == theirs, "signature bytes differ from reference"

    # cross-verification both ways
    assert ref.whitelist_verify(mine, [ser33(p) for _, p in online],
                                [ser33(p) for _, p in offline],
                                ser33(sub[1]))
    parsed = wl.signature_parse(theirs)
    assert parsed is not None
    n_p, e0_p, s_p = parsed
    assert n_p == n
    okv = wl.verify(
        [mk_ge1(p) for _, p in online], [mk_ge1(p) for _, p in offline],
        mk_ge1(sub[1]),
        jnp.asarray(np.array([list(e0_p)], np.uint8)),
        jnp.asarray(np.array([list(s_p)], np.uint8)))
    assert np.asarray(okv).all()


def test_wrong_sub_rejected(rng, ref):
    online, offline, sub, summed_d = setup_case(rng, 2, 0)
    on_sec = online[0][0].to_bytes(32, "big")
    summed = summed_d.to_bytes(32, "big")
    e0, s_bytes, ok = wl.sign(
        [mk_ge1(p) for _, p in online], [mk_ge1(p) for _, p in offline],
        mk_ge1(sub[1]),
        jnp.asarray(np.array([list(on_sec)], np.uint8)),
        jnp.asarray(np.array([list(summed)], np.uint8)),
        jnp.asarray(np.array([0], np.int32)))
    assert np.asarray(ok).all()
    other = oracle.point_mul(12345, oracle.G)
    bad = wl.verify(
        [mk_ge1(p) for _, p in online], [mk_ge1(p) for _, p in offline],
        mk_ge1(other), jnp.asarray(np.asarray(e0)),
        jnp.asarray(np.asarray(s_bytes)))
    assert not np.asarray(bad).any()
