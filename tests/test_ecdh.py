"""ECDH parity vs oracle + Wycheproof ECDH vectors (the reference tests
these in modules/ecdh/tests_impl.h:175-204)."""

import hashlib
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from secp256k1_zkp_tpu.modules import ecdh, eckey
from secp256k1_zkp_tpu.ops import group as G
from secp256k1_zkp_tpu.ops.limb import LB, MASK16

import oracle

WYCHEPROOF = "/root/reference/src/wycheproof/ecdh_secp256k1_test.json"


def mk_lb(vals):
    return LB(jnp.asarray(np.array(
        [[(v >> (16 * i)) & 0xFFFF for i in range(16)] for v in vals],
        dtype=np.uint32)), MASK16)


def mk_ge(pts):
    return G.GE(mk_lb([p[0] for p in pts]), mk_lb([p[1] for p in pts]),
                jnp.zeros(len(pts), bool))


def test_ecdh_matches_oracle(rng):
    n = 4
    secs = [int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
            for _ in range(n)]
    peers = [int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
             for _ in range(n)]
    pubs = [oracle.point_mul(d, oracle.G) for d in peers]
    sec_b = jnp.asarray(np.array([list(s.to_bytes(32, "big")) for s in secs],
                                 dtype=np.uint8))
    out, ok = jax.jit(ecdh.ecdh)(mk_ge(pubs), sec_b)
    assert np.asarray(ok).all()
    got = np.asarray(out)
    for i in range(n):
        S = oracle.point_mul(secs[i], pubs[i])
        exp = hashlib.sha256(bytes([2 + (S[1] & 1)])
                             + S[0].to_bytes(32, "big")).digest()
        assert bytes(got[i]) == exp


def test_ecdh_symmetry(rng):
    a = int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
    b = int.from_bytes(rng.bytes(32), "big") % oracle.N or 1
    A = oracle.point_mul(a, oracle.G)
    B = oracle.point_mul(b, oracle.G)
    sec = jnp.asarray(np.array([list(a.to_bytes(32, "big")),
                                list(b.to_bytes(32, "big"))],
                               dtype=np.uint8))
    out, ok = jax.jit(ecdh.ecdh)(mk_ge([B, A]), sec)
    assert np.asarray(ok).all()
    o = np.asarray(out)
    assert bytes(o[0]) == bytes(o[1])


def _parse_spki_point(s: bytes) -> bytes:
    """Extract the BIT STRING payload (SEC1 point) from a DER SPKI —
    same selection the reference's vector generator performs
    (tools/tests_wycheproof_generate_ecdh.py:parse_der_pk)."""
    tag = s[0]
    L = s[1]
    off = 0
    if L & 0x80:
        if L == 0x81:
            L, off = s[2], 1
        elif L == 0x82:
            L, off = 256 * s[2] + s[3], 2
        else:
            raise ValueError("bad length")
    value = s[off + 2:L + 2 + off]
    rest = s[L + 2 + off:]
    if len(rest) > 0 or tag == 0x06:
        return _parse_spki_point(rest)
    if tag == 0x03:
        return value[1:]  # drop unused-bits byte
    if tag == 0x30:
        return _parse_spki_point(value)
    raise ValueError("unknown tag")


# tcIds whose ASN.1 explicitly encodes invalid curve params the C library
# never reads (tools/tests_wycheproof_generate_ecdh.py:should_skip_tcid)
_SKIP_TCIDS = {496, 497, 502, 503, 504, 505, 507}


@pytest.mark.skipif(not os.path.exists(WYCHEPROOF),
                    reason="wycheproof vectors not available")
def test_wycheproof_ecdh():
    with open(WYCHEPROOF) as f:
        data = json.load(f)

    pubs, secs, expect_shared, expect_ok, ids = [], [], [], [], []
    for grp in data["testGroups"]:
        for t in grp["tests"]:
            flags = set(t.get("flags", []))
            if flags & {"InvalidAsn", "WrongCurve"}:
                continue  # same skips as the reference's generator
            if t["tcId"] in _SKIP_TCIDS:
                continue
            pt = _parse_spki_point(bytes.fromhex(t["public"]))
            if len(pt) not in (33, 65):
                assert t["result"] == "invalid", t["tcId"]
                continue
            sec = bytes.fromhex(t["private"])[-32:].rjust(32, b"\x00")
            pubs.append(pt)
            secs.append(sec)
            expect_shared.append(bytes.fromhex(t["shared"]))
            expect_ok.append(t["result"] in ("valid", "acceptable"))
            ids.append(t["tcId"])

    # group by point length for batching
    for L in (33, 65):
        sel = [i for i in range(len(pubs)) if len(pubs[i]) == L]
        if not sel:
            continue
        pub_a = jnp.asarray(np.array([list(pubs[i]) for i in sel],
                                     dtype=np.uint8))
        sec_a = jnp.asarray(np.array([list(secs[i]) for i in sel],
                                     dtype=np.uint8))

        @jax.jit
        def go(pub_a, sec_a):
            pk, pk_ok = eckey.pubkey_parse(pub_a)
            x32, ok = ecdh.ecdh_xonly(pk, sec_a)
            return x32, ok & pk_ok

        x32, ok = go(pub_a, sec_a)
        x32, ok = np.asarray(x32), np.asarray(ok)
        for j, i in enumerate(sel):
            if expect_ok[i]:
                assert bool(ok[j]), f"tcId {ids[i]} unexpectedly rejected"
                assert bytes(x32[j]) == expect_shared[i], f"tcId {ids[i]}"
            else:
                # invalid: either rejected, or shared secret must differ
                if bool(ok[j]):
                    assert bytes(x32[j]) != expect_shared[i], \
                        f"tcId {ids[i]}"
