"""DER codec: python vs native parity, strictness, Wycheproof DER cases."""

import json
import os

import numpy as np
import pytest

from secp256k1_zkp_tpu.utils import der, native

WYCHEPROOF = "/root/reference/src/wycheproof/" \
    "ecdsa_secp256k1_sha256_bitcoin_test.json"


def test_roundtrip(rng):
    for _ in range(50):
        r = int.from_bytes(rng.bytes(32), "big")
        s = int.from_bytes(rng.bytes(32), "big")
        d = der.sig_der_serialize(r, s)
        assert der.sig_der_parse(d) == (r, s)
    # small values
    for r, s in [(0, 0), (1, 1), (127, 128), (2 ** 255, 1)]:
        assert der.sig_der_parse(der.sig_der_serialize(r, s)) == (r, s)


def test_strictness():
    good = der.sig_der_serialize(5, 7)
    assert der.sig_der_parse(good) == (5, 7)
    assert der.sig_der_parse(good + b"\x00") is None      # trailing
    assert der.sig_der_parse(good[:-1]) is None           # truncated
    assert der.sig_der_parse(b"\x31" + good[1:]) is None  # wrong tag
    # non-minimal length encoding
    bad = bytes([0x30, 0x81, good[1]]) + good[2:]
    assert der.sig_der_parse(bad) is None
    # negative integer
    bad2 = bytes([0x30, 0x08, 0x02, 0x02, 0x80, 0x01, 0x02, 0x02, 0x00,
                  0x01])
    assert der.sig_der_parse(bad2) is None
    # excessive padding
    bad3 = bytes([0x30, 0x08, 0x02, 0x02, 0x00, 0x01, 0x02, 0x02, 0x00,
                  0x01])
    assert der.sig_der_parse(bad3) is None


def _native_or_skip():
    if not native.have_native():
        pytest.skip("native codec unavailable (no compiler)")


def test_native_matches_python(rng):
    _native_or_skip()
    sigs = []
    for _ in range(100):
        r = int.from_bytes(rng.bytes(rng.integers(1, 33)), "big")
        s = int.from_bytes(rng.bytes(rng.integers(1, 33)), "big")
        sigs.append(der.sig_der_serialize(r, s))
    # plus malformed ones
    sigs += [b"", b"\x30\x00", b"\x30\x03\x02\x01\x05",
             der.sig_der_serialize(5, 7) + b"x",
             bytes([0x30, 0x08, 0x02, 0x02, 0x80, 1, 2, 2, 0, 1])]
    rs, ok = native.der_parse_batch(sigs)
    for i, sg in enumerate(sigs):
        p = der.sig_der_parse(sg)
        assert bool(ok[i]) == (p is not None), (i, sg.hex())
        if p:
            assert int.from_bytes(bytes(rs[i, :32]), "big") == p[0]
            assert int.from_bytes(bytes(rs[i, 32:]), "big") == p[1]
    # serialize roundtrip on the valid ones
    back = native.der_serialize_batch(rs[ok])
    valid = [s for s in sigs if der.sig_der_parse(s) is not None]
    assert back == valid


@pytest.mark.skipif(not os.path.exists(WYCHEPROOF),
                    reason="wycheproof vectors not available")
def test_native_on_wycheproof_ders():
    _native_or_skip()
    with open(WYCHEPROOF) as f:
        data = json.load(f)
    sigs = [bytes.fromhex(t["sig"]) for g in data["testGroups"]
            for t in g["tests"]]
    rs, ok = native.der_parse_batch(sigs)
    for i, sg in enumerate(sigs):
        p = der.sig_der_parse(sg)
        assert bool(ok[i]) == (p is not None), (i, sg.hex())
        if p:
            assert int.from_bytes(bytes(rs[i, :32]), "big") == p[0]
            assert int.from_bytes(bytes(rs[i, 32:]), "big") == p[1]
