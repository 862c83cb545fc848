"""Wycheproof conformance: ECDSA (bitcoin flavor: strict DER + low-S).

Uses the same vector JSON the reference converts into C headers
(src/wycheproof/ecdsa_secp256k1_sha256_bitcoin_test.json; harness at
src/tests.c:7799-7835).  The whole vector set runs as ONE batched verify
— the TPU-native shape for this workload.
"""

import hashlib
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from secp256k1_zkp_tpu.modules import ecdsa, eckey
from secp256k1_zkp_tpu.utils import der

WYCHEPROOF = "/root/reference/src/wycheproof/" \
    "ecdsa_secp256k1_sha256_bitcoin_test.json"


@pytest.mark.skipif(not os.path.exists(WYCHEPROOF),
                    reason="wycheproof vectors not available")
def test_wycheproof_ecdsa_bitcoin():
    with open(WYCHEPROOF) as f:
        data = json.load(f)

    msgs, sigs, pubs, expect, ids = [], [], [], [], []
    n_der_rejected = 0
    for grp in data["testGroups"]:
        pub = bytes.fromhex(grp["publicKey"]["uncompressed"])
        for t in grp["tests"]:
            exp = t["result"] in ("valid", "acceptable")
            parsed = der.sig_der_parse(bytes.fromhex(t["sig"]))
            if parsed is None:
                # malformed DER must be invalid
                assert not exp or "MissingZero" in t.get("flags", []) or \
                    True, t["tcId"]
                assert t["result"] == "invalid", \
                    f"tcId {t['tcId']}: DER rejected but expected valid"
                n_der_rejected += 1
                continue
            r, s = parsed
            if r >= 2 ** 256 or s >= 2 ** 256:
                assert t["result"] == "invalid"
                n_der_rejected += 1
                continue
            msgs.append(hashlib.sha256(bytes.fromhex(t["msg"])).digest())
            sigs.append(r.to_bytes(32, "big") + s.to_bytes(32, "big"))
            pubs.append(pub)
            expect.append(exp)
            ids.append(t["tcId"])

    n = len(msgs)
    assert n > 100 and n_der_rejected > 50  # sanity: both paths exercised

    msg_a = jnp.asarray(np.array([list(m) for m in msgs], dtype=np.uint8))
    sig_a = jnp.asarray(np.array([list(s) for s in sigs], dtype=np.uint8))
    pub_a = jnp.asarray(np.array([list(p) for p in pubs], dtype=np.uint8))

    @jax.jit
    def batch_verify(msg_a, sig_a, pub_a):
        pk, pk_ok = eckey.pubkey_parse(pub_a)
        return ecdsa.verify(msg_a, sig_a, pk) & pk_ok

    got = np.asarray(batch_verify(msg_a, sig_a, pub_a))
    mismatches = [(ids[i], expect[i], bool(got[i]))
                  for i in range(n) if bool(got[i]) != expect[i]]
    assert not mismatches, f"{len(mismatches)} mismatches: {mismatches[:10]}"
