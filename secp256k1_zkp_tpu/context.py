"""Library context: device-resident tables + configuration.

TPU analogue of ``secp256k1_context`` (src/secp256k1.c:82-261): the
context owns the precomputed fixed-base table (the counterpart of the
link-time tables precomputed_ecmult_gen.c / precomputed_ecmult.c) and is
a pytree, so it threads through jit boundaries as ordinary data.
"Creation" is the host->device table upload (SURVEY.md §3.1).

``randomize`` implements the scalar-offset + point-offset half of the
reference's ecmult_gen blinding (src/ecmult_gen_impl.h:285-339): a
secret offset b is derived from the seed via RFC6979-shaped HMAC-DRBG,
and every blinded fixed-base multiply computes (k+b)*G + (-b)*G.  On
TPU the kernels are fixed-dataflow (no secret-dependent timing), but
the blinding still hedges the compromised-RNG / fault-injection models
the reference cites, at the cost of one mixed add per ecmult_gen.  The
reference's third blind — the projective Z rescale — has no analog
here (no secret-dependent normalization exists to hide).
"""

from __future__ import annotations

import hashlib
import hmac as _hmac
from functools import lru_cache

import numpy as np

from .ops import ecmult


def selftest() -> None:
    """SHA256 known-answer test, run at context creation exactly like
    secp256k1_selftest (src/selftest.h:14-34, secp256k1.c:109-113).
    Validates the host compression function that seeds every device
    midstate; raises on mismatch."""
    from .utils import sha256_host
    base = b"secp256k1_zkp_tpu selftest: pluggable compression KAT"
    msg = base + b"." * (64 - len(base))
    st = sha256_host.compress(list(sha256_host.INIT), msg)
    pad = bytes([0x80] + [0] * 55) + (64 * 8).to_bytes(8, "big")
    st2 = sha256_host.compress(st, pad)
    got = b"".join(w.to_bytes(4, "big") for w in st2).hex()
    want = "7df9d205f1b40a45c888f99a1b500eb9626ab62d1769a316c066551a9e8eedcc"
    if got != want:
        raise RuntimeError(f"SHA256 selftest failure: {got}")


def _derive_blind(seed32: bytes, n: int) -> int:
    """HMAC-SHA256 DRBG -> scalar in [1, n-1].

    Same derivation shape as the reference's ecmult_gen_blind
    (src/ecmult_gen_impl.h:306-331: rfc6979 chain keyed on the current
    blind XOR seed, retry-until-valid)."""
    v = b"\x01" * 32
    k = b"\x00" * 32
    k = _hmac.new(k, v + b"\x00" + seed32, hashlib.sha256).digest()
    v = _hmac.new(k, v, hashlib.sha256).digest()
    k = _hmac.new(k, v + b"\x01" + seed32, hashlib.sha256).digest()
    v = _hmac.new(k, v, hashlib.sha256).digest()
    while True:
        v = _hmac.new(k, v, hashlib.sha256).digest()
        b = int.from_bytes(v, "big")
        if 0 < b < n:
            return b
        k = _hmac.new(k, v + b"\x00", hashlib.sha256).digest()
        v = _hmac.new(k, v, hashlib.sha256).digest()


class Context:
    """Holds the fixed-base generator table and the ecmult_gen blinding
    state (``blind`` — None until :meth:`randomize` is called, matching
    the reference's unblinded static context, src/secp256k1.c:90-98)."""

    def __init__(self, window: int = ecmult.WINDOW, hash_compress=None):
        selftest()
        if hash_compress is not None:
            self.set_hash_compress(hash_compress)
        self.gen_table = ecmult.GenTable(window)
        self.blind = None

    @staticmethod
    def set_hash_compress(fn) -> None:
        """Install a custom SHA256 compression function for every hash
        path in the library and validate it with the device KAT —
        the per-context compression hook of the fork
        (include/secp256k1.h:420-446, src/secp256k1.c:247-261), with
        the selftest gate of src/selftest.h:14-34.  Pass None to
        restore the builtin.  Trace-time configuration: install before
        jitting (cached executables keep whichever hook they traced)."""
        from .ops import sha256 as H
        prev = H.set_compress(fn)
        if fn is None:
            return
        try:
            import numpy as np
            got = np.asarray(H.words_to_bytes32(H.sha256_bytes(
                np.frombuffer(b"\x61" * 32, np.uint8)[None, :])))[0]
            want = hashlib.sha256(b"\x61" * 32).digest()
            if bytes(got) != want:
                raise RuntimeError(
                    "custom SHA256 compression failed the selftest KAT")
        except Exception:
            H.set_compress(prev)
            raise

    def randomize(self, seed32: bytes | None = None) -> "Context":
        """Re-derive the ecmult_gen blinding from seed32
        (secp256k1_context_randomize, src/secp256k1.c:833-841).
        seed32=None resets to the unblinded state, like the reference's
        NULL seed path."""
        if seed32 is None:
            self.blind = None
            return self
        from .utils import hostcurve
        b = _derive_blind(seed32, hostcurve.N)
        gbx, gby = hostcurve.mul(hostcurve.N - b)
        lim = lambda v: tuple((v >> (16 * i)) & 0xFFFF for i in range(16))
        self.blind = (
            lim(b),
            np.array(lim(gbx), np.uint32),
            np.array(lim(gby), np.uint32),
        )
        return self


@lru_cache(maxsize=1)
def default_context() -> Context:
    return Context()
