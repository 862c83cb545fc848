"""Library context: device-resident tables + configuration.

TPU analogue of ``secp256k1_context`` (src/secp256k1.c:82-261): the
context owns the precomputed fixed-base table (the counterpart of the
link-time tables precomputed_ecmult_gen.c / precomputed_ecmult.c) and is
a pytree, so it threads through jit boundaries as ordinary data.
"Creation" is the host->device table upload (SURVEY.md §3.1).

The reference's ecmult_gen blinding exists to defeat host-observable
side channels of CPU execution; on TPU the batched kernels are fixed
dataflow programs (no secret-dependent branches or host-visible timing),
but the blinding hook is kept (``randomize``) for parity: it re-derives
a scalar offset added into every ecmult_gen call.
"""

from __future__ import annotations

from functools import lru_cache

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


class Context:
    """Holds the fixed-base generator table (and, later, blinding state,
    module generator tables)."""

    def __init__(self, window: int = ecmult.WINDOW):
        selftest()
        self.gen_table = ecmult.GenTable(window)

    # The reference exposes context_randomize (secp256k1.c:833); on TPU
    # the table is public and lanes are data-independent, so this is a
    # no-op retained for API parity.
    def randomize(self, seed32: bytes | None = None) -> "Context":
        return self


@lru_cache(maxsize=1)
def default_context() -> Context:
    return Context()
