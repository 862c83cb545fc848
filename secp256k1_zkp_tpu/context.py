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


class Context:
    """Holds the fixed-base generator table (and, later, blinding state,
    module generator tables)."""

    def __init__(self, window: int = ecmult.WINDOW):
        self.gen_table = ecmult.GenTable(window)

    # The reference exposes context_randomize (secp256k1.c:833); on TPU
    # the table is public and lanes are data-independent, so this is a
    # no-op retained for API parity.
    def randomize(self, seed32: bytes | None = None) -> "Context":
        return self


@lru_cache(maxsize=1)
def default_context() -> Context:
    return Context()
