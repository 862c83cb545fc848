"""Frozen trace-time configuration.

The reference fixes every algorithmic constant at compile time
(configure.ac:141-254: --with-ecmult-window, --with-ecmult-gen-kb,
ENABLE_MODULE_* defines) so the hot path never branches on
configuration.  The TPU analog is this frozen dataclass: resolved ONCE
(env overrides read at first use), then treated as trace-time
constants — every jitted program specializes on it, exactly like the
reference's preprocessor constants specialize the C.

Mutating configuration after kernels have been traced would silently
de-sync cached executables from the flags, so ``set_config`` replaces
the whole frozen object and is test-only by contract.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class Config:
    # Kernel dispatch: None = auto (Pallas on TPU backends, jnp
    # elsewhere); True/False force.  Env: SECP_TPU_NO_PALLAS=1 -> False.
    use_pallas: bool | None = None
    # SHA256 compression body: rolled lax.scan (compile-small) or
    # unrolled 64 rounds.  None = auto: unrolled on TPU backends (~20%
    # faster on the batch-verify hash tree, measured round 5), rolled
    # on CPU where the 1.6k-op body is an XLA:CPU compile bomb.
    # Env: SECP_TPU_UNROLL_SHA (0/1 forces).
    sha_unroll: bool | None = None
    # Kernel block width override (lanes per Mosaic grid step); None =
    # auto_tb picks from the batch.  Env: SECP_TPU_TB.
    tb: int | None = None
    # Strauss/GLV window width for the verify engines (w5 signed digits
    # mirrors WINDOW_A=5, src/ecmult_impl.h:35).  Informational: the
    # kernels are generated for w=5; changing this requires new tables.
    window_a: int = 5
    # Strauss -> Pippenger crossover for ecmult_multi
    # (ECMULT_PIPPENGER_THRESHOLD analog, src/ecmult_impl.h:55).
    pippenger_threshold: int = 88
    # Window width for the portable jnp engines (ops/ecmult.py).  The
    # default 4 is the throughput shape; 1 shrinks every scan body to
    # one double + add, which cuts XLA:CPU's per-op compile cost ~4x —
    # the multichip dryrun and 1-core CI set SECP_TPU_JNP_WINDOW=1
    # (correctness-only runs; identical dataflow, shorter trace).
    jnp_window: int = 4

    def pallas_enabled(self) -> bool:
        """Resolve the dispatch tri-state against the live backend."""
        if self.use_pallas is not None:
            return self.use_pallas
        import jax
        return jax.default_backend() not in ("cpu",)

    def sha_unrolled(self) -> bool:
        """Resolve the SHA-body tri-state against the live backend."""
        if self.sha_unroll is not None:
            return self.sha_unroll
        return self.pallas_enabled()


def _from_env() -> Config:
    tb = os.environ.get("SECP_TPU_TB")
    return Config(
        use_pallas=(False if os.environ.get("SECP_TPU_NO_PALLAS")
                    else None),
        sha_unroll=(bool(int(os.environ["SECP_TPU_UNROLL_SHA"]))
                    if "SECP_TPU_UNROLL_SHA" in os.environ else None),
        tb=int(tb) if tb else None,
        jnp_window=int(os.environ.get("SECP_TPU_JNP_WINDOW", "4")),
    )


_CONFIG = _from_env()


def config() -> Config:
    return _CONFIG


def set_config(cfg: Config) -> Config:
    """Replace the frozen config (tests only — see module docstring).
    Returns the previous value so callers can restore it."""
    global _CONFIG
    prev = _CONFIG
    _CONFIG = cfg
    return prev
