"""Test configuration.

Runs the suite on CPU with a virtual 8-device mesh so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4 "multi-node testing
without a cluster").  Set SECP_TPU_TEST_PLATFORM=tpu to run on real chips.
"""

import os

# Explicit assignment, NOT setdefault: this image exports
# JAX_PLATFORMS=axon globally (tunnel plugin), which would silently put
# the whole suite on the tunneled TPU.  SECP_TPU_TEST_PLATFORM remains
# the intentional override.
os.environ["JAX_PLATFORMS"] = os.environ.get("SECP_TPU_TEST_PLATFORM",
                                             "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags and \
        os.environ["JAX_PLATFORMS"] == "cpu":
    # opt-level 1: compile cost is the same as 0 within noise (LLVM
    # codegen dominates), but 0 leaves scan bodies unfused and the
    # 256-iteration limb loops then run at per-thunk dispatch cost —
    # 20-40x slower execution (measured round 4).
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
        " --xla_backend_optimization_level=1"
        " --xla_llvm_disable_expensive_passes=true").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# jax 0.9.0 + the axon PJRT plugin ignore the JAX_PLATFORMS env var
# (the tunnel backend self-registers and wins default_backend()); the
# config key is honored, so enforce the choice in-process too.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compilation cache: the big scan programs (ecmult etc.) are
# expensive to compile on CPU; cache across test runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/secp_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


# Smoke tier: compile-light modules that finish in ~2 minutes on a
# 1-core host (`pytest -m smoke`); the fast tier is `-m "not slow"`,
# everything is the full tier.  Auto-marked by module so the list
# lives in one place.
_SMOKE_MODULES = {"test_der", "test_sha256", "test_limb",
                  "test_context", "test_glv", "test_divsteps"}


def pytest_collection_modifyitems(items):
    for it in items:
        if it.module.__name__ in _SMOKE_MODULES:
            it.add_marker(pytest.mark.smoke)
