"""Test harness config.

Tests run on CPU with 8 virtual devices (the multi-host simulation the
reference cannot do — SURVEY.md §4: ``XLA_FLAGS=--xla_force_host_platform_
device_count=N``).  Set RUN_TPU_TESTS=1 to run the kernel tests on a real
TPU instead of in Pallas interpreter mode.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (jax may be pre-imported by site init; the env var
# route is therefore unreliable — use config.update instead)

if os.environ.get("RUN_TPU_TESTS", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: the interpret-mode engine pipelines
    # inline hundreds of network stages and take minutes of XLA CPU
    # compile; cached executables make repeat suite runs take seconds.
    # (CPU-only: TPU runs use the repo's .jax_cache via benchmarks.)
    _cache_dir = os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache_cpu"
    )
    jax.config.update(
        "jax_compilation_cache_dir", os.path.abspath(_cache_dir)
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def on_tpu() -> bool:
    return os.environ.get("RUN_TPU_TESTS", "0") == "1"
