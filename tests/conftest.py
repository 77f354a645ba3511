"""Test env: force CPU backend with 8 fake devices BEFORE jax import
(SURVEY.md section 4 — multi-device tests without a cluster).

Pallas kernels run under interpret mode on CPU; real-TPU kernel checks live
in benchmarks/run_tpu_checks.py (the TPU chip is not assumed in CI).
"""

import os

# Parity tests exercise the Pallas kernels in interpret mode off-TPU;
# without this flag, production non-TPU callers get the XLA reference path.
os.environ["ECM_PALLAS_INTERPRET"] = "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: this environment's sitecustomize imports jax and pins
# JAX_PLATFORMS=axon before conftest runs, so the env var is too late —
# the config update below is the reliable way to force the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: CPU 3D-conv compiles dominate test wall-clock
jax.config.update("jax_compilation_cache_dir", "/tmp/ecm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
