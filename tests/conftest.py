"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/pjit paths are exercised without TPU hardware.

Note: the container's sitecustomize force-registers the TPU ('axon') PJRT
plugin and clobbers JAX_PLATFORMS, so the env var alone is not enough —
jax.config.update is authoritative as long as it runs before first backend
use, which importing this conftest guarantees for the test session.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compile cache: the suite's cost is dominated by dozens of
# distinct decode-program compiles; with a warm cache a full run drops
# from ~10 min to a few minutes. Keyed by HLO, so code changes that alter
# a program recompile exactly that program.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("QA_TEST_CACHE", "/tmp/qa_cpu_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
