"""Test environment: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py runs on the real chip).

Note: this image's sitecustomize registers the axon TPU plugin and
axon.register force-updates jax_platforms to "axon,cpu", overriding the
JAX_PLATFORMS env var -- so we must update jax.config AFTER that hook ran
(it runs at interpreter start, before pytest loads this conftest).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests spawn
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module: with the
    whole suite in one process, XLA:CPU segfaulted compiling the large
    8-device sharded-analysis program once ~170 earlier programs had
    accumulated (reproduced 3x at the same spot, solo and under load;
    the same test compiles fine in a fresh process).  Per-module
    recompiles of the shared small programs cost far less than the
    crash."""
    yield
    jax.clear_caches()
