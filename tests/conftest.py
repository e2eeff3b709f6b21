"""Test config: force CPU with 8 virtual devices so sharding tests run anywhere.

The container's sitecustomize registers an `axon` TPU PJRT plugin and the env
pins JAX_PLATFORMS=axon, so plain env overrides are not enough — we update the
jax config directly (backends initialise lazily, so this takes effect as long
as conftest runs before any jax computation, which pytest guarantees).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end test (deselect with -m 'not slow')")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Full-suite runs (~2 h, hundreds of compiled programs) have segfaulted
    the CPU backend inside late test modules (twice in test_training, at
    different tests; each passes in isolation). Dropping the executable
    cache between modules bounds accumulated backend state; the recompiles
    it costs are small next to suite runtime."""
    jax.clear_caches()
    yield
