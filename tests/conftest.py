"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax initializes (first import).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (TPU tunnel) in a way that survives
# env overrides; force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def fast_compile():
    """Disable most XLA backend optimizations for this test: CPU compile
    time of big programs drops ~3x and the semantics under test (shapes,
    finiteness, loss decrease, metric equality) are unaffected.  Do NOT use
    in golden-value tests."""
    jax.config.update("jax_disable_most_optimizations", True)
    yield
    jax.config.update("jax_disable_most_optimizations", False)


@pytest.fixture(scope="module")
def fast_compile_module():
    """Module-scoped variant for modules whose fixtures dominate compile."""
    jax.config.update("jax_disable_most_optimizations", True)
    yield
    jax.config.update("jax_disable_most_optimizations", False)
