"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no automated tests at all (SURVEY.md §4); this suite is the
capability the rebuild adds. Multi-chip sharding is exercised without TPU hardware via
xla_force_host_platform_device_count.
"""
import os

# The image's sitecustomize registers the tunneled TPU ('axon') whenever
# PALLAS_AXON_POOL_IPS is set and pins JAX_PLATFORMS=axon — tests must clear
# BOTH before importing jax to get the virtual 8-device CPU mesh.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have imported jax at interpreter startup with
# JAX_PLATFORMS=axon already baked into the config — override post-import
# (legal until the first backend is initialized).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# This environment is single-core; persistent compilation cache makes re-runs cheap.
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "quick: fast-iteration tier — `pytest -m quick` runs in <3 min "
        "(data/eval/config/ops units; no golden-torch or multihost suites)")


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
