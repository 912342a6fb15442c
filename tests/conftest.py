"""Test configuration: run on a virtual 8-device CPU mesh.

The reference runs small-N tests on the UPMEM functional simulator
(SURVEY §4); our simulator tier is JAX's CPU backend with
--xla_force_host_platform_device_count=8 so multi-chip sharding code paths
execute without TPU hardware. Must be set before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
# Persistent compile cache: XLA:CPU compiles of the while-loop kernels are
# the dominant test cost; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not honored in images that pin an ambient TPU platform
# plugin; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
