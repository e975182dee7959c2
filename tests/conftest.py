"""Test configuration: force CPU with 8 virtual devices and float64.

Mirrors the strategy in SURVEY.md §7: statistical kernels are validated in
f64 on a virtual multi-device CPU mesh; TPU runs use f32 via bench.py.
Must set env vars before the first jax import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"   # override axon/TPU for tests
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU platform; override it so
# tests run on the virtual 8-device CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: repeated suite runs skip recompilation of the
# big MCMC programs (VERDICT r2 weak #7 — suite wall-time was ~10 min, much
# of it XLA compiles)
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
