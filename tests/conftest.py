"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (SURVEY §4:
the reference has no such layer — its multi-GPU path was only testable on
a real 4-GPU box, hugewiki.cu:41)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may preset JAX_PLATFORMS (e.g. to the TPU tunnel) and a
# pytest plugin may import jax before this conftest runs; the config API
# still wins as long as no backend has been initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from cumf_als_tpu.data.synthetic import synthetic_ratings  # noqa: E402


@pytest.fixture(scope="session")
def small_problem():
    """A small skewed synthetic problem shared across tests."""
    train, test = synthetic_ratings(m=60, n=45, nnz=1400, nnz_test=200,
                                    rank=4, noise=0.05, seed=3)
    return train, test


@pytest.fixture(scope="session")
def medium_problem():
    train, test = synthetic_ratings(m=300, n=220, nnz=12000, nnz_test=1500,
                                    rank=6, noise=0.1, seed=7)
    return train, test
