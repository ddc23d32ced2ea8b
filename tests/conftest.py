"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices (no TPU pod needed);
set env vars before jax import.
"""

import os

# force CPU: the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel,
# which is single-client); tests must never touch it
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

from soc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
