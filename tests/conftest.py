"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize imports jax and registers the axon TPU backend
at interpreter start, so plain env vars are too late; instead the jax config
is redirected here before any backend is instantiated. The axon tunnel is
single-client -- tests must never touch it.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

from soc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
