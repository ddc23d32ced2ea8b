"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize imports jax and registers the axon TPU backend
at interpreter start, so plain env vars are too late; instead the jax config
is redirected here before any backend is instantiated. The axon tunnel is
single-client -- tests must never touch it.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import os
import zipfile

import numpy as np
import pytest

from soc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

# The reference soc_example inputs are the golden fixtures for the
# end-to-end tests; extract them up front so those tests can never
# silently skip.
SOCEX = "/tmp/socex"
_ZIP = "/root/reference/soc_example.zip"
if not os.path.exists(os.path.join(SOCEX, "tmp.dust")) \
        and os.path.exists(_ZIP):
    os.makedirs(SOCEX, exist_ok=True)
    with zipfile.ZipFile(_ZIP) as z:
        for name in ("my.ini", "tmp.dust", "tmp.dsc", "bg_intensity.bin",
                     "freq.dat"):
            z.extract(name, SOCEX)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
