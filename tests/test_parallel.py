"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soc_tpu.grid import uniform_grid
from soc_tpu.io.dust import hg_scattering_function
from soc_tpu.transport.medium import Medium, trapezoid_weights
from soc_tpu.parallel.mesh import make_mesh, sharded_background_run
from soc_tpu.transport.propagate import transport_run


def make_medium(nfreq=4, bins=64):
    freq = np.logspace(11, 13, nfreq)
    dsc, csc = hg_scattering_function([0.4] * nfreq, bins)
    return Medium(abs_gl=jnp.asarray(np.full(nfreq, 0.15, np.float32)),
                  sca_gl=jnp.asarray(np.full(nfreq, 0.1, np.float32)),
                  csc=jnp.asarray(csc), dsc=jnp.asarray(dsc),
                  tw=jnp.asarray(trapezoid_weights(freq)),
                  nfreq=nfreq, bins=bins)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_background_matches_single_device():
    """dp x freq sharded run must reproduce the single-device tallies:
    packet ids (and therefore RNG streams) are global, so the physics is
    identical and only the scatter-add order differs."""
    grid = uniform_grid(6, 6, 6, density=1.0)
    medium = make_medium()
    per_freq = 4 * int(grid.area)       # divisible by dp=4
    bg_photons = np.ones(medium.nfreq, np.float32)
    mesh = make_mesh(jax.devices(), freq_axis=2)   # dp=4 x freq=2
    tabs_sh, esc_sh = sharded_background_run(
        grid, medium, bg_photons, per_freq, 7, mesh, nlanes=2048)

    # single-device reference with identical global packet ids
    tabs = jnp.zeros(grid.cells, jnp.float32)
    intf = jnp.zeros((1, 1), jnp.float32)
    esc = np.zeros(medium.nfreq)
    for f in range(medium.nfreq):
        physics = dict(kabs=medium.abs_gl[f], ksca=medium.sca_gl[f],
                       csc=medium.csc[f], tw=medium.tw[f])
        from soc_tpu.transport.sources import stream_hi_base
        params = dict(photons=jnp.float32(1.0), ifreq=jnp.int32(f),
                      per_freq=jnp.int32(per_freq),
                      hi_base=jnp.uint32(stream_hi_base("bg")))
        tabs, intf, e, _ = transport_run(
            grid, physics, params, jnp.int32(per_freq), tabs, intf, 7,
            source_kind="bg", nlanes=2048)
        esc[f] = float(e[0])

    np.testing.assert_allclose(np.asarray(tabs_sh), np.asarray(tabs),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(esc_sh), esc, rtol=5e-4)


def test_graft_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
