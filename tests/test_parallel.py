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


def test_sharded_cell_emission_matches_single_device():
    from soc_tpu.parallel.mesh import sharded_cell_emission_run
    from soc_tpu.transport.sources import stream_hi_base
    grid = uniform_grid(6, 6, 6, density=1.0)
    medium = make_medium()
    cells = grid.cells
    rng = np.random.default_rng(3)
    emitted = rng.uniform(0.5, 1.5, (cells, medium.nfreq)).astype(np.float32)
    per_cell = 4
    per_freq = per_cell * cells
    mesh = make_mesh(jax.devices(), freq_axis=2)
    tabs_sh, esc_sh = sharded_cell_emission_run(
        grid, medium, emitted, per_cell, 11, mesh, nlanes=1024)

    tabs = jnp.zeros(cells, jnp.float32)
    intf = jnp.zeros((1, 1), jnp.float32)
    esc = np.zeros(medium.nfreq)
    for f in range(medium.nfreq):
        physics = dict(kabs=medium.abs_gl[f], ksca=medium.sca_gl[f],
                       csc=medium.csc[f], tw=medium.tw[f])
        params = dict(emit=jnp.asarray(emitted[:, f] / per_cell),
                      per_cell=jnp.int32(per_cell),
                      ifreq=jnp.int32(f), per_freq=jnp.int32(per_freq),
                      hi_base=jnp.uint32(stream_hi_base("cell")))
        tabs, intf, e, _ = transport_run(
            grid, physics, params, jnp.int32(per_freq), tabs, intf, 11,
            source_kind="cell", nlanes=1024)
        esc[f] = float(e[0])
    np.testing.assert_allclose(np.asarray(tabs_sh), np.asarray(tabs),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(esc_sh), esc, rtol=5e-4)


def test_sharded_point_sources_and_solve_and_map():
    """Full sharded pipeline matches its single-device equivalent."""
    from soc_tpu.parallel.mesh import (sharded_pipeline,
                                       sharded_point_source_run,
                                       sharded_render_ortho,
                                       sharded_solve_temperature,
                                       sharded_emission)
    from soc_tpu.render.mapping import (map_scale_kk, observer_basis,
                                        render_ortho)
    from soc_tpu.solve import equilibrium
    from soc_tpu.constants import PARSEC

    grid = uniform_grid(6, 6, 6, density=1.0)
    medium = make_medium()
    freq = np.logspace(11, 13, medium.nfreq)
    mesh = make_mesh(jax.devices(), freq_axis=2)
    per_freq = 4 * int(grid.area)
    bg = np.full(medium.nfreq, 1e6, np.float32)

    out = sharded_pipeline(grid, medium, freq, bg, per_freq, 0.01, mesh,
                           iterations=2, per_cell=4, npix=(8, 8),
                           nlanes=1024)
    # single-device reference
    gl_cm = 0.01 * PARSEC
    from soc_tpu.transport.sources import stream_hi_base
    tabs = jnp.zeros(grid.cells, jnp.float32)
    intf = jnp.zeros((1, 1), jnp.float32)
    for f in range(medium.nfreq):
        physics = dict(kabs=medium.abs_gl[f], ksca=medium.sca_gl[f],
                       csc=medium.csc[f], tw=medium.tw[f])
        params = dict(photons=jnp.float32(bg[f]), ifreq=jnp.int32(f),
                      per_freq=jnp.int32(per_freq),
                      hi_base=jnp.uint32(stream_hi_base("bg")))
        tabs, intf, _, _ = transport_run(
            grid, physics, params, jnp.int32(per_freq), tabs, intf, 7,
            source_kind="bg", nlanes=1024)
    table = equilibrium.build_temperature_table(freq, medium.abs_gl, 0.01)
    emit_total = tabs
    emitted = None
    for it in range(2):
        if emitted is not None:
            tabs_it = jnp.zeros(grid.cells, jnp.float32)
            for f in range(medium.nfreq):
                physics = dict(kabs=medium.abs_gl[f],
                               ksca=medium.sca_gl[f],
                               csc=medium.csc[f], tw=medium.tw[f])
                params = dict(emit=jnp.asarray(emitted)[:, f] / 4.0,
                              per_cell=jnp.int32(4),
                              ifreq=jnp.int32(f),
                              per_freq=jnp.int32(4 * grid.cells),
                              hi_base=jnp.uint32(stream_hi_base("cell",
                                                                it)))
                tabs_it, intf, _, _ = transport_run(
                    grid, physics, params, jnp.int32(4 * grid.cells),
                    tabs_it, intf, 7, source_kind="cell", nlanes=1024)
            emit_total = tabs_it + tabs
        temperature = equilibrium.solve_temperature(grid, table,
                                                    emit_total, gl_cm)
        emitted = equilibrium.emission(freq, medium.abs_gl, temperature,
                                       gl_cm)
    np.testing.assert_allclose(np.asarray(out["temperature"]),
                               np.asarray(temperature), rtol=2e-4)
    kk = map_scale_kk(0.01)
    emit_map = (np.asarray(emitted)
                * (kk * freq)[None, :]).astype(np.float32)
    odir, ra, de = observer_basis(0.0, 0.0)
    phot, tau, colden = render_ortho(
        grid, jnp.asarray(emit_map), medium.abs_gl + medium.sca_gl,
        jnp.asarray(odir), jnp.asarray(ra), jnp.asarray(de),
        jnp.asarray((3.0, 3.0, 3.0), jnp.float32), 1.0, (8, 8))
    np.testing.assert_allclose(np.asarray(out["map"]), np.asarray(phot),
                               rtol=2e-3, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out["colden"]),
                               np.asarray(colden), rtol=1e-5)

    # point sources: sharded vs single-device
    ps_pos = np.asarray([[3.0, 3.0, 3.0]], np.float32)
    ps_phot = np.full((1, medium.nfreq), 2.0, np.float32)
    tabs_sh, esc_sh = sharded_point_source_run(
        grid, medium, ps_pos, ps_phot, 4096, 13, mesh, nlanes=1024)
    tabs1 = jnp.zeros(grid.cells, jnp.float32)
    intf1 = jnp.zeros((1, 1), jnp.float32)
    for f in range(medium.nfreq):
        physics = dict(kabs=medium.abs_gl[f], ksca=medium.sca_gl[f],
                       csc=medium.csc[f], tw=medium.tw[f])
        params = dict(ps_pos=jnp.asarray(ps_pos),
                      photons=jnp.asarray(ps_phot[:, f]),
                      ifreq=jnp.int32(f), per_freq=jnp.int32(4096),
                      hi_base=jnp.uint32(stream_hi_base("ps")))
        tabs1, intf1, _, _ = transport_run(
            grid, physics, params, jnp.int32(4096), tabs1, intf1, 13,
            source_kind="ps", nlanes=1024)
    np.testing.assert_allclose(np.asarray(tabs_sh), np.asarray(tabs1),
                               rtol=5e-4, atol=1e-6)


def test_graft_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
