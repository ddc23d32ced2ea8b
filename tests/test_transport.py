"""Transport engine: energy conservation and physical-limit tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from soc_tpu.grid import uniform_grid
from soc_tpu.io.dust import hg_scattering_function
from soc_tpu.transport.medium import Medium, trapezoid_weights
from soc_tpu.transport.propagate import transport_run
from soc_tpu.constants import ADHOC


def make_medium(abs_gl, sca_gl, g=0.0, nfreq=3, bins=256, freq=None):
    if freq is None:
        freq = np.logspace(11, 13, nfreq)
    dsc, csc = hg_scattering_function([g] * nfreq, bins)
    return Medium(
        abs_gl=jnp.asarray(np.full(nfreq, abs_gl, np.float32)),
        sca_gl=jnp.asarray(np.full(nfreq, sca_gl, np.float32)),
        csc=jnp.asarray(csc), dsc=jnp.asarray(dsc),
        tw=jnp.asarray(trapezoid_weights(freq)),
        nfreq=nfreq, bins=bins,
    )


def run_background(grid, medium, n_per_freq, photons_per_packet=1.0, seed=11,
                   nlanes=1 << 14):
    """Per-frequency (uniform fast path) background run over all channels."""
    nfreq = medium.nfreq
    tabs = jnp.zeros(grid.cells, jnp.float32)
    intf = jnp.zeros((grid.cells, nfreq), jnp.float32)
    esc = np.zeros(nfreq)
    absd = np.zeros(nfreq)
    for f in range(nfreq):
        physics = dict(kabs=medium.abs_gl[f], ksca=medium.sca_gl[f],
                       csc=medium.csc[f], tw=medium.tw[f])
        params = dict(photons=jnp.float32(photons_per_packet),
                      ifreq=jnp.int32(f), per_freq=jnp.int32(n_per_freq))
        tabs, intf, e, a = transport_run(
            grid, physics, params, jnp.int32(n_per_freq), tabs, intf, seed,
            source_kind="bg", nlanes=nlanes, per_freq_tally=True)
        esc[f] = float(e[0])
        absd[f] = float(a)
    return np.asarray(tabs), np.asarray(intf), esc, absd


def test_energy_conservation_absorbing():
    grid = uniform_grid(8, 8, 8, density=1.0)
    medium = make_medium(abs_gl=0.2, sca_gl=0.0)
    n = 8 * int(grid.area)
    tabs, intf, escaped, absd = run_background(grid, medium, n)
    for f in range(3):
        absorbed = intf[:, f].sum()
        np.testing.assert_allclose(absorbed, absd[f], rtol=1e-4)
        total = absorbed + escaped[f]
        assert abs(total - n) / n < 2e-3, (f, total, n)


def test_energy_conservation_scattering():
    grid = uniform_grid(8, 8, 8, density=1.0)
    medium = make_medium(abs_gl=0.1, sca_gl=0.3, g=0.5)
    n = 8 * int(grid.area)
    tabs, intf, escaped, absd = run_background(grid, medium, n)
    for f in range(3):
        total = intf[:, f].sum() + escaped[f]
        assert abs(total - n) / n < 5e-3, (f, total, n)


def test_optically_thin_absorption_matches_chord():
    """tau->0: total absorbed = injected * k_abs*n*<chord> with mean chord
    <l> = 4V/S for a convex body."""
    grid = uniform_grid(12, 12, 12, density=1.0)
    kabs = 1.0e-3
    medium = make_medium(abs_gl=kabs, sca_gl=0.0, nfreq=2)
    n = 16 * int(grid.area)
    tabs, intf, escaped, absd = run_background(grid, medium, n)
    v = 12.0**3
    s = 6 * 12.0**2
    expect = n * kabs * (4.0 * v / s)
    for f in range(2):
        got = intf[:, f].sum()
        assert abs(got - expect) / expect < 0.01, (f, got, expect)


def test_slab_attenuation_profile():
    nx = 16
    grid = uniform_grid(nx, nx, nx, density=1.0)
    medium = make_medium(abs_gl=0.5, sca_gl=0.0, nfreq=1)
    n = 32 * int(grid.area)
    tabs, intf, escaped, absd = run_background(grid, medium, n)
    field3d = intf[:, 0].reshape(nx, nx, nx)
    prof = field3d.mean(axis=(0, 1))
    np.testing.assert_allclose(prof, prof[::-1], rtol=0.05)
    assert prof[0] > prof[nx // 2]
    assert np.all(np.diff(prof[: nx // 2]) < 0.05 * prof[0])


def test_tabs_is_trapezoid_weighted_intf():
    grid = uniform_grid(6, 6, 6, density=2.0)
    freq = np.asarray([1e11, 3e11, 1e12])
    medium = make_medium(abs_gl=0.3, sca_gl=0.1, nfreq=3, freq=freq)
    n = 4 * int(grid.area)
    tabs, intf, escaped, absd = run_background(grid, medium, n)
    tw = trapezoid_weights(freq)
    expect = (intf * tw[None, :]).sum(axis=1) * ADHOC
    np.testing.assert_allclose(tabs, expect, rtol=2e-3, atol=1e-6)


def test_scattering_conserves_photons_with_albedo_one():
    grid = uniform_grid(8, 8, 8, density=1.0)
    medium = make_medium(abs_gl=0.0, sca_gl=0.5, g=0.3, nfreq=1)
    n = 4 * int(grid.area)
    tabs, intf, escaped, absd = run_background(grid, medium, n)
    assert intf.sum() < 1e-6
    assert abs(escaped[0] - n) / n < 2e-3


def test_mixed_vs_uniform_frequency_equivalence():
    """The mixed-frequency pool and the per-frequency fast path must produce
    identical physics: same global packet ids -> same RNG streams -> same
    trajectories -> allclose tallies (scatter-add order differs)."""
    grid = uniform_grid(6, 6, 6, density=1.0)
    medium = make_medium(abs_gl=0.2, sca_gl=0.2, g=0.4, nfreq=2)
    n = 2 * int(grid.area)
    # per-frequency runs
    tabs_u, intf_u, esc_u, _ = run_background(grid, medium, n)
    # one mixed run covering both frequencies
    physics = dict(kabs=medium.abs_gl, ksca=medium.sca_gl,
                   csc=medium.csc, tw=medium.tw)
    params = dict(photons=jnp.ones(2, jnp.float32), ifreq=None,
                  per_freq=jnp.int32(n))
    tabs = jnp.zeros(grid.cells, jnp.float32)
    intf = jnp.zeros((grid.cells, 2), jnp.float32)
    tabs_m, intf_m, esc_m, abs_m = transport_run(
        grid, physics, params, jnp.int32(2 * n), tabs, intf, 11,
        source_kind="bg", nlanes=1 << 13, per_freq_tally=True)
    np.testing.assert_allclose(np.asarray(intf_m), intf_u, rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(float(esc_m[0]), esc_u.sum(), rtol=2e-4)


def test_point_source_inverse_square():
    nx = 17
    grid = uniform_grid(nx, nx, nx, density=1.0)
    medium = make_medium(abs_gl=2e-3, sca_gl=0.0, nfreq=1)
    n = 200000
    physics = dict(kabs=medium.abs_gl[0], ksca=medium.sca_gl[0],
                   csc=medium.csc[0], tw=medium.tw[0])
    params = dict(ps_pos=jnp.asarray([[nx / 2, nx / 2, nx / 2]], jnp.float32),
                  photons=jnp.ones(1, jnp.float32),
                  ifreq=jnp.int32(0), per_freq=jnp.int32(n))
    tabs = jnp.zeros(grid.cells, jnp.float32)
    intf = jnp.zeros((grid.cells, 1), jnp.float32)
    tabs, intf, esc, absd = transport_run(
        grid, physics, params, jnp.int32(n), tabs, intf, 3,
        source_kind="ps", nlanes=1 << 14, per_freq_tally=True)
    field = np.asarray(intf[:, 0]).reshape(nx, nx, nx)
    c = nx / 2.0
    zz, yy, xx = np.meshgrid(*[np.arange(nx) + 0.5] * 3, indexing="ij")
    r = np.sqrt((xx - c) ** 2 + (yy - c) ** 2 + (zz - c) ** 2)
    sums = []
    for r0 in (2.0, 4.0, 6.0):
        m = (r >= r0) & (r < r0 + 1.0)
        sums.append(field[m].sum())
    rel = np.asarray(sums) / sums[0]
    np.testing.assert_allclose(rel, 1.0, atol=0.08)
    assert abs(field.sum() + float(esc[0]) - n) / n < 3e-3


def test_negative_weight_packets_propagate():
    """WITH_REFERENCE delta packets carry negative weights; the transport
    must treat them linearly: tallies of emit and -emit are exact mirrors
    (the old `photons < PHOTON_LIMIT` kill destroyed them at birth)."""
    import jax.numpy as jnp
    from soc_tpu.grid import uniform_grid
    from soc_tpu.io.dust import hg_scattering_function
    from soc_tpu.transport.propagate import transport_run
    from soc_tpu.transport.sources import stream_hi_base

    grid = uniform_grid(8, 8, 8, density=1.0)
    dsc, csc = hg_scattering_function([0.5], 128)
    physics = dict(kabs=jnp.float32(0.15), ksca=jnp.float32(0.25),
                   csc=jnp.asarray(csc[0]), tw=jnp.float32(1.0))
    n = 4 * grid.cells

    def run(sign):
        emit = jnp.full(grid.cells, sign * 0.5, jnp.float32)
        params = dict(emit=emit / 4.0, per_cell=jnp.int32(4),
                      ifreq=jnp.int32(0), per_freq=jnp.int32(n),
                      hi_base=jnp.uint32(stream_hi_base("cell")))
        tabs = jnp.zeros(grid.cells, jnp.float32)
        intf = jnp.zeros((1, 1), jnp.float32)
        tabs, _, esc, _ = transport_run(grid, physics, params,
                                        jnp.int32(n), tabs, intf, 7,
                                        source_kind="cell", nlanes=512)
        return np.asarray(tabs), float(esc[0])

    tp, ep = run(+1.0)
    tn, en = run(-1.0)
    assert tp.sum() > 0
    np.testing.assert_allclose(tn, -tp, rtol=1e-6)
    np.testing.assert_allclose(en, -ep, rtol=1e-6)


def test_isotropic_dir_never_axis_aligned():
    """Exact u = 0.5 / u -> 1 draws used to produce zero direction
    components -> ds = -inf in boundary_step -> -inf tally deposits
    (regression; the reference clamps |DIR.c| >= DEPS)."""
    import jax.numpy as jnp
    from soc_tpu.transport.sources import _isotropic_dir
    from soc_tpu.ops.traverse import boundary_step
    u1 = jnp.asarray([0.5, 1.0, 0.0, 0.5], jnp.float32)
    u2 = jnp.asarray([0.0, 0.25, 0.5, 0.25], jnp.float32)
    d = np.asarray(_isotropic_dir(u1, u2))
    assert (np.abs(d) >= 1e-6).all()
    pos = jnp.full((4, 3), 2.5, jnp.float32)
    ds, npos = boundary_step(pos, jnp.asarray(d))
    assert np.isfinite(np.asarray(ds)).all()
    assert (np.asarray(ds) > 0).all()
    assert np.isfinite(np.asarray(npos)).all()
