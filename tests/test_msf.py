"""Multiple scattering functions: per-cell species selection."""

import numpy as np
import jax.numpy as jnp

from soc_tpu.grid import uniform_grid
from soc_tpu.io.dust import hg_scattering_function
from soc_tpu.transport.propagate import transport_run


def base_physics(csc_row, bins):
    return dict(kabs=jnp.float32(0.05), ksca=jnp.float32(0.3),
                csc=jnp.asarray(csc_row), tw=jnp.float32(1.0))


def run(grid, physics, n, seed=19):
    params = dict(photons=jnp.float32(1.0), ifreq=jnp.int32(0),
                  per_freq=jnp.int32(n))
    tabs = jnp.zeros(grid.cells, jnp.float32)
    intf = jnp.zeros((1, 1), jnp.float32)
    tabs, _, esc, absd = transport_run(
        grid, physics, params, jnp.int32(n), tabs, intf, seed,
        source_kind="bg", nlanes=1 << 12)
    return np.asarray(tabs), float(esc[0]), float(absd)


def test_msf_single_species_matches_plain():
    """Abundance (1, 0): MSF must reproduce the single-function run exactly
    (same packet ids, same draws, species fixed to dust 0)."""
    bins = 128
    grid = uniform_grid(6, 6, 6, density=1.0)
    dsc, csc = hg_scattering_function([0.7, -0.7], bins)
    n = 8 * int(grid.area)
    physics = base_physics(csc[0], bins)
    tabs_a, esc_a, abs_a = run(grid, physics, n)

    physics_m = base_physics(csc[0], bins)
    abu = np.zeros((grid.cells, 2), np.float32)
    abu[:, 0] = 1.0
    physics_m["msf_csc"] = jnp.asarray(csc)
    physics_m["msf_sca"] = jnp.asarray([1.0, 1.0], jnp.float32)
    physics_m["msf_abu"] = jnp.asarray(abu)
    tabs_b, esc_b, abs_b = run(grid, physics_m, n)
    np.testing.assert_allclose(tabs_b, tabs_a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(esc_b, esc_a, rtol=1e-6)


def test_msf_mixture_between_extremes():
    """50/50 forward/backward mixture: conservation holds and the absorbed
    total lies between the pure-species runs."""
    bins = 128
    grid = uniform_grid(8, 8, 8, density=1.0)
    dsc, csc = hg_scattering_function([0.9, -0.9], bins)
    n = 8 * int(grid.area)
    tabs_f, esc_f, abs_f = run(grid, base_physics(csc[0], bins), n)
    tabs_r, esc_r, abs_r = run(grid, base_physics(csc[1], bins), n)
    physics = base_physics(csc[0], bins)
    physics["msf_csc"] = jnp.asarray(csc)
    physics["msf_sca"] = jnp.asarray([1.0, 1.0], jnp.float32)
    physics["msf_abu"] = jnp.asarray(
        np.full((grid.cells, 2), 0.5, np.float32))
    tabs_m, esc_m, abs_m = run(grid, physics, n)
    assert abs(abs_m + esc_m - n) / n < 5e-3
    lo, hi = sorted([abs_f, abs_r])
    assert lo * 0.98 < abs_m < hi * 1.02


def test_step_weight_unbiased():
    """Free-path stretching (STEP_WEIGHT==1): the weighted estimator must
    reproduce the unweighted absorbed energy in expectation."""
    grid = uniform_grid(8, 8, 8, density=1.0)
    dsc, csc = hg_scattering_function([0.3], 128)
    n = 16 * int(grid.area)
    base = dict(kabs=jnp.float32(0.15), ksca=jnp.float32(0.2),
                csc=jnp.asarray(csc[0]), tw=jnp.float32(1.0))
    tabs_p, esc_p, abs_p = run(grid, base, n)
    phys_w = dict(base)
    phys_w["sw_a"] = jnp.float32(0.6)      # stretched free paths
    tabs_w, esc_w, abs_w = run(grid, phys_w, n, seed=23)
    # totals agree statistically (weighted MC has higher variance)
    assert abs(abs_w - abs_p) / abs_p < 0.05, (abs_w, abs_p)
    assert abs((abs_w + esc_w) - (abs_p + esc_p)) / n < 0.05
    # absorbed profile consistent
    pa = tabs_p.reshape(8, 8, 8).mean(axis=(0, 1))
    pw = tabs_w.reshape(8, 8, 8).mean(axis=(0, 1))
    np.testing.assert_allclose(pw, pa, rtol=0.15)
