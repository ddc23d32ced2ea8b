"""Scattered-light engine: single-scattering normalization and geometry."""

import numpy as np
import jax.numpy as jnp
import pytest

from soc_tpu.grid import uniform_grid
from soc_tpu.io.dust import hg_scattering_function
from soc_tpu.render.scattered import simulate_scattering
from soc_tpu.render.mapping import observer_basis


def setup_physics(ksca, kabs=0.0, g=0.0, bins=256):
    dsc, csc = hg_scattering_function([g], bins)
    return dict(kabs=jnp.float32(kabs), ksca=jnp.float32(ksca),
                csc=jnp.asarray(csc[0]), dsc=jnp.asarray(dsc[0]),
                tw=jnp.float32(1.0))


def run_bg(grid, physics, n, npix=24, seed=5, ffs=True):
    odir, ra, de = observer_basis(0.0, 0.0)   # observer at +Z
    centre = (grid.nx / 2, grid.ny / 2, grid.nz / 2)
    params = dict(photons=jnp.float32(1.0), ifreq=jnp.int32(0),
                  per_freq=jnp.int32(n), id_offset=jnp.int32(0))
    out = simulate_scattering(grid, physics, params, n, odir, ra, de,
                              centre, 1.0, (npix, npix), seed,
                              source_kind="bg", nlanes=1 << 12,
                              capacity=1 << 14, ffs=ffs)
    return out


def test_single_scattering_normalization():
    """Optically thin, isotropic phase function: total peel-off signal =
    sum_packets W_i / (4 pi) to first order in tau."""
    nx = 8
    grid = uniform_grid(nx, nx, nx, density=1.0)
    ksca = 2.0e-3
    physics = setup_physics(ksca=ksca, g=0.0)
    n = 8 * int(grid.area)
    out = run_bg(grid, physics, n, npix=16)
    # sum of FFS weights = sum of chord scattering depths
    v, s = nx**3, 6 * nx**2
    sum_w = n * ksca * 4.0 * v / s        # <chord> = 4V/S
    expect = sum_w / (4.0 * np.pi)
    got = out.sum()
    assert abs(got - expect) / expect < 0.04, (got, expect)


def test_map_centred_and_positive():
    nx = 8
    grid = uniform_grid(nx, nx, nx, density=1.0)
    physics = setup_physics(ksca=5e-3, g=0.4)
    n = 4 * int(grid.area)
    out = run_bg(grid, physics, n, npix=24)
    assert out.shape == (1, 24, 24)
    assert np.all(out >= 0)
    # the cloud projects onto the central 8x8 region (+/- PEPS spill)
    img = out[0]
    inner = img[8:16, 8:16].sum()
    assert inner / img.sum() > 0.95
    # no signal far outside the projected cloud
    assert img[:6, :].sum() == 0 and img[:, :6].sum() == 0


def test_absorption_reduces_signal():
    nx = 8
    grid = uniform_grid(nx, nx, nx, density=1.0)
    n = 4 * int(grid.area)
    bright = run_bg(grid, setup_physics(ksca=5e-3, kabs=0.0), n).sum()
    dim = run_bg(grid, setup_physics(ksca=5e-3, kabs=0.2), n).sum()
    assert dim < 0.5 * bright
