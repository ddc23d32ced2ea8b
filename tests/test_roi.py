"""ROI photon save/load: two-stage domain coupling reproduces the direct
absorption inside the region of interest."""

import numpy as np
import jax.numpy as jnp
import pytest

from soc_tpu.grid import uniform_grid
from soc_tpu.io.dust import hg_scattering_function
from soc_tpu.transport import roi as roi_mod
from soc_tpu.transport.propagate import transport_run


def physics_base(kabs=0.1, bins=64):
    dsc, csc = hg_scattering_function([0.0], bins)
    return dict(kabs=jnp.float32(kabs), ksca=jnp.float32(0.0),
                csc=jnp.asarray(csc[0]), tw=jnp.float32(1.0))


def test_roi_mask():
    grid = uniform_grid(6, 6, 6)
    mask = roi_mod.roi_cell_mask(grid, [2, 3, 2, 3, 2, 3])
    assert mask.sum() == 8
    m3 = mask.reshape(6, 6, 6)
    assert m3[2:4, 2:4, 2:4].all()


def test_roi_roundtrip_absorption():
    nx = 12
    box = [4, 7, 4, 7, 4, 7]          # 4^3 root-cell ROI
    kabs = 0.1
    grid_a = uniform_grid(nx, nx, nx, density=1.0)
    mask = roi_mod.roi_cell_mask(grid_a, box)

    physics = physics_base(kabs)
    physics["roi_mask"] = jnp.asarray(mask)
    physics["roi_box"] = tuple(box)
    physics["roi_dim"] = (4, 4, 4, 1)
    nside = 8
    npix = 12 * nside * nside
    nelem = roi_mod.roi_nelem(4, 4, 4)
    n = 32 * int(grid_a.area)
    params = dict(photons=jnp.float32(1.0), ifreq=jnp.int32(0),
                  per_freq=jnp.int32(n))
    tabs = jnp.zeros(grid_a.cells, jnp.float32)
    intf = jnp.zeros((1, 1), jnp.float32)
    rt = jnp.zeros(nelem * npix, jnp.float32)
    tabs, _, esc, absd, rt = transport_run(
        grid_a, physics, params, jnp.int32(n), tabs, intf, 21,
        source_kind="bg", nlanes=1 << 13, roi_nside=nside, roi_tally=rt)
    rt = np.asarray(rt)
    tabs = np.asarray(tabs)
    assert rt.sum() > 0

    # direct absorbed energy inside the box
    direct = tabs[mask].sum()

    # stage B: sub-model = the box itself at the same resolution
    grid_b = uniform_grid(4, 4, 4, density=1.0)
    reps = 4
    total_b = nelem * npix * reps
    physics_b = physics_base(kabs)
    params_b = dict(roi_load=jnp.asarray(rt.reshape(nelem, npix)),
                    roi_dim=(4, 4, 4),
                    reps=jnp.int32(reps),
                    ifreq=jnp.int32(0), per_freq=jnp.int32(total_b))
    tabs_b = jnp.zeros(grid_b.cells, jnp.float32)
    intf_b = jnp.zeros((1, 1), jnp.float32)
    tabs_b, _, esc_b, absd_b = transport_run(
        grid_b, physics_b, params_b, jnp.int32(total_b), tabs_b, intf_b,
        22, source_kind="roi", nlanes=1 << 13)
    absorbed_b = float(np.asarray(tabs_b).sum())

    # boundary flux conservation: injected into B == photons saved by A
    injected_b = rt.sum()
    assert abs(absorbed_b + float(esc_b[0]) - injected_b) / injected_b < 0.01
    # domain coupling: absorbed inside the box matches the direct run
    assert abs(absorbed_b - direct) / direct < 0.1, (absorbed_b, direct)


def test_roi_file_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.random((3, roi_mod.roi_nelem(4, 4, 4) * 768)).astype(
        np.float32)
    path = tmp_path / "roi.bin"
    roi_mod.write_roi_file(path, 4, 4, 4, 8, data)
    rnx, rny, rnz, nside, back = roi_mod.read_roi_file(path)
    assert (rnx, rny, rnz, nside) == (4, 4, 4, 8)
    np.testing.assert_array_equal(back, data)
