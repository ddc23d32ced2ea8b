"""Transport through octree-refined grids: conservation + refinement
invariance."""

import numpy as np
import jax.numpy as jnp
import pytest

from soc_tpu.grid import uniform_grid, grid_from_arrays, encode_link_np
from soc_tpu.io.dust import hg_scattering_function
from soc_tpu.transport.propagate import transport_run


def refined_uniform_grid(nx, density, refine_cells):
    """Uniform-density cloud with some root cells refined one level.

    Refined cells keep the same physical density, so the physics must be
    identical to the unrefined cloud.
    """
    root = np.full(nx**3, density, np.float32)
    n_ref = len(refine_cells)
    for k, c in enumerate(refine_cells):
        root[c] = encode_link_np([8 * k])[0]
    l1 = np.full(8 * n_ref, density, np.float32)
    return grid_from_arrays(nx, nx, nx, [nx**3, 8 * n_ref], [root, l1])


def deeper_grid(nx, density):
    """Three-level grid: cell A refined; one of its children refined again."""
    root = np.full(nx**3, density, np.float32)
    c = (nx // 2) * nx * nx + (nx // 2) * nx + nx // 2
    root[c] = encode_link_np([0])[0]
    l1 = np.full(8, density, np.float32)
    l1[3] = encode_link_np([0])[0]
    l2 = np.full(8, density, np.float32)
    return grid_from_arrays(nx, nx, nx, [nx**3, 8, 8], [root, l1, l2])


def run_bg(grid, n, kabs=0.15, ksca=0.1, seed=13, per_freq_tally=False):
    dsc, csc = hg_scattering_function([0.4], 128)
    physics = dict(kabs=jnp.float32(kabs), ksca=jnp.float32(ksca),
                   csc=jnp.asarray(csc[0]), tw=jnp.float32(1.0))
    params = dict(photons=jnp.float32(1.0), ifreq=jnp.int32(0),
                  per_freq=jnp.int32(n))
    tabs = jnp.zeros(grid.cells, jnp.float32)
    intf = jnp.zeros((1, 1), jnp.float32)
    tabs, _, esc, absd = transport_run(
        grid, physics, params, jnp.int32(n), tabs, intf, seed,
        source_kind="bg", nlanes=1 << 13, max_iters=1 << 16)
    return np.asarray(tabs), float(esc[0]), float(absd)


def test_octree_energy_conservation():
    grid = refined_uniform_grid(6, 1.0, refine_cells=[43, 86, 100, 151])
    n = 16 * int(grid.area)
    tabs, esc, absd = run_bg(grid, n)
    assert abs(absd + esc - n) / n < 5e-3, (absd, esc, n)
    assert abs(tabs.sum() - absd) / absd < 1e-3


def test_refinement_invariance():
    """Same physical cloud, refined vs unrefined: total absorbed energy and
    the root-level absorption pattern must match (statistically)."""
    nx = 6
    n = 32 * 6 * nx * nx * 2
    flat = uniform_grid(nx, nx, nx, 1.0)
    tabs_f, esc_f, abs_f = run_bg(flat, n)
    refine = [0, 43, 86, 100, 151, 215]
    grid = refined_uniform_grid(nx, 1.0, refine)
    tabs_r, esc_r, abs_r = run_bg(grid, n)
    # conservation both ways, matching totals
    assert abs(abs_r + esc_r - n) / n < 5e-3
    assert abs(abs_r - abs_f) / abs_f < 0.01, (abs_r, abs_f)
    # per-root-cell comparison: sum children into parents
    root_r = tabs_r[: nx**3].copy()
    for k, c in enumerate(refine):
        root_r[c] = tabs_r[nx**3 + 8 * k: nx**3 + 8 * (k + 1)].sum()
    # refined cells carry the same absorbed energy as in the flat cloud
    ratio = root_r[refine] / tabs_f[refine]
    np.testing.assert_allclose(ratio, 1.0, atol=0.15)


def test_three_level_grid():
    grid = deeper_grid(5, 2.0)
    n = 24 * int(grid.area)
    tabs, esc, absd = run_bg(grid, n, kabs=0.3, ksca=0.2)
    assert abs(absd + esc - n) / n < 5e-3
    # the doubly-refined cells received energy
    assert tabs[-8:].sum() > 0
