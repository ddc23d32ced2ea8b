"""WITH_ABU per-cell extinction in EVERY map renderer.

The driver passes ext_cells [CELLS, NF] whenever abundances vary
(driver._render_phase); round 2 only render_ortho accepted a 2-D ext_gl --
the healpix / perspective / hierarchy / polarization / pstau renderers
crashed at trace time. Equivalence checks: a 2-D ext whose rows are all
equal must reproduce the 1-D result exactly; a genuinely varying ext must
change the optical depths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from soc_tpu.grid import uniform_grid
from soc_tpu.render import mapping as rm
from soc_tpu.render.polarization import render_pol, render_pol_healpix

N = 8
NF = 3


@pytest.fixture(scope="module")
def scene():
    grid = uniform_grid(N, N, N, density=1.0)
    rng = np.random.default_rng(3)
    emit = jnp.asarray(rng.uniform(0.5, 1.5,
                                   (grid.cells, NF)).astype(np.float32))
    ext1 = jnp.asarray(np.asarray([0.05, 0.1, 0.2], np.float32))
    ext2_const = jnp.tile(ext1[None, :], (grid.cells, 1))
    ext2_var = ext2_const * jnp.asarray(
        rng.uniform(0.5, 2.0, (grid.cells, 1)).astype(np.float32))
    b = jnp.asarray(np.tile(np.asarray([0.3, -0.8, 0.5], np.float32),
                            (grid.cells, 1)))
    return grid, emit, ext1, ext2_const, ext2_var, b


def _as_list(out):
    return [np.asarray(x) for x in (out if isinstance(out, (tuple, list))
                                    else (out,))]


def _check(run, scene):
    grid, emit, ext1, ext2c, ext2v, b = scene
    r1 = _as_list(run(ext1))
    r2 = _as_list(run(ext2c))
    rv = _as_list(run(ext2v))
    for a, c in zip(r1, r2):
        np.testing.assert_array_equal(a, c)
    assert all(np.isfinite(x).all() for x in rv)
    # the varying field must actually change the attenuated intensity
    assert not np.allclose(rv[0], r1[0])


def test_healpix_map_with_abu(scene):
    grid, emit, *_ = scene
    obs = (N / 2, N / 2, N / 2)
    _check(lambda e: rm.render_healpix(grid, emit, e, obs, 2)[:2], scene)


def test_perspective_map_with_abu(scene):
    grid, emit, *_ = scene
    _check(lambda e: rm.render_perspective(
        grid, emit, e, (N / 2, N / 2, N / 2), (8, 4))[:2], scene)


def test_hier_map_with_abu(scene):
    grid, emit, *_ = scene
    odir, ra, de = rm.observer_basis(0.4, 0.3)
    _check(lambda e: rm.render_ortho_hier(
        grid, emit, e, jnp.asarray(odir), jnp.asarray(ra),
        jnp.asarray(de), (N / 2, N / 2, N / 2), 1.0, (8, 8)), scene)


def test_pstau_with_abu(scene):
    grid, emit, *_ = scene
    ps = jnp.asarray([[0.3 * N, 0.5 * N, 0.5 * N]], jnp.float32)
    odir, _, _ = rm.observer_basis(0.4, 0.3)
    _check(lambda e: rm.render_pstau(grid, e, ps, jnp.asarray(odir)),
           scene)


def test_pol_plane_with_abu(scene):
    grid, emit, ext1, ext2c, ext2v, b = scene
    odir, ra, de = rm.observer_basis(0.4, 0.3)
    _check(lambda e: render_pol(
        grid, emit, e, b, 0.2, jnp.asarray(odir), jnp.asarray(ra),
        jnp.asarray(de), (N / 2, N / 2, N / 2), 1.0, (8, 8))[:3], scene)


def test_pol_healpix_with_abu(scene):
    grid, emit, ext1, ext2c, ext2v, b = scene
    _check(lambda e: render_pol_healpix(
        grid, emit, e, b, 0.2, (N / 2, N / 2, N / 2), 2)[:3], scene)
