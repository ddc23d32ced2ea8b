"""Healpix-sky background source + all-sky/perspective map renderers."""

import numpy as np
import jax.numpy as jnp
import pytest

from soc_tpu.grid import uniform_grid
from soc_tpu.io.dust import hg_scattering_function
from soc_tpu.transport.propagate import transport_run
from soc_tpu.render import mapping as rm
from soc_tpu.render import healpix as hp


def physics_for(kabs, ksca, bins=128):
    dsc, csc = hg_scattering_function([0.3], bins)
    return dict(kabs=jnp.float32(kabs), ksca=jnp.float32(ksca),
                csc=jnp.asarray(csc[0]), tw=jnp.float32(1.0))


def test_uniform_hpbg_matches_isotropic_bg():
    """A uniform Healpix sky and the cosine-law surface source have the same
    normalization: per-packet photons pi*AREA*I/(PLANCK freq N). With equal
    total photons, absorbed energy must agree statistically."""
    grid = uniform_grid(8, 8, 8, density=1.0)
    physics = physics_for(kabs=0.1, ksca=0.05)
    n = 16 * int(grid.area)
    tabs0 = jnp.zeros(grid.cells, jnp.float32)
    intf0 = jnp.zeros((1, 1), jnp.float32)
    params = dict(photons=jnp.float32(1.0), ifreq=jnp.int32(0),
                  per_freq=jnp.int32(n))
    tabs_bg, _, esc_bg, abs_bg = transport_run(
        grid, physics, params, jnp.int32(n), tabs0, intf0, 5,
        source_kind="bg", nlanes=1 << 13)

    nside = 64
    hpbg_vals = jnp.ones(12 * nside * nside, jnp.float32)
    params = dict(hpbg=hpbg_vals, cdf=None, ifreq=jnp.int32(0),
                  per_freq=jnp.int32(n))
    tabs1 = jnp.zeros(grid.cells, jnp.float32)
    intf1 = jnp.zeros((1, 1), jnp.float32)
    tabs_hp, _, esc_hp, abs_hp = transport_run(
        grid, physics, params, jnp.int32(n), tabs1, intf1, 6,
        source_kind="hpbg", nlanes=1 << 13)
    # same injected energy, statistically same absorption (independent RNG)
    assert abs(float(abs_hp) - float(abs_bg)) / float(abs_bg) < 0.02
    # absorbed spatial field also consistent (slab-averaged to beat the MC
    # noise of the per-cell tallies)
    a, b = np.asarray(tabs_bg), np.asarray(tabs_hp)
    assert abs(a.sum() - b.sum()) / a.sum() < 0.02
    pa = a.reshape(8, 8, 8).mean(axis=(1, 2))
    pb = b.reshape(8, 8, 8).mean(axis=(1, 2))
    np.testing.assert_allclose(pa, pb, rtol=0.1)


def test_weighted_hpbg_same_energy():
    """Importance-weighted pixel selection preserves the injected energy."""
    grid = uniform_grid(6, 6, 6, density=1.0)
    physics = physics_for(kabs=0.2, ksca=0.0)
    n = 8 * int(grid.area)
    nside = 16
    npx = 12 * nside * nside
    rng = np.random.default_rng(0)
    sky = (rng.random(npx).astype(np.float64) ** 4) * 10 + 0.01
    # unweighted
    p_uni = dict(hpbg=jnp.asarray(sky.astype(np.float32)), cdf=None,
                 ifreq=jnp.int32(0), per_freq=jnp.int32(n))
    t0 = jnp.zeros(grid.cells, jnp.float32)
    i0 = jnp.zeros((1, 1), jnp.float32)
    _, _, esc_u, abs_u = transport_run(grid, physics, p_uni, jnp.int32(n),
                                       t0, i0, 7, source_kind="hpbg",
                                       nlanes=1 << 12)
    # weighted (driver's HPBG_WEIGHTED preparation)
    p = sky / sky.mean()
    p = np.clip(p, 1e-3, 1e4)
    p /= p.sum()
    w = (1.0 / npx) / p
    cdf = np.cumsum(p)
    cdf[-1] = 1.00001
    p_wei = dict(hpbg=jnp.asarray((sky * w).astype(np.float32)),
                 cdf=jnp.asarray(cdf.astype(np.float32)),
                 ifreq=jnp.int32(0), per_freq=jnp.int32(n))
    t1 = jnp.zeros(grid.cells, jnp.float32)
    i1 = jnp.zeros((1, 1), jnp.float32)
    _, _, esc_w, abs_w = transport_run(grid, physics, p_wei, jnp.int32(n),
                                       t1, i1, 8, source_kind="hpbg",
                                       nlanes=1 << 12)
    tot_u = float(abs_u) + float(esc_u[0])
    tot_w = float(abs_w) + float(esc_w[0])
    assert abs(tot_w - tot_u) / tot_u < 0.05


def test_healpix_map_uniform_emission():
    """Uniform emissivity, observer at the centre: all-sky brightness varies
    only with the chord length; opposite pixels are statistically equal."""
    nx = 9
    grid = uniform_grid(nx, nx, nx, density=1.0)
    emit = jnp.ones((grid.cells, 1), jnp.float32)
    ext = jnp.asarray([1e-5], jnp.float32)
    nside = 8
    phot, tau, colden = rm.render_healpix(
        grid, emit, ext, (nx / 2, nx / 2, nx / 2), nside)
    phot = np.asarray(phot)[0]
    assert phot.min() > 0
    # brightness ~ chord length: min ~ nx/2 (face), max ~ sqrt(3)*nx/2
    ratio = phot.max() / phot.min()
    assert 1.4 < ratio < 1.85, ratio
    # tau consistent with colden * ext
    np.testing.assert_allclose(np.asarray(tau)[0],
                               np.asarray(colden) * 1e-5, rtol=1e-4)


def test_perspective_map():
    nx = 9
    grid = uniform_grid(nx, nx, nx, density=1.0)
    emit = jnp.ones((grid.cells, 1), jnp.float32)
    ext = jnp.asarray([1e-5], jnp.float32)
    phot, tau, colden = rm.render_perspective(
        grid, emit, ext, (nx / 2, nx / 2, nx / 2), (16, 8))
    phot = np.asarray(phot)[0]
    assert phot.shape == (8, 16)
    assert phot.min() > 0
    assert phot.max() / phot.min() < 2.0


def test_hierarchy_maps_sum_to_total():
    """MAP_HIER per-level maps sum to the plain orthographic map."""
    from soc_tpu.grid import grid_from_arrays, encode_link_np
    from soc_tpu.render.mapping import (observer_basis, render_ortho,
                                        render_ortho_hier)
    nx = 6
    root = np.ones(nx**3, np.float32)
    root[43] = encode_link_np([0])[0]
    root[100] = encode_link_np([8])[0]
    grid = grid_from_arrays(nx, nx, nx, [nx**3, 16],
                            [root, np.full(16, 1.0, np.float32)])
    emit = jnp.ones((grid.cells, 2), jnp.float32)
    ext = jnp.asarray([1e-4, 2e-2], jnp.float32)
    odir, ra, de = observer_basis(0.3, 0.7)
    centre = (nx / 2, nx / 2, nx / 2)
    full, _, _ = render_ortho(grid, emit, ext, jnp.asarray(odir),
                              jnp.asarray(ra), jnp.asarray(de), centre,
                              1.0, (nx, nx))
    hier = render_ortho_hier(grid, emit, ext, jnp.asarray(odir),
                             jnp.asarray(ra), jnp.asarray(de), centre,
                             1.0, (nx, nx))
    hier = np.asarray(hier)
    assert hier.shape == (2, 2, nx, nx)
    assert hier[1].sum() > 0            # refined level contributes
    np.testing.assert_allclose(hier.sum(axis=0), np.asarray(full),
                               rtol=1e-5, atol=1e-7)


def test_hpbg_entry_faces_weighted_by_area():
    """On a non-cubic grid the entry face must be chosen with probability
    ~ |dir_F| * A_F (the face's share of the beam's projected footprint),
    not ~ |dir_F| alone (the reference's rule, kernel_ASOC.c:929-944,
    which over-samples the small faces ~5x for elongated clouds)."""
    from soc_tpu.transport.sources import gen_hpbg
    nx, ny, nz = 32, 8, 8
    grid = uniform_grid(nx, ny, nz, density=1.0)
    nside = 8
    npix = 12 * nside * nside
    # delta sky: all packets from one mid-latitude pixel
    pix = npix // 3
    cdf = np.zeros(npix, np.float32)
    cdf[pix:] = 1.0
    n = 1 << 15
    params = dict(hpbg=jnp.ones(npix, jnp.float32),
                  cdf=jnp.asarray(cdf), ifreq=jnp.int32(0),
                  per_freq=jnp.int32(n))
    state = gen_hpbg(grid, jnp.arange(n, dtype=jnp.uint32), 11, params)
    pos = np.asarray(state[0] if isinstance(state, tuple) else state.pos)
    theta, phi = hp.pix2ang_ring(nside, jnp.asarray([pix]))
    d = np.asarray([np.sin(theta[0]) * np.cos(phi[0]),
                    np.sin(theta[0]) * np.sin(phi[0]),
                    -np.cos(theta[0])])
    d = d / np.linalg.norm(d)
    w = np.abs(d) * np.asarray([ny * nz, nx * nz, nx * ny])
    w = w / w.sum()
    eps = 1e-2
    on_x = (pos[:, 0] < eps) | (pos[:, 0] > nx - eps)
    on_y = (pos[:, 1] < eps) | (pos[:, 1] > ny - eps)
    on_z = (pos[:, 2] < eps) | (pos[:, 2] > nz - eps)
    frac = np.asarray([on_x.mean(), (~on_x & on_y).mean(),
                       (~on_x & ~on_y & on_z).mean()])
    assert frac.sum() > 0.999
    np.testing.assert_allclose(frac, w, atol=0.02)
