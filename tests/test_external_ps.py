"""External point sources: the three PS_METHODs must agree physically."""

import numpy as np
import jax.numpy as jnp
import pytest

from soc_tpu.grid import uniform_grid
from soc_tpu.io.dust import hg_scattering_function
from soc_tpu.transport.propagate import transport_run
from soc_tpu.transport.sources import analyse_external_point_sources


def run_ps(grid, params_extra, n, pos, seed=9):
    dsc, csc = hg_scattering_function([0.0], 64)
    physics = dict(kabs=jnp.float32(5e-3), ksca=jnp.float32(0.0),
                   csc=jnp.asarray(csc[0]), tw=jnp.float32(1.0))
    params = dict(ps_pos=jnp.asarray([pos], jnp.float32),
                  photons=jnp.ones(1, jnp.float32),
                  ifreq=jnp.int32(0), per_freq=jnp.int32(n), **params_extra)
    tabs = jnp.zeros(grid.cells, jnp.float32)
    intf = jnp.zeros((1, 1), jnp.float32)
    tabs, _, esc, absd = transport_run(
        grid, physics, params, jnp.int32(n), tabs, intf, seed,
        source_kind="ps", nlanes=1 << 13)
    return np.asarray(tabs), float(absd)


def test_analyse_external():
    grid = uniform_grid(8, 8, 8)
    nside, side, area = analyse_external_point_sources(
        grid, [[4.0, 4.0, 20.0],      # above +Z: one face
               [-3.0, -3.0, 4.0],     # beyond -X and -Y: two faces
               [4.0, 4.0, 4.0]])      # internal
    assert nside[0] == 1 and side[0, 0] == 4
    assert nside[1] == 2 and set(side[1, :2].tolist()) == {1, 3}
    assert nside[2] == 0
    np.testing.assert_allclose(area[1, :2], 0.5)


def test_methods_agree_on_absorbed_fraction():
    """Source above +Z: methods 0, 1 and 2 must give the same absorbed
    energy per emitted photon (different Monte-Carlo efficiency only)."""
    nx = 8
    grid = uniform_grid(nx, nx, nx, density=1.0)
    pos = [nx / 2, nx / 2, nx + 6.0]
    n = 400000

    # method 0: isotropic; most packets miss
    tabs0, abs0 = run_ps(grid, {}, n, pos)
    # method 1: half-space
    tabs1, abs1 = run_ps(grid, dict(halfspace=jnp.int32(1)), n, pos)
    # method 2: face targeting
    nside, side, area = analyse_external_point_sources(grid, [pos])
    tabs2, abs2 = run_ps(grid, dict(xps_nside=jnp.asarray(nside),
                                    xps_side=jnp.asarray(side),
                                    xps_area=jnp.asarray(area)), n, pos)
    # absorbed per emitted photon: methods must agree (2% MC tolerance)
    assert abs0 > 0
    np.testing.assert_allclose(abs1 / abs0, 1.0, atol=0.03)
    np.testing.assert_allclose(abs2 / abs0, 1.0, atol=0.03)
    # method 2 illuminates the same face pattern (top slab brightest)
    f0 = tabs0.reshape(nx, nx, nx).mean(axis=(1, 2))
    f2 = tabs2.reshape(nx, nx, nx).mean(axis=(1, 2))
    assert f0[-1] > f0[0] and f2[-1] > f2[0]
    np.testing.assert_allclose(f2 / f0, 1.0, atol=0.12)


def test_cone_and_healpix_methods_agree():
    """PS_METHOD 3 (healpix-weighted directions) and 4/5 (illumination
    cone) must reproduce the method-0 absorbed energy per emitted photon,
    at far better Monte-Carlo efficiency."""
    from soc_tpu.transport.sources import (healpix_visibility,
                                           illumination_cones)
    nx = 8
    grid = uniform_grid(nx, nx, nx, density=1.0)
    pos = [nx / 2, nx / 2, nx + 6.0]
    n = 400000

    tabs0, abs0 = run_ps(grid, {}, n, pos)

    side, cone = illumination_cones(grid, [pos])
    assert side[0] == 4 and 0.0 < cone[0] < 1.0        # +Z face, real cone
    tabs5, abs5 = run_ps(grid, dict(cone_side=jnp.asarray(side),
                                    cone_cos=jnp.asarray(cone)), n, pos)
    np.testing.assert_allclose(abs5 / abs0, 1.0, atol=0.03)

    bins3, prob3 = healpix_visibility(grid, [pos])
    tabs3, abs3 = run_ps(grid, dict(ps3_pix=jnp.asarray(bins3),
                                    ps3_p=jnp.asarray(prob3)), n, pos)
    np.testing.assert_allclose(abs3 / abs0, 1.0, atol=0.03)
    # both are importance schemes: same per-photon absorption but a far
    # larger fraction of simulated packets actually hits the cloud
    hit0 = (tabs0.sum() / abs0) if abs0 else 0
    assert tabs5.sum() == pytest.approx(abs5, rel=1e-5)
    assert tabs3.sum() == pytest.approx(abs3, rel=1e-5)


def test_ps_method2_internal_source_weight_unchanged():
    """PS_METHOD 2 face-weight division applies only to EXTERNAL sources;
    an internal source (xps_area == 0) must keep its photon weight
    (regression: unconditional division boosted it by 1e10)."""
    import jax.numpy as jnp
    from soc_tpu.grid import uniform_grid
    from soc_tpu.transport.sources import (
        analyse_external_point_sources, gen_point_source)
    grid = uniform_grid(8, 8, 8)
    ps_pos = np.asarray([[4.0, 4.0, 4.0], [-5.0, 4.0, 4.0]], np.float32)
    nside, side, area = analyse_external_point_sources(grid, ps_pos)
    params = dict(ps_pos=jnp.asarray(ps_pos),
                  photons=jnp.asarray([3.0, 5.0], jnp.float32),
                  xps_nside=jnp.asarray(nside), xps_side=jnp.asarray(side),
                  xps_area=jnp.asarray(area),
                  ifreq=jnp.int32(0), per_freq=jnp.int32(1 << 16))
    ids = jnp.arange(256, dtype=jnp.int32)
    nb = gen_point_source(grid, ids, jnp.uint32(3), params)
    ph = np.asarray(nb.photons)
    internal = (np.asarray(nb.stream) % 2) == 0      # src = id % 2
    np.testing.assert_allclose(ph[internal], 3.0)
    # external packets get the area/cos/r^2 weighting, never the raw value
    assert (ph[~internal] != 5.0).all()


def test_halfspace_corner_source_unbiased():
    """PS_METHOD 1 must fold exactly ONE axis (priority z, x, y,
    kernel_ASOC.c:231-255): a corner-external source folded on every
    outside axis would confine directions to a quarter-space and deliver
    2x the true flux under the fixed 0.5 half-space weight."""
    nx = 8
    grid = uniform_grid(nx, nx, nx, density=1.0)
    pos = [nx + 6.0, nx / 2, nx + 6.0]        # beyond +X AND +Z
    n = 400000
    tabs0, abs0 = run_ps(grid, {}, n, pos)
    tabs1, abs1 = run_ps(grid, dict(halfspace=jnp.int32(1)), n, pos)
    assert abs0 > 0
    np.testing.assert_allclose(abs1 / abs0, 1.0, atol=0.05)
    # direction distribution: only z is folded, so x must stay two-sided
    from soc_tpu.transport.sources import GENERATORS
    params = dict(ps_pos=jnp.asarray([pos], jnp.float32),
                  photons=jnp.ones(1, jnp.float32),
                  halfspace=jnp.int32(1),
                  ifreq=jnp.int32(0), per_freq=jnp.int32(1 << 14))
    b = GENERATORS["ps"](grid, jnp.arange(1 << 14, dtype=jnp.uint32), 9,
                         params)
    d = np.asarray(b.dir)
    assert (d[:, 2] > 0).mean() < 0.01          # z folded down
    assert 0.4 < (d[:, 0] > 0).mean() < 0.6     # x untouched
