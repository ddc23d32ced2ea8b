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
                  per_freq=jnp.int32(n))
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


def test_healpix_peeloff_internal_observer():
    """Single-scattering all-sky image: total signal consistent with the
    analytic sum over events of DSC/(4 pi-free normalization) / d^2."""
    import jax.numpy as jnp
    from soc_tpu.render.scattered import (spawn, propagate_events,
                                          empty_events, peel_off_healpix)
    nx = 8
    grid = uniform_grid(nx, nx, nx, density=1.0)
    physics = setup_physics(ksca=2e-3, g=0.0)
    n = 4 * int(grid.area)
    params = dict(photons=jnp.float32(1.0), ifreq=jnp.int32(0),
                  per_freq=jnp.int32(n))
    nside = 8
    out = jnp.zeros(12 * nside * nside, jnp.float32)
    next_id = jnp.int32(0)
    obs = (nx / 2, nx / 2, nx / 2)
    event_weight = 0.0
    ndeltas = 0
    while int(next_id) < n:
        b, fp, pending, next_id = spawn(grid, physics, params,
                                        jnp.int32(n), next_id, 5,
                                        nlanes=1 << 12)
        tau = jnp.zeros(b.lanes, jnp.float32)
        while True:
            ev = empty_events(1 << 14)
            b, fp, tau, pending, ev, ec = propagate_events(
                grid, physics, b, fp, tau, pending, ev, jnp.int32(0), 5,
                capacity=1 << 14)
            out = peel_off_healpix(grid, physics, ev, obs, nside, out)
            ndeltas += int(ec)
            event_weight += float(jnp.sum(jnp.where(ev.valid, ev.photons,
                                                    0.0)))
            if not bool(jnp.any(b.ind >= 0)):
                break
    out = np.asarray(out)
    assert out.sum() > 0
    assert np.isfinite(out).all()
    assert ndeltas > 0
    # isotropic phase function: each event contributes W/(4 pi d^2) with
    # d ~ nx/4..nx/2 to the observer at the centre (optically thin)
    rough = event_weight / (4 * np.pi) / (nx / 3) ** 2
    assert 0.2 * rough < out.sum() < 5 * rough


def test_ffs_thin_channel_keeps_every_packet():
    """Forced first scattering must produce one event per packet even when
    the cloud's scattering depth is near the float32 epsilon (regression:
    1-exp(-tau) / -log(1-w*u) rounding lost 62% of forced scatterings on
    optically thin channels; now expm1/log1p + boundary clamp)."""
    import jax.numpy as jnp
    from soc_tpu.render.scattered import (spawn, propagate_events,
                                          empty_events)
    grid = uniform_grid(16, 16, 16, density=1.0)
    physics = setup_physics(ksca=1e-7, kabs=0.0, g=0.0)
    n = 2048
    params = dict(photons=jnp.float32(1.0), ifreq=jnp.int32(0),
                  per_freq=jnp.int32(n))
    b, fp, pending, _ = spawn(grid, physics, params, jnp.int32(n),
                              jnp.int32(0), np.uint32(3),
                              source_kind="bg", nlanes=n, ffs=True)
    ev = empty_events(1 << 13)
    b, fp, _, _, ev, ec = propagate_events(
        grid, physics, b, fp, jnp.zeros(b.lanes, jnp.float32),
        pending, ev, jnp.int32(0), np.uint32(3),
        capacity=1 << 13)
    # every forced packet scatters at least once inside the cloud
    assert int(ec) >= n
    # and the FFS weight is the exact 1-exp(-tau) (expm1), not quantized
    tau_max = 1e-7 * 16 * np.sqrt(3)
    ph = np.asarray(ev.photons)[:int(ec)]
    assert 0 < ph.max() <= -np.expm1(-tau_max) * 1.0001


def test_unified_engine_matches_phase_engine():
    """sca_run + peel_off_run (lane-refill scheduling) must reproduce the
    spawn/propagate_events/peel_off pipeline: identical per-packet RNG
    sequences make the event sets equal, so the maps agree to float
    accumulation order."""
    import jax
    import jax.numpy as jnp
    from soc_tpu.render.scattered import (spawn, propagate_events,
                                          empty_events, peel_off,
                                          sca_pool_init, sca_run,
                                          peel_off_run)
    nx = 8
    grid = uniform_grid(nx, nx, nx, density=1.0)
    physics = setup_physics(ksca=8e-2, kabs=1e-2, g=0.5)
    n = 4 * int(grid.area)
    params = dict(photons=jnp.float32(1.0), ifreq=jnp.int32(0),
                  per_freq=jnp.int32(n))
    odir, ra, de = observer_basis(0.3, 0.7)
    odirs = jnp.asarray(np.atleast_2d(odir), jnp.float32)
    ra2 = jnp.asarray(np.atleast_2d(ra), jnp.float32)
    de2 = jnp.asarray(np.atleast_2d(de), jnp.float32)
    centre = jnp.asarray((nx / 2, nx / 2, nx / 2), jnp.float32)
    npix = (16, 16)
    seed = np.uint32(11)
    cap = 1 << 14

    # --- old phase engine
    out_old = jnp.zeros((1, 16, 16), jnp.float32)
    next_id = jnp.int32(0)
    w_old = 0.0
    ne_old = 0
    while int(next_id) < n:
        b, fp, pending, next_id = spawn(grid, physics, params,
                                        jnp.int32(n), next_id, seed,
                                        nlanes=1 << 10)
        tau = jnp.zeros(b.lanes, jnp.float32)
        while True:
            ev = empty_events(cap)
            b, fp, tau, pending, ev, ec = propagate_events(
                grid, physics, b, fp, tau, pending, ev, jnp.int32(0),
                seed, capacity=cap)
            out_old = peel_off(grid, physics, ev, odirs, ra2, de2,
                               centre, 1.0, npix, out_old)
            ne_old += int(ec)
            w_old += float(jnp.sum(jnp.where(ev.valid, ev.photons, 0.0)))
            if not bool(jnp.any(b.ind >= 0)):
                break

    # --- unified engine
    out_new = jnp.zeros(16 * 16, jnp.float32)
    carry = sca_pool_init(grid, 1 << 10)
    w_new = 0.0
    ne_new = 0
    while True:
        ev = empty_events(cap)
        carry, ev, ec = sca_run(grid, physics, params, jnp.int32(n),
                                carry, ev, jnp.int32(0), seed,
                                nlanes=1 << 10, capacity=cap)
        ne_new += int(ec)
        w_new += float(jnp.sum(jnp.where(ev.valid, ev.photons, 0.0)))
        if int(ec):
            out_new, _ = peel_off_run(grid, physics, ev, ec, odirs, ra2,
                                      de2, centre, 1.0, npix, out_new,
                                      jnp.zeros(3, jnp.float32),
                                      mode="ortho", nlanes=1 << 10)
        if (int(carry["next_id"]) >= n
                and not bool(jnp.any(carry["b"].ind >= 0))):
            break

    assert ne_new == ne_old
    np.testing.assert_allclose(w_new, w_old, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_new).reshape(1, 16, 16),
                               np.asarray(out_old), rtol=2e-4, atol=1e-10)


def test_reservoir_ffs_samples_first_interaction_law():
    """The single-pass reservoir FFS must sample the scattering depth from
    the truncated-exponential first-interaction law (what the reference's
    two-march quantile scheme samples, kernel_ASOC_sca.c:227-244)."""
    import jax.numpy as jnp
    from soc_tpu.render.scattered import _march_ffs
    nx = 16
    grid = uniform_grid(nx, nx, nx, density=1.0)
    tau_tot = 2.0
    ksca = tau_tot / nx
    n = 1 << 14
    rng = np.random.default_rng(1)
    # rays entering the z=0 face straight along +Z: chord length = nx
    pos = jnp.asarray(np.stack([
        rng.uniform(0.5, nx - 0.5, n), rng.uniform(0.5, nx - 0.5, n),
        np.full(n, 1e-3)], -1).astype(np.float32))
    dirv = jnp.asarray(np.tile(np.asarray([1e-5, 1e-5, 1.0], np.float32),
                               (n, 1)))
    from soc_tpu.ops import traverse
    p0, lev, ind, _ = traverse.index_global_stack(grid, pos)
    stream = jnp.arange(n, dtype=jnp.uint32)
    hi = jnp.full(n, np.uint32(77), jnp.uint32)
    w, cpos, clev, cind, ctau = _march_ffs(
        grid, jnp.float32(ksca), jnp.uint32(3), p0, lev, ind, dirv,
        stream, hi)
    w = np.asarray(w)
    ctau = np.asarray(ctau)
    np.testing.assert_allclose(w, -np.expm1(-tau_tot), rtol=1e-3)
    # truncated exponential on [0, tau_tot]: E[tau*] and the CDF quartiles
    e_analytic = 1.0 - tau_tot * np.exp(-tau_tot) / -np.expm1(-tau_tot)
    assert abs(ctau.mean() - e_analytic) < 0.02 * tau_tot
    # quartile check: P(tau* < t) = (1-exp(-t))/(1-exp(-tau_tot))
    for q in (0.25, 0.5, 0.75):
        t_q = -np.log1p(q * np.expm1(-tau_tot))
        frac = (ctau < t_q).mean()
        assert abs(frac - q) < 0.02, (q, frac)
    # every candidate is inside the grid
    assert int((np.asarray(cind) >= 0).sum()) == n
