"""RNG-stream parity harness vs the reference (BASELINE.md:24-26).

The reference cannot run here (no OpenCL), so the harness reconstructs it
exactly: `soc_tpu.utils.mwc64x` reproduces every work item's MWC64X
random sequence bit for bit (mwc64x_rng.cl + skip_mwc.cl seeding,
kernel_ASOC.c:71-77), and `_simulate` transliterates the reference's
SimRAM_PB isotropic-background propagation (kernel_ASOC.c:437-806:
surface-element cosine-law injection, GetStep boundary stepping with the
PEPS over-step and failed-step nudge, Taylor-switched absorption
deposits, inverse-CDF scattering with the reference Deflect rotation, the
20-scattering cap) in float64 NumPy -- the oracle.

The SAME streams then drive the framework's own geometry kernels
(ops.traverse boundary_step / index_global / index_update, float32 like
the production transport) through the identical physics sequence; the
per-cell absorption tallies must agree. Epsilon deviations, documented:

  * float32 vs float64 geometry could let a packet land on the other
    side of a cell boundary near corners and diverge; measured on the
    test workload no packet actually flips (the PEPS over-step dominates
    rounding), leaving per-cell agreement at q99 = 2.6e-5 / max = 7e-5
    with full scattering and ~1e-5 absorption-only.
  * the production scattering rotation (_deflect) uses a different
    azimuth frame than the reference Deflect (distributionally
    equivalent); the harness pins the reference rotation on both sides
    so the comparison stays per-packet exact.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from soc_tpu.constants import ADHOC, DEPS, PEPS, TAULIM
from soc_tpu.grid import uniform_grid, grid_from_arrays
from soc_tpu.ops import traverse
from soc_tpu.utils import mwc64x
from soc_tpu.utils.mwc64x import MWC64X, reference_deflect


def test_mwc64x_skip_ahead_consistency():
    """Seeding stream i at distance d+i (per_stream=1) must equal stepping
    stream i-1 once: validates the pow-mod skip against the uint32 step."""
    import soc_tpu.utils.mwc64x as m
    x = np.zeros(8, np.uint32)
    c = np.zeros(8, np.uint32)
    for i in range(8):
        dist = 12345 + i
        v = (m._BASEID * pow(m.MWC64X_A, dist, m.MWC64X_M)) % m.MWC64X_M
        x[i] = v // m.MWC64X_A
        c[i] = v % m.MWC64X_A
    rng = MWC64X.__new__(MWC64X)
    rng.x, rng.c = x.copy(), c.copy()
    rng.next_uint()
    np.testing.assert_array_equal(rng.x[:-1], x[1:])
    np.testing.assert_array_equal(rng.c[:-1], c[1:])


def test_mwc64x_rand_range_and_determinism():
    r1 = MWC64X(1.0, 16)
    r2 = MWC64X(1.0, 16)
    a = np.stack([r1.rand() for _ in range(100)])
    b = np.stack([r2.rand() for _ in range(100)])
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert 0.4 < a.mean() < 0.6
    # masked draws advance only the masked streams
    r3 = MWC64X(1.0, 4)
    fresh = MWC64X(1.0, 4)
    mask = np.asarray([True, False, True, False])
    r3.rand(mask)
    np.testing.assert_array_equal(r3.x[[1, 3]], fresh.x[[1, 3]])
    assert not np.array_equal(r3.x[[0, 2]], fresh.x[[0, 2]])


def _surface_elements(nx, ny, nz):
    """(side, X0, Y0, Z0, DX, DY, DZ) per element, kernel_ASOC.c:109-130."""
    area = 2 * (ny * nz + nx * nz + nx * ny)
    side = np.zeros(area, np.int32)
    x0 = np.zeros(area)
    y0 = np.zeros(area)
    z0 = np.zeros(area)
    dx = np.ones(area)
    dy = np.ones(area)
    dz = np.ones(area)
    i = np.arange(area)
    ind = i.copy()
    # lower/upper X
    m = ind < ny * nz
    side[m] = 0
    x0[m] = PEPS
    y0[m] = ind[m] % ny
    z0[m] = ind[m] // ny
    dx[m] = 0.0
    ind = ind - np.where(m, 0, ny * nz)
    m2 = ~m & (ind < ny * nz)
    side[m2] = 1
    x0[m2] = nx - PEPS
    y0[m2] = ind[m2] % ny
    z0[m2] = ind[m2] // ny
    dx[m2] = 0.0
    done = m | m2
    ind = ind - np.where(done, 0, ny * nz)
    m3 = ~done & (ind < nx * nz)
    side[m3] = 2
    y0[m3] = PEPS
    x0[m3] = ind[m3] % nx
    z0[m3] = ind[m3] // nx
    dy[m3] = 0.0
    done |= m3
    ind = ind - np.where(done, 0, nx * nz)
    m4 = ~done & (ind < nx * nz)
    side[m4] = 3
    y0[m4] = ny - PEPS
    x0[m4] = ind[m4] % nx
    z0[m4] = ind[m4] // nx
    dy[m4] = 0.0
    done |= m4
    ind = ind - np.where(done, 0, nx * nz)
    m5 = ~done & (ind < nx * ny)
    side[m5] = 4
    z0[m5] = PEPS
    x0[m5] = ind[m5] % nx
    y0[m5] = ind[m5] // nx
    dz[m5] = 0.0
    done |= m5
    ind = ind - np.where(done, 0, nx * ny)
    m6 = ~done
    side[m6] = 5
    z0[m6] = nz - PEPS
    x0[m6] = ind[m6] % nx
    y0[m6] = ind[m6] // nx
    dz[m6] = 0.0
    return side, x0, y0, z0, dx, dy, dz


def _simulate(grid, kabs, ksca, csc, seed, batch, use_ops, max_scat=20,
              mult=8):
    """Twin simulator: the reference SimRAM_PB SOURCE==1 semantics driven
    by exact MWC64X streams. use_ops=False -> float64 NumPy oracle
    (transliterated kernel math); use_ops=True -> the framework's own
    float32 traversal ops (boundary_step / index_global / index_update).
    mult is the lanes-per-surface-element factor (the reference's 8,
    ASOC.py:1060; mult=1 keeps full-surface coverage at 1/8 the packets
    for the large-workload parity runs).
    Returns (tabs [CELLS] float64 accumulator, escaped, injected)."""
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    dens = np.asarray(grid.dens, np.float64)
    cells = grid.cells
    area = 2 * (ny * nz + nx * nz + nx * ny)
    n = mult * area
    rng = MWC64X(seed, n)
    side, ex0, ey0, ez0, edx, edy, edz = _surface_elements(nx, ny, nz)
    side = np.tile(side, mult)[:n]
    ex0, ey0, ez0, edx, edy, edz = [np.tile(v, mult)[:n]
                                    for v in (ex0, ey0, ez0, edx, edy, edz)]
    dtype = np.float32 if use_ops else np.float64
    bins = len(csc)
    csc = np.asarray(csc, dtype)
    tabs = np.zeros(cells, np.float64)
    escaped = 0.0
    injected = float(n * batch)
    tw = 1.0

    def index_of(pos):
        if use_ops:
            _, _, ind = traverse.index_global(grid, jnp.asarray(
                pos.astype(np.float32)))
            return np.asarray(ind)
        inside = ((pos[:, 0] > 0) & (pos[:, 0] < nx)
                  & (pos[:, 1] > 0) & (pos[:, 1] < ny)
                  & (pos[:, 2] > 0) & (pos[:, 2] < nz))
        ind = (np.floor(pos[:, 2]).astype(np.int64) * nx * ny
               + np.floor(pos[:, 1]).astype(np.int64) * nx
               + np.floor(pos[:, 0]).astype(np.int64))
        return np.where(inside, ind, -1).astype(np.int32)

    def boundary(pos, dirv):
        if use_ops:
            ds, npos = traverse.boundary_step(
                jnp.asarray(pos.astype(np.float32)),
                jnp.asarray(dirv.astype(np.float32)))
            return np.asarray(ds), np.asarray(npos)
        frac = np.mod(pos, 1.0)
        sp = (1.0 + PEPS - frac) / dirv
        sn = (-PEPS - frac) / dirv
        per = np.where(dirv > 0.0, sp, sn)
        ds = per.min(axis=1)
        return ds, pos + ds[:, None] * dirv

    for _ in range(batch):
        # ---- birth draws (kernel_ASOC.c:437-466): pos x/y/z, cos, phi
        ux, uy, uz = rng.rand(), rng.rand(), rng.rand()
        pos = np.stack([
            np.clip(ex0 + edx * ux, PEPS, nx - PEPS),
            np.clip(ey0 + edy * uy, PEPS, ny - PEPS),
            np.clip(ez0 + edz * uz, PEPS, nz - PEPS)], 1).astype(dtype)
        ct = np.sqrt(rng.rand().astype(dtype))
        phi = dtype(2.0 * np.pi) * rng.rand().astype(dtype)
        st = np.sqrt(np.maximum(dtype(0.0), 1.0 - ct * ct))
        v1 = st * np.cos(phi)
        v2 = st * np.sin(phi)
        dirv = np.zeros((n, 3), dtype)
        sgn = np.where(side % 2 == 0, 1.0, -1.0).astype(dtype)
        ax = side // 2                      # 0=X, 1=Y, 2=Z faces
        dirv[ax == 0] = np.stack([sgn * ct, v1, v2], 1)[ax == 0]
        dirv[ax == 1] = np.stack([v1, sgn * ct, v2], 1)[ax == 1]
        dirv[ax == 2] = np.stack([v1, v2, sgn * ct], 1)[ax == 2]
        dirv = np.where(np.abs(dirv) < DEPS, DEPS, dirv)
        dirv /= np.linalg.norm(dirv, axis=1, keepdims=True)
        photons = np.ones(n, np.float64)
        free_path = -np.log(rng.rand().astype(np.float64))
        ind = index_of(pos)
        tau = np.zeros(n, np.float64)
        scat = np.zeros(n, np.int32)
        alive = ind >= 0
        guard = 0
        while alive.any() and guard < 50000:
            guard += 1
            ds, npos = boundary(pos, dirv)
            ds64 = ds.astype(np.float64)
            d = dens[np.maximum(ind, 0)]
            tau_a = ds64 * d * kabs
            dtau = ds64 * d * ksca
            scat_now = alive & (free_path < tau + dtau)
            crossing = alive & ~scat_now
            # ---- full-step deposit (kernel_ASOC.c:585-612)
            delta = np.where(tau_a > TAULIM,
                             photons * (1.0 - np.exp(-tau_a)),
                             photons * tau_a * (1.0 - 0.5 * tau_a))
            np.add.at(tabs, np.maximum(ind, 0),
                      np.where(crossing, delta * tw * ADHOC, 0.0))
            photons = np.where(crossing, photons * np.exp(-tau_a), photons)
            tau = np.where(crossing, tau + dtau, tau)
            nind = index_of(npos)
            failed = crossing & (nind == ind)
            npos2 = np.where(failed[:, None],
                             npos + dtype(PEPS) * dirv, npos)
            exited = crossing & (nind < 0)
            escaped += photons[exited].sum()
            pos = np.where(crossing[:, None], npos2, pos)
            ind = np.where(crossing, np.where(failed, ind, nind), ind)
            # ---- scattering (kernel_ASOC.c:700-806): partial deposit at
            # the free-path point inside the beginning-of-step cell
            dxs = np.where(scat_now,
                           (free_path - tau)
                           / np.maximum(ksca * d, 1e-300), 0.0)
            tau_ap = dxs * d * kabs
            delta_p = np.where(tau_ap > TAULIM,
                               photons * (1.0 - np.exp(-tau_ap)),
                               photons * tau_ap * (1.0 - 0.5 * tau_ap))
            np.add.at(tabs, np.maximum(ind, 0),
                      np.where(scat_now, delta_p * tw * ADHOC, 0.0))
            dx_local = np.maximum(dtype(0.0),
                                  dxs.astype(dtype) - dtype(2.0 * PEPS))
            pos = np.where(scat_now[:, None],
                           pos + dx_local[:, None] * dirv, pos)
            photons = np.where(scat_now, photons * np.exp(-tau_ap),
                               photons)
            # draws: free path, cos bin, azimuth (this exact order,
            # kernel_ASOC.c:736-739 then Scatter)
            u_fp = rng.rand(scat_now)
            u_bin = rng.rand(scat_now)
            u_phi = rng.rand(scat_now)
            free_path = np.where(scat_now,
                                 -np.log(u_fp.astype(np.float64)),
                                 free_path)
            bidx = np.clip(np.floor(u_bin.astype(dtype) * bins
                                    ).astype(np.int64), 0, bins - 1)
            ctv = csc[bidx]
            new_dir = reference_deflect(dirv, ctv,
                                        dtype(2.0 * np.pi)
                                        * u_phi.astype(dtype), dtype)
            dirv = np.where(scat_now[:, None], new_dir.astype(dtype), dirv)
            scat = scat + scat_now.astype(np.int32)
            over = scat_now & (scat > max_scat)
            tau = np.where(scat_now, 0.0, tau)
            alive = alive & (ind >= 0) & ~exited & ~over
        assert guard < 50000, "simulator did not drain"
    return tabs, float(escaped), injected


def _hg_csc(g, bins=2500):
    from soc_tpu.io.dust import hg_scattering_function
    _, csc = hg_scattering_function([g], bins)
    return np.asarray(csc[0])


def test_parity_absorption_only():
    """No scattering: float32 framework ops vs float64 oracle under the
    same streams agree per cell to ~1e-5 (pure geometry epsilon)."""
    grid = uniform_grid(8, 8, 8, density=1.0)
    rng = np.random.default_rng(5)
    dens = (1.0 + 0.5 * rng.random(512)).astype(np.float32)
    grid = grid_from_arrays(8, 8, 8, [512], [dens])
    csc = _hg_csc(0.5)
    t_ref, e_ref, inj = _simulate(grid, kabs=0.3, ksca=1e-12, csc=csc,
                                  seed=1.0, batch=2, use_ops=False)
    t_ops, e_ops, _ = _simulate(grid, kabs=0.3, ksca=1e-12, csc=csc,
                                seed=1.0, batch=2, use_ops=True)
    assert t_ref.sum() > 0
    np.testing.assert_allclose(t_ops.sum(), t_ref.sum(), rtol=1e-6)
    np.testing.assert_allclose(e_ops, e_ref, rtol=1e-6)
    np.testing.assert_allclose(t_ops, t_ref, rtol=3e-5,
                               atol=1e-7 * t_ref.max())
    # energy conservation in both
    np.testing.assert_allclose(t_ref.sum() + e_ref, inj, rtol=1e-10)


def test_parity_with_scattering():
    """Full physics under fixed streams: per-cell absorption allclose,
    with the documented float32-boundary divergence tail."""
    grid = uniform_grid(8, 8, 8, density=1.0)
    rng = np.random.default_rng(7)
    dens = (1.0 + 0.5 * rng.random(512)).astype(np.float32)
    grid = grid_from_arrays(8, 8, 8, [512], [dens])
    csc = _hg_csc(0.6)
    t_ref, e_ref, inj = _simulate(grid, kabs=0.15, ksca=0.25, csc=csc,
                                  seed=1.0, batch=2, use_ops=False)
    t_ops, e_ops, _ = _simulate(grid, kabs=0.15, ksca=0.25, csc=csc,
                                seed=1.0, batch=2, use_ops=True)
    np.testing.assert_allclose(t_ops.sum(), t_ref.sum(), rtol=1e-5)
    np.testing.assert_allclose(e_ops, e_ref, rtol=1e-5)
    # per cell (measured on this workload: median 2e-7, q99 2.6e-5,
    # max 7e-5 -- no packet path actually diverged; the bound leaves
    # room for one boundary-corner flip)
    rel = np.abs(t_ops - t_ref) / np.maximum(t_ref, 1e-3 * t_ref.max())
    assert np.quantile(rel, 0.99) < 1e-4
    assert rel.max() < 5e-3
    np.testing.assert_allclose(t_ref.sum() + e_ref, inj, rtol=1e-10)
    # downstream: equilibrium temperatures from the two fields agree
    from soc_tpu.solve.equilibrium import (build_temperature_table,
                                           solve_temperature)
    freq = np.logspace(11, 13, 8)
    table = build_temperature_table(freq, np.full(8, 1e-8), 0.01)
    tt_ref = np.asarray(solve_temperature(
        grid, table, jnp.asarray(t_ref.astype(np.float32)), 3.1e16))
    tt_ops = np.asarray(solve_temperature(
        grid, table, jnp.asarray(t_ops.astype(np.float32)), 3.1e16))
    np.testing.assert_allclose(tt_ops, tt_ref, rtol=1e-3)


def _simulate_ps(grid, kabs, ksca, csc, seed, batch, use_ops, ps_pos,
                 max_scat=20):
    """Point-source twin (PS inside the volume, SOURCE==0 birth,
    kernel_ASOC.c:200-213: phi = 2 pi Rand, cos_theta =
    0.999997 - 1.999995 Rand, POS = PSPOS): the same propagation loop as
    _simulate driven by the same MWC64X streams, float64 oracle vs the
    framework's float32 geometry ops."""
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    dens = np.asarray(grid.dens, np.float64)
    cells = grid.cells
    n = 2048
    rng = MWC64X(seed, n)
    dtype = np.float32 if use_ops else np.float64
    bins = len(csc)
    csc = np.asarray(csc, dtype)
    tabs = np.zeros(cells, np.float64)
    escaped = 0.0
    injected = float(n * batch)
    tw = 1.0

    def index_of(pos):
        if use_ops:
            _, _, ind = traverse.index_global(grid, jnp.asarray(
                pos.astype(np.float32)))
            return np.asarray(ind)
        inside = ((pos[:, 0] > 0) & (pos[:, 0] < nx)
                  & (pos[:, 1] > 0) & (pos[:, 1] < ny)
                  & (pos[:, 2] > 0) & (pos[:, 2] < nz))
        ind = (np.floor(pos[:, 2]).astype(np.int64) * nx * ny
               + np.floor(pos[:, 1]).astype(np.int64) * nx
               + np.floor(pos[:, 0]).astype(np.int64))
        return np.where(inside, ind, -1).astype(np.int32)

    def boundary(pos, dirv):
        if use_ops:
            ds, npos = traverse.boundary_step(
                jnp.asarray(pos.astype(np.float32)),
                jnp.asarray(dirv.astype(np.float32)))
            return np.asarray(ds), np.asarray(npos)
        frac = np.mod(pos, 1.0)
        sp = (1.0 + PEPS - frac) / dirv
        sn = (-PEPS - frac) / dirv
        per = np.where(dirv > 0.0, sp, sn)
        ds = per.min(axis=1)
        return ds, pos + ds[:, None] * dirv

    for _ in range(batch):
        phi = dtype(2.0 * np.pi) * rng.rand().astype(dtype)
        ct = (dtype(0.999997)
              - dtype(1.999995) * rng.rand().astype(dtype))
        st = np.sqrt(np.maximum(dtype(0.0), 1.0 - ct * ct))
        dirv = np.stack([st * np.cos(phi), st * np.sin(phi), ct],
                        1).astype(dtype)
        dirv = np.where(np.abs(dirv) < DEPS, DEPS, dirv)
        dirv /= np.linalg.norm(dirv, axis=1, keepdims=True)
        pos = np.broadcast_to(np.asarray(ps_pos, dtype),
                              (n, 3)).copy()
        photons = np.ones(n, np.float64)
        free_path = -np.log(rng.rand().astype(np.float64))
        ind = index_of(pos)
        tau = np.zeros(n, np.float64)
        scat = np.zeros(n, np.int32)
        alive = ind >= 0
        guard = 0
        while alive.any() and guard < 50000:
            guard += 1
            ds, npos = boundary(pos, dirv)
            ds64 = ds.astype(np.float64)
            d = dens[np.maximum(ind, 0)]
            tau_a = ds64 * d * kabs
            dtau = ds64 * d * ksca
            scat_now = alive & (free_path < tau + dtau)
            crossing = alive & ~scat_now
            delta = np.where(tau_a > TAULIM,
                             photons * (1.0 - np.exp(-tau_a)),
                             photons * tau_a * (1.0 - 0.5 * tau_a))
            np.add.at(tabs, np.maximum(ind, 0),
                      np.where(crossing, delta * tw * ADHOC, 0.0))
            photons = np.where(crossing, photons * np.exp(-tau_a),
                               photons)
            tau = np.where(crossing, tau + dtau, tau)
            nind = index_of(npos)
            failed = crossing & (nind == ind)
            npos2 = np.where(failed[:, None],
                             npos + dtype(PEPS) * dirv, npos)
            exited = crossing & (nind < 0)
            escaped += photons[exited].sum()
            pos = np.where(crossing[:, None], npos2, pos)
            ind = np.where(crossing, np.where(failed, ind, nind), ind)
            dxs = np.where(scat_now,
                           (free_path - tau)
                           / np.maximum(ksca * d, 1e-300), 0.0)
            tau_ap = dxs * d * kabs
            delta_p = np.where(tau_ap > TAULIM,
                               photons * (1.0 - np.exp(-tau_ap)),
                               photons * tau_ap * (1.0 - 0.5 * tau_ap))
            np.add.at(tabs, np.maximum(ind, 0),
                      np.where(scat_now, delta_p * tw * ADHOC, 0.0))
            dx_local = np.maximum(dtype(0.0),
                                  dxs.astype(dtype) - dtype(2.0 * PEPS))
            pos = np.where(scat_now[:, None],
                           pos + dx_local[:, None] * dirv, pos)
            photons = np.where(scat_now, photons * np.exp(-tau_ap),
                               photons)
            u_fp = rng.rand(scat_now)
            u_bin = rng.rand(scat_now)
            u_phi = rng.rand(scat_now)
            free_path = np.where(scat_now,
                                 -np.log(u_fp.astype(np.float64)),
                                 free_path)
            bidx = np.clip(np.floor(u_bin.astype(dtype) * bins
                                    ).astype(np.int64), 0, bins - 1)
            ctv = csc[bidx]
            new_dir = reference_deflect(dirv, ctv,
                                        dtype(2.0 * np.pi)
                                        * u_phi.astype(dtype), dtype)
            dirv = np.where(scat_now[:, None], new_dir.astype(dtype),
                            dirv)
            scat = scat + scat_now.astype(np.int32)
            over = scat_now & (scat > max_scat)
            tau = np.where(scat_now, 0.0, tau)
            alive = alive & (ind >= 0) & ~exited & ~over
        assert guard < 50000, "simulator did not drain"
    return tabs, float(escaped), injected


def test_parity_point_source():
    """PS_METHOD 0 point source inside the volume: packets born mid-cell
    (the other epsilon-sensitive entry path) agree per cell between the
    float64 oracle and the float32 framework ops under the same
    streams."""
    grid = uniform_grid(8, 8, 8, density=1.0)
    rng = np.random.default_rng(9)
    dens = (1.0 + 0.5 * rng.random(512)).astype(np.float32)
    grid = grid_from_arrays(8, 8, 8, [512], [dens])
    csc = _hg_csc(0.5)
    ps = (3.3, 4.1, 4.7)
    t_ref, e_ref, inj = _simulate_ps(grid, kabs=0.2, ksca=0.15, csc=csc,
                                     seed=2.0, batch=2, use_ops=False,
                                     ps_pos=ps)
    t_ops, e_ops, _ = _simulate_ps(grid, kabs=0.2, ksca=0.15, csc=csc,
                                   seed=2.0, batch=2, use_ops=True,
                                   ps_pos=ps)
    assert t_ref.sum() > 0
    np.testing.assert_allclose(t_ops.sum(), t_ref.sum(), rtol=1e-5)
    np.testing.assert_allclose(e_ops, e_ref, rtol=1e-5)
    rel = np.abs(t_ops - t_ref) / np.maximum(t_ref, 1e-3 * t_ref.max())
    assert np.quantile(rel, 0.99) < 1e-4, np.quantile(rel, 0.99)
    assert rel.max() < 5e-3, rel.max()
    np.testing.assert_allclose(t_ref.sum() + e_ref, inj, rtol=1e-10)
