"""Float64-oracle parity for the epsilon-sensitive geometry paths.

Extends the RNG-parity harness (test_rng_parity.py) to the remaining
float32-sensitive kernels (VERDICT r3 item 5):

  * octree descent / ancestor-stack up-walk: straight rays through a
    2-level refined cloud, per-cell chord tallies vs a float64
    transliteration of the reference hierarchy walk
    (kernel_ASOC_aux.c IndexG:131 / GetStep:282 / Index:198 semantics);
  * the Mapping LOS integration (render_ortho) vs a float64 per-pixel
    oracle of kernel_ASOC_map.c:496-700 (front-surface clamp, Taylor-
    switched attenuation, per-cell emission);
  * point-source entries (PS_METHOD 0): packets born mid-cell at PSPOS
    with isotropic MWC64X-drawn directions, absorption tallies vs the
    float64 oracle (kernel_ASOC.c SimRAM_PB SOURCE==0 birth, :470-520).

The oracle is NOT a copy of the OpenCL kernels: it transliterates the
framework's own traversal semantics (which test_traverse pins to the
reference's) into float64 NumPy so any float32 epsilon break shows up.
"""

import numpy as np
import jax.numpy as jnp

from soc_tpu.constants import ADHOC, DEPS, PEPS, TAULIM
from soc_tpu.grid import grid_from_arrays, encode_link_np
from soc_tpu.ops import traverse
from soc_tpu.utils.mwc64x import MWC64X


# ---------------------------------------------------------------------------
# float64 hierarchical traversal oracle (scalar, per ray)
# ---------------------------------------------------------------------------


class OctOracle:
    """Scalar float64 octree walk with the framework's exact semantics."""

    def __init__(self, grid):
        self.nx, self.ny, self.nz = grid.nx, grid.ny, grid.nz
        self.levels = grid.levels
        self.dens = np.asarray(grid.dens, np.float32)   # link decode needs f32
        self.off = np.asarray(grid.off)
        self.par = np.asarray(grid.par)
        self.cells = grid.cells

    def descend(self, pos, level, ind):
        while ind >= 0:
            gidx = self.off[level] + ind
            v = self.dens[gidx]
            if v > 0.0:
                break
            child = int((-v).view(np.int32))
            pos = 2.0 * np.mod(pos, 1.0)
            sub = (4 * min(max(int(pos[2]), 0), 1)
                   + 2 * min(max(int(pos[1]), 0), 1)
                   + min(max(int(pos[0]), 0), 1))
            ind = child + sub
            level += 1
        return pos, level, ind

    def index_global(self, pos):
        if (pos[0] <= 0 or pos[0] >= self.nx or pos[1] <= 0
                or pos[1] >= self.ny or pos[2] <= 0 or pos[2] >= self.nz):
            return pos, 0, -1
        ind = (int(pos[2]) * self.nx * self.ny + int(pos[1]) * self.nx
               + int(pos[0]))
        return self.descend(pos, 0, ind)

    def step(self, pos, level, ind, dirv):
        """boundary_step + neighbor update; returns (ds_gl, pos, level,
        ind) -- the float64 twin of traverse.get_step_stack."""
        frac = np.mod(pos, 1.0)
        per = np.where(dirv > 0.0, (1.0 + PEPS - frac) / dirv,
                       (-PEPS - frac) / dirv)
        ds = per.min()
        ds_gl = ds * 2.0 ** (-level)
        pos = pos + ds * dirv
        # up-walk
        while level > 0:
            inside = np.all((pos >= 0.0) & (pos <= 2.0))
            if inside:
                break
            gidx = self.off[level] + ind
            parent = int(self.par[gidx])
            pos = 0.5 * pos
            if level - 1 == 0:
                pos = pos + np.asarray([parent % self.nx,
                                        (parent // self.nx) % self.ny,
                                        parent // (self.nx * self.ny)],
                                       np.float64)
                level = 0
                if (pos[0] <= 0 or pos[0] >= self.nx or pos[1] <= 0
                        or pos[1] >= self.ny or pos[2] <= 0
                        or pos[2] >= self.nz):
                    return ds_gl, pos, 0, -1
                ind = (int(pos[2]) * self.nx * self.ny
                       + int(pos[1]) * self.nx + int(pos[0]))
                pos2, level, ind = self.descend(pos, 0, ind)
                return ds_gl, pos2, level, ind
            sid = parent % 8
            pos = pos + np.asarray([sid % 2, (sid // 2) % 2, sid // 4],
                                   np.float64)
            level -= 1
            ind = parent
        if level == 0:
            if (pos[0] <= 0 or pos[0] >= self.nx or pos[1] <= 0
                    or pos[1] >= self.ny or pos[2] <= 0
                    or pos[2] >= self.nz):
                return ds_gl, pos, 0, -1
            ind = (int(pos[2]) * self.nx * self.ny + int(pos[1]) * self.nx
                   + int(pos[0]))
        else:
            # within-octet neighbor: first child of the octet + sub id
            sub = (4 * min(max(int(pos[2]), 0), 1)
                   + 2 * min(max(int(pos[1]), 0), 1)
                   + min(max(int(pos[0]), 0), 1))
            ind = ind - (ind % 8) + sub
        pos, level, ind = self.descend(pos, level, ind)
        return ds_gl, pos, level, ind


def make_two_level_grid(n=8, seed=0):
    rng = np.random.default_rng(seed)
    root = (1.0 + rng.random(n ** 3)).astype(np.float32)
    ref = np.asarray([1 + n * 1 + n * n * 1, 3 + n * 2 + n * n * 4,
                      5 + n * 5 + n * n * 6, 2 + n * 6 + n * n * 2],
                     np.int64)
    root[ref] = encode_link_np(np.arange(0, 8 * len(ref), 8,
                                         dtype=np.int32))
    l1 = (2.0 + rng.random(8 * len(ref))).astype(np.float32)
    return grid_from_arrays(n, n, n, [n ** 3, len(l1)], [root, l1])


def _oracle_chords(grid, pos0, dirs):
    """Per-cell chord tallies of straight rays, float64 oracle."""
    o = OctOracle(grid)
    tally = np.zeros(grid.cells, np.float64)
    for p, d in zip(pos0, dirs):
        pos, level, ind = o.index_global(p.astype(np.float64))
        guard = 0
        while ind >= 0 and guard < 4000:
            guard += 1
            gidx = o.off[level] + ind
            ds, pos, level, ind = o.step(pos, level, ind,
                                         d.astype(np.float64))
            tally[gidx] += ds
        assert guard < 4000
    return tally


def _ops_chords(grid, pos0, dirs):
    """Same tallies via the production float32 ancestor-stack ops."""
    pos = jnp.asarray(pos0.astype(np.float32))
    dirv = jnp.asarray(dirs.astype(np.float32))
    pos, level, ind, anc = traverse.index_global_stack(grid, pos)
    tally = np.zeros(grid.cells + 1, np.float64)
    for _ in range(4000):
        live = np.asarray(ind) >= 0
        if not live.any():
            break
        gidx = np.asarray(
            jnp.clip(grid.off[jnp.clip(level, 0, grid.levels - 1)]
                     + jnp.maximum(ind, 0), 0, grid.cells - 1))
        ds, pos, level, ind, anc = traverse.get_step_stack(
            grid, pos, dirv, level, ind, anc, jnp.asarray(live))
        np.add.at(tally, np.where(live, gidx, grid.cells),
                  np.where(live, np.asarray(ds, np.float64), 0.0))
    return tally[:-1]


def test_octree_chord_parity():
    """Straight rays through a 2-level refined cloud: the float32
    ancestor-stack walk (descent, up-walk, deferred-descend callers all
    route through these ops) matches the float64 oracle per cell."""
    grid = make_two_level_grid()
    n = grid.nx
    rng = MWC64X(3.0, 256)
    u = np.stack([rng.rand() for _ in range(5)], 1)    # reference streams
    pos0 = np.stack([0.5 + (n - 1.0) * u[:, 0],
                     0.5 + (n - 1.0) * u[:, 1],
                     np.full(256, PEPS)], 1)
    ct = u[:, 2] ** 0.5
    phi = 2.0 * np.pi * u[:, 3]
    st = np.sqrt(1.0 - ct * ct)
    dirs = np.stack([st * np.cos(phi), st * np.sin(phi), ct], 1)
    dirs = np.where(np.abs(dirs) < DEPS, DEPS, dirs)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    t_ref = _oracle_chords(grid, pos0, dirs)
    t_ops = _ops_chords(grid, pos0, dirs)
    # totals: every ray's chord length is identical
    np.testing.assert_allclose(t_ops.sum(), t_ref.sum(), rtol=1e-6)
    # per cell: float32 epsilon only (no descent/up-walk divergence)
    m = t_ref.max()
    rel = np.abs(t_ops - t_ref) / np.maximum(t_ref, 1e-3 * m)
    assert np.quantile(rel, 0.99) < 1e-4, np.quantile(rel, 0.99)
    assert rel.max() < 5e-3, rel.max()
    # the refined levels actually got traversed
    assert t_ref[grid.off[1]:].sum() > 0


def test_mapping_los_parity():
    """render_ortho vs a float64 per-pixel LOS oracle on the refined
    cloud: same front-surface entry, per-cell Taylor-switched attenuated
    emission (kernel_ASOC_map.c:496-700)."""
    from soc_tpu.render.mapping import observer_basis, render_ortho
    grid = make_two_level_grid(seed=4)
    n = grid.nx
    rng = np.random.default_rng(2)
    nf = 3
    emit = (0.5 + rng.random((grid.cells, nf))).astype(np.float32)
    ext = np.asarray([0.05, 0.4, 2.5], np.float32)
    odir, ra, de = observer_basis(0.4, 1.1)
    centre = (n / 2.0, n / 2.0, n / 2.0)
    npix = (12, 12)
    phot, tau, colden = render_ortho(
        grid, jnp.asarray(emit), jnp.asarray(ext), jnp.asarray(odir),
        jnp.asarray(ra), jnp.asarray(de),
        jnp.asarray(centre, jnp.float32), 0.75, npix)
    phot = np.asarray(phot)

    # ---- float64 oracle
    o = OctOracle(grid)
    dens = np.asarray(grid.dens, np.float64)
    out = np.zeros((nf, npix[1], npix[0]))
    step_dir = np.where(np.abs(-odir) < 1e-5, 1e-5,
                        -odir).astype(np.float64)
    for j in range(npix[1]):
        for i in range(npix[0]):
            p = (np.asarray(centre, np.float64)
                 + (i - 0.5 * (npix[0] - 1)) * 0.75 * ra.astype(np.float64)
                 + (j - 0.5 * (npix[1] - 1)) * 0.75 * de.astype(np.float64))
            p = p + (3 * n) * odir.astype(np.float64)
            # front-surface clamp (same rule as mapping._front_surface,
            # EPS = the map-ray surface epsilon)
            from soc_tpu.constants import EPS
            best = None
            for ax in range(3):
                bound = [n, n, n][ax] if odir[ax] >= 0 else 0.0
                s = (bound - p[ax]) / (-odir.astype(np.float64)[ax]) + EPS
                q = p - s * odir.astype(np.float64)
                if np.all((q >= 0) & (q <= n)) and (best is None
                                                    or s < best):
                    best = s
            if best is None:
                continue
            p = p - best * odir.astype(np.float64)
            pos, level, ind = o.index_global(p)
            tau64 = np.zeros(nf)
            acc = np.zeros(nf)
            guard = 0
            while ind >= 0 and guard < 4000:
                guard += 1
                gidx = o.off[level] + ind
                ds, pos, level, ind = o.step(pos, level, ind, step_dir)
                dtau = ds * dens[gidx] * ext
                attw = np.where(dtau < 1e-3, 1.0 - 0.5 * dtau,
                                (1.0 - np.exp(-dtau))
                                / np.maximum(dtau, 1e-300))
                acc += (np.exp(-tau64) * attw * ds * dens[gidx]
                        * emit[gidx].astype(np.float64))
                tau64 += dtau
            out[:, j, i] = acc

    m = out.max()
    rel = np.abs(phot - out) / np.maximum(out, 1e-3 * m)
    assert np.quantile(rel, 0.99) < 2e-4, np.quantile(rel, 0.99)
    assert rel.max() < 5e-3, rel.max()
    assert out.sum() > 0


def test_large_root_grid_no_stuck_lanes():
    """No DIMLIM cliff: the reference needs double-precision positions
    above NX > DIMLIM (kernel_ASOC_aux.c:27-46) because at |coordinate|
    >~ 1700 the float32 half-ulp exceeds PEPS -- a negative-direction
    crossing computes floor - PEPS, rounds back UP onto the boundary, and
    sticks forever (reproduced here at x ~ 4000 on a 4096-wide grid before
    the fix). The ulp-aware failed_step_nudge keeps float32 at any root
    size: every ray must exit, and chord totals must match exact geometry.
    """
    from jax import lax

    nx, ny, nz = 4096, 4, 4
    grid = grid_from_arrays(nx, ny, nz, [nx * ny * nz],
                            [np.ones(nx * ny * nz, np.float32)])
    rng = np.random.default_rng(9)
    nray = 16
    # -x dominant rays born deep in the high-coordinate half (the
    # sub-ulp-PEPS regime), mild transverse slopes
    pos0 = np.stack([3600.0 + 400.0 * rng.random(nray),
                     0.5 + (ny - 1.0) * rng.random(nray),
                     0.5 + (nz - 1.0) * rng.random(nray)], 1)
    d = np.stack([-np.ones(nray), 0.04 * (rng.random(nray) - 0.5),
                  0.04 * (rng.random(nray) - 0.5)], 1)
    d = np.where(np.abs(d) < DEPS, DEPS, d)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirv = jnp.asarray(d.astype(np.float32))

    pos, level, ind, anc = traverse.index_global_stack(
        grid, jnp.asarray(pos0.astype(np.float32)))
    max_steps = 8 * nx

    def cond(st):
        it, pos, level, ind, anc, total = st
        return (it < max_steps) & jnp.any(ind >= 0)

    def body(st):
        it, pos, level, ind, anc, total = st
        live = ind >= 0
        ds, npos, nlevel, nind, anc = traverse.get_step_stack(
            grid, pos, dirv, level, ind, anc, live)
        failed = live & (nlevel == level) & (nind == ind)
        npos = traverse.failed_step_nudge(npos, dirv, failed)
        total = total + jnp.where(live, ds, 0.0)
        return (it + 1, jnp.where(live[:, None], npos, pos),
                jnp.where(live, nlevel, level),
                jnp.where(live, nind, ind), anc, total)

    import jax
    st = jax.jit(lambda s: lax.while_loop(cond, body, s))(
        (jnp.int32(0), pos, level, ind, anc,
         jnp.zeros(nray, jnp.float32)))
    it, _, _, ind, _, total = st
    assert int(it) < max_steps, "stuck lanes on the large root grid"
    assert np.all(np.asarray(ind) < 0)
    # exact total chord of each ray (straight line to whichever face it
    # exits): march length agrees despite the few-ulp over-steps (the
    # per-crossing epsilon is ~2e-3 cell units at coordinate ~4000)
    expect = np.zeros(nray)
    for r in range(nray):
        smax = np.inf
        for ax, n in ((0, nx), (1, ny), (2, nz)):
            if d[r, ax] > 0:
                smax = min(smax, (n - pos0[r, ax]) / d[r, ax])
            else:
                smax = min(smax, -pos0[r, ax] / d[r, ax])
        expect[r] = smax
    np.testing.assert_allclose(np.asarray(total), expect, rtol=5e-3)
