"""Region-of-interest photon save/load: the reference's domain-coupling.

A run can record every packet that enters an ROI box as a histogram over
(surface element, healpix direction) -- kernel_ASOC.c WITH_ROI_SAVE
(:617-660) -- and a second run over a refined sub-model re-injects them as a
boundary source (SOURCE==3, :469-505). This is the blueprint the multi-chip
domain decomposition will turn into a live halo exchange.

File format (ASOC.py:906-946): int32 [rnx, rny, rnz, nside, nfreq] +
float32 [NFREQ, NELEM * 12 * nside^2], NELEM = rny*rnz + rnx*rnz + rnx*rny
(one entry per ROI-box surface element, X/Y/Z sides in that order).
"""

import numpy as np
import jax.numpy as jnp


def roi_nelem(rnx, rny, rnz):
    return rny * rnz + rnx * rnz + rnx * rny


def roi_cell_mask(grid, roi):
    """bool[CELLS]: cell's root ancestor lies inside the ROI box
    roi = [x0, x1, y0, y1, z0, z1] (inclusive root-cell limits)."""
    x0, x1, y0, y1, z0, z1 = roi
    par = np.asarray(grid.par)
    off = np.asarray(grid.off)
    lcells = np.asarray(grid.lcells)
    mask = np.zeros(grid.cells, bool)
    # root cells
    idx = np.arange(grid.nx * grid.ny * grid.nz)
    ix = idx % grid.nx
    iy = (idx // grid.nx) % grid.ny
    iz = idx // (grid.nx * grid.ny)
    mask[: len(idx)] = ((ix >= x0) & (ix <= x1) & (iy >= y0) & (iy <= y1)
                       & (iz >= z0) & (iz <= z1))
    # deeper levels inherit from their parents
    for lvl in range(1, grid.levels):
        a = off[lvl]
        b = a + lcells[lvl]
        parents = par[a:b]                    # level-local parent index
        mask[a:b] = mask[off[lvl - 1] + parents]
    return mask


def roi_element_index(rp, dir, roi, rnx, rny, rnz, step):
    """Surface-element + healpix inputs for a packet entering the ROI at
    root position rp (kernel_ASOC.c:617-648 bookkeeping, vectorized)."""
    x0, x1, y0, y1, z0, z1 = [jnp.float32(v) for v in roi]
    near_x = (rp[:, 0] < x0 + 1e-3) | (rp[:, 0] > x1 + 0.999)
    near_y = (rp[:, 1] < y0 + 1e-3) | (rp[:, 1] > y1 + 0.999)
    near_z = (rp[:, 2] < z0 + 1e-3) | (rp[:, 2] > z1 + 0.999)

    def coord(v, lo, n):
        return jnp.clip(((v - lo) * step).astype(jnp.int32), 0, n - 1)

    # X border: (y, z); Y border: (x, z); Z border: (x, y) -- later checks
    # override earlier ones exactly as in the kernel's sequential ifs
    ii = coord(rp[:, 1], y0, rny) + rny * coord(rp[:, 2], z0, rnz)
    ii = jnp.where(near_y,
                   rny * rnz + coord(rp[:, 0], x0, rnx)
                   + rnx * coord(rp[:, 2], z0, rnz), ii)
    ii = jnp.where(near_z,
                   rny * rnz + rnx * rnz + coord(rp[:, 0], x0, rnx)
                   + rnx * coord(rp[:, 1], y0, rny), ii)
    ii = jnp.where(near_x & ~near_y & ~near_z,
                   coord(rp[:, 1], y0, rny) + rny * coord(rp[:, 2], z0, rnz),
                   ii)
    return jnp.clip(ii, 0, roi_nelem(rnx, rny, rnz) - 1)


def write_roi_file(path, rnx, rny, rnz, nside, tallies):
    """tallies: [NFREQ, NELEM * 12 * nside^2]."""
    tallies = np.asarray(tallies, np.float32)
    with open(path, "wb") as fp:
        np.asarray([rnx, rny, rnz, nside, tallies.shape[0]],
                   np.int32).tofile(fp)
        tallies.tofile(fp)


def read_roi_file(path):
    with open(path, "rb") as fp:
        rnx, rny, rnz, nside, nfreq = np.fromfile(fp, np.int32, 5)
        npx = 12 * nside * nside
        nelem = roi_nelem(rnx, rny, rnz)
        data = np.fromfile(fp, np.float32).reshape(nfreq, nelem * npx)
    return int(rnx), int(rny), int(rnz), int(nside), data
