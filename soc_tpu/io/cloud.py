"""Reference-compatible codecs for hierarchical cell files.

File format (ASOC_aux.py:716-803): int32 header [NX, NY, NZ, LEVELS, CELLS],
then per level an int32 cell count followed by float32 values. The same
container stores densities (cloud), dust temperatures (*.T) and magnetic-field
components; parent cells hold negated bit-cast child links in the cloud file.
"""

import numpy as np

from ..grid import grid_from_arrays


def read_hierarchy(path):
    """Read a hierarchical file -> (nx, ny, nz, lcells, [level values])."""
    with open(path, "rb") as fp:
        nx, ny, nz, levels, cells = np.fromfile(fp, np.int32, 5)
        lcells = np.zeros(levels, np.int32)
        values = []
        for lvl in range(levels):
            n = int(np.fromfile(fp, np.int32, 1)[0])
            lcells[lvl] = n
            values.append(np.fromfile(fp, np.float32, n))
    assert int(np.sum(lcells)) == cells, "corrupt hierarchy file"
    return int(nx), int(ny), int(nz), lcells, values


def write_hierarchy(path, nx, ny, nz, lcells, values):
    """Write a hierarchical file from per-level float32 arrays."""
    lcells = np.asarray(lcells, np.int32)
    with open(path, "wb") as fp:
        np.asarray([nx, ny, nz, len(lcells), int(np.sum(lcells))],
                   np.int32).tofile(fp)
        for lvl, vals in enumerate(values):
            np.asarray([lcells[lvl]], np.int32).tofile(fp)
            np.asarray(vals, np.float32).tofile(fp)


def read_cloud(path, kdensity=1.0):
    """Read a cloud (density) file into a device Grid.

    Densities are scaled by ``kdensity`` (ini keyword ``density``); link values
    (<=0) are left untouched.
    """
    nx, ny, nz, lcells, values = read_hierarchy(path)
    if kdensity != 1.0:
        scaled = []
        for vals in values:
            v = vals.copy()
            leaf = v > 0.0
            v[leaf] *= np.float32(kdensity)
            scaled.append(v)
        values = scaled
    return grid_from_arrays(nx, ny, nz, lcells, values)


def write_cell_field(path, grid, values):
    """Write per-cell values (e.g. temperature) in the cloud container format."""
    lcells = np.asarray(grid.lcells)
    off = np.asarray(grid.off)
    values = np.asarray(values, np.float32)
    per_level = [values[off[l]: off[l] + lcells[l]] for l in range(grid.levels)]
    write_hierarchy(path, grid.nx, grid.ny, grid.nz, lcells, per_level)
