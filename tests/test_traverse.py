"""Traversal unit tests: step geometry and octree indexing invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from soc_tpu.grid import uniform_grid, grid_from_arrays, encode_link_np
from soc_tpu.ops import traverse

march = jax.jit(traverse.march_path_lengths, static_argnames="max_steps")


def make_octree_grid():
    """4x4x4 root; root cell (1,1,1) refined one level; (2,2,2) two levels."""
    nx = ny = nz = 4
    root = np.ones(nx * ny * nz, np.float32)
    c111 = 1 * 16 + 1 * 4 + 1
    root[c111] = encode_link_np([0])[0]
    c222 = 2 * 16 + 2 * 4 + 2
    root[c222] = encode_link_np([8])[0]
    l1 = np.full(16, 2.0, np.float32)
    l1[11] = encode_link_np([0])[0]
    l2 = np.full(8, 4.0, np.float32)
    return grid_from_arrays(nx, ny, nz, [64, 16, 8], [root, l1, l2])


def normalize(v):
    v = np.asarray(v, np.float64)
    return (v / np.linalg.norm(v)).astype(np.float32)


def chord_length(start, d, box):
    """Analytic distance from start to exit of [0,box]^3-style volume."""
    ts = []
    for s, dd, b in zip(start, d, box):
        ts.append(((b if dd > 0 else 0.0) - s) / dd)
    return min(t for t in ts if t > 0)


def test_index_global_uniform():
    grid = uniform_grid(8, 8, 8)
    pos = jnp.asarray([[0.5, 0.5, 0.5], [7.9, 7.9, 7.9], [-1.0, 4.0, 4.0],
                       [3.2, 6.7, 1.1]], jnp.float32)
    p, level, ind = traverse.index_global(grid, pos)
    np.testing.assert_array_equal(np.asarray(level), [0, 0, 0, 0])
    assert int(ind[0]) == 0
    assert int(ind[1]) == 7 * 64 + 7 * 8 + 7
    assert int(ind[2]) == -1
    assert int(ind[3]) == 1 * 64 + 6 * 8 + 3


def test_regular_grid_ray_paths():
    grid = uniform_grid(16, 16, 16)
    dirs = np.stack([
        normalize([1.0, 1e-5, 1e-5]),
        normalize([1.0, 1.0, 1.0]),
        normalize([0.3, 0.8, 0.52]),
    ])
    starts = np.asarray([[1e-3, 8.5, 8.5],
                         [1e-3, 0.011, 0.021],
                         [2.0, 1e-3, 1.0]], np.float32)
    # march one direction at a time (dir is shared across lanes)
    for i in range(3):
        total = march(grid, jnp.asarray(starts[i:i + 1]),
                      jnp.asarray(dirs[i:i + 1]))
        expect = chord_length(starts[i], dirs[i], (16, 16, 16))
        assert abs(float(total[0]) - expect) / expect < 0.01


def test_octree_descend():
    grid = make_octree_grid()
    p, level, ind = traverse.index_global(
        grid, jnp.asarray([[1.25, 1.25, 1.25]], jnp.float32))
    assert int(level[0]) == 1
    assert int(ind[0]) == 0
    assert 0.0 <= float(p[0, 0]) <= 2.0
    p, level, ind = traverse.index_global(
        grid, jnp.asarray([[2.6, 2.6, 2.1]], jnp.float32))
    assert int(level[0]) == 2


def test_octree_random_rays_path_conservation():
    """Chord length through the octree == analytic, for many random rays."""
    grid = make_octree_grid()
    rng = np.random.default_rng(7)
    n = 64
    theta = np.arccos(rng.uniform(-1, 1, n))
    phi = rng.uniform(0, 2 * np.pi, n)
    d = np.stack([np.sin(theta) * np.cos(phi),
                  np.sin(theta) * np.sin(phi), np.cos(theta)], -1)
    d = np.where(np.abs(d) < 1e-4, 1e-4, d)
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    starts = rng.uniform(0.2, 3.8, (n, 3)).astype(np.float32)
    total = np.asarray(march(grid, jnp.asarray(starts), jnp.asarray(d)))
    for i in range(n):
        expect = chord_length(starts[i], d[i], (4, 4, 4))
        assert abs(total[i] - expect) < 0.03, (i, total[i], expect)


def test_octree_axis_rays():
    grid = make_octree_grid()
    d = np.tile(normalize([1.0, 1e-4, 1e-4]), (5, 1))
    ys = np.asarray([0.5, 1.5, 2.5, 1.3, 2.7], np.float32)
    starts = np.stack([np.full(5, 1e-3, np.float32), ys, ys], -1)
    total = np.asarray(march(grid, jnp.asarray(starts), jnp.asarray(d)))
    np.testing.assert_allclose(total, 4.0, atol=0.02)


def test_masked_lanes_do_not_move():
    grid = uniform_grid(8, 8, 8)
    pos = jnp.asarray([[4.2, 4.2, 4.2], [4.2, 4.2, 4.2]], jnp.float32)
    p0, level, ind = traverse.index_global(grid, pos)
    d = jnp.asarray([[1.0, 1e-4, 1e-4]] * 2, jnp.float32)
    active = jnp.asarray([True, False])
    ds, p1, level1, ind1 = traverse.get_step(grid, p0, d, level, ind, active)
    np.testing.assert_array_equal(np.asarray(p1[1]), np.asarray(p0[1]))
    assert int(ind1[1]) == int(ind[1])


def test_index_update_stack_parity():
    """The ancestor-stack traversal (hot-path variant, no PAR gathers) must
    reproduce index_update exactly on random walks over a refined grid."""
    import jax.numpy as jnp
    from soc_tpu.ops import traverse

    grid = make_octree_grid()
    rng = np.random.default_rng(11)
    n = 512
    pos = rng.uniform(0.2, grid.nx - 0.2, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = np.where(np.abs(dirs) < 1e-5, 1e-5, dirs).astype(np.float32)
    p, lvl, ind = traverse.index_global(grid, jnp.asarray(pos))
    anc = traverse.stack_from_par(grid, lvl, ind)
    d = jnp.asarray(dirs)
    for _ in range(60):
        active = ind >= 0
        ds0, p0, l0, i0 = traverse.get_step(grid, p, d, lvl, ind, active)
        ds1, p1, l1, i1, anc = traverse.get_step_stack(grid, p, d, lvl, ind,
                                                       anc, active)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))
        np.testing.assert_allclose(np.asarray(ds0), np.asarray(ds1))
        # the maintained stack always matches a PAR rebuild
        np.testing.assert_array_equal(
            np.asarray(jnp.where((jnp.arange(anc.shape[1])[None, :]
                                  < l1[:, None]) & (i1 >= 0)[:, None],
                                 anc, -9)),
            np.asarray(jnp.where((jnp.arange(anc.shape[1])[None, :]
                                  < l1[:, None]) & (i1 >= 0)[:, None],
                                 traverse.stack_from_par(grid, l1, i1), -9)))
        p, lvl, ind = p1, l1, i1
