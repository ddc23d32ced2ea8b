"""ALI self-absorption accounting: XAB + TABS must equal the plain tally."""

import numpy as np
import jax.numpy as jnp

from soc_tpu.grid import uniform_grid
from soc_tpu.io.dust import hg_scattering_function
from soc_tpu.transport.propagate import transport_run


def test_ali_split_is_exact():
    """Same packet ids with/without ALI: trajectories identical, so
    TABS_noali == TABS_ali + XAB cell by cell, and XAB only ever records
    deposits in the packet's own natal cell."""
    grid = uniform_grid(6, 6, 6, density=3.0)
    dsc, csc = hg_scattering_function([0.3], 128)
    physics = dict(kabs=jnp.float32(0.2), ksca=jnp.float32(0.15),
                   csc=jnp.asarray(csc[0]), tw=jnp.float32(1.0))
    emit = jnp.ones(grid.cells, jnp.float32)
    per_cell = 32
    n = per_cell * grid.cells
    params = dict(emit=emit, per_cell=jnp.int32(per_cell),
                  ifreq=jnp.int32(0), per_freq=jnp.int32(n))

    t0 = jnp.zeros(grid.cells, jnp.float32)
    i0 = jnp.zeros((1, 1), jnp.float32)
    tabs_plain, _, esc0, abs0 = transport_run(
        grid, physics, params, jnp.int32(n), t0, i0, 4,
        source_kind="cell", nlanes=1 << 12)

    t1 = jnp.zeros(grid.cells, jnp.float32)
    i1 = jnp.zeros((1, 1), jnp.float32)
    xab = jnp.zeros(grid.cells, jnp.float32)
    tabs_ali, _, esc1, abs1, xab = transport_run(
        grid, physics, params, jnp.int32(n), t1, i1, 4,
        source_kind="cell", nlanes=1 << 12, with_ali=True, xab=xab)

    tabs_plain = np.asarray(tabs_plain)
    tabs_ali = np.asarray(tabs_ali)
    xab = np.asarray(xab)
    assert xab.sum() > 0
    # self-absorption is a significant but partial fraction
    assert 0.01 < xab.sum() / tabs_plain.sum() < 0.9
    np.testing.assert_allclose(tabs_ali + xab, tabs_plain, rtol=1e-4,
                               atol=1e-4 * tabs_plain.max())
    np.testing.assert_allclose(float(esc1[0]), float(esc0[0]), rtol=1e-5)
