"""Mirror boundaries: fully mirrored box traps all photons."""

import numpy as np
import jax.numpy as jnp

from soc_tpu.grid import uniform_grid
from soc_tpu.io.dust import hg_scattering_function
from soc_tpu.transport.propagate import transport_run


def run(mirror_mask, n, kabs=0.05):
    grid = uniform_grid(6, 6, 6, density=1.0)
    dsc, csc = hg_scattering_function([0.0], 64)
    physics = dict(kabs=jnp.float32(kabs), ksca=jnp.float32(0.0),
                   csc=jnp.asarray(csc[0]), tw=jnp.float32(1.0))
    params = dict(ps_pos=jnp.asarray([[3.0, 3.0, 3.0]], jnp.float32),
                  photons=jnp.ones(1, jnp.float32),
                  ifreq=jnp.int32(0), per_freq=jnp.int32(n))
    tabs = jnp.zeros(grid.cells, jnp.float32)
    intf = jnp.zeros((1, 1), jnp.float32)
    tabs, _, esc, absd = transport_run(
        grid, physics, params, jnp.int32(n), tabs, intf, 17,
        source_kind="ps", nlanes=1 << 12, max_iters=1 << 14,
        mirror_mask=mirror_mask)
    return float(absd), float(esc[0])


def test_all_faces_mirrored_absorbs_everything():
    n = 20000
    absd, esc = run(0b111111, n)
    assert esc / n < 1e-3, esc
    assert abs(absd - n) / n < 2e-3, absd


def test_partial_mirror_reduces_escape():
    n = 40000
    absd_open, esc_open = run(0, n)
    absd_half, esc_half = run(0b000011, n)   # mirror both X faces
    assert esc_half < esc_open
    assert absd_half > absd_open
    # conservation still holds
    assert abs(absd_half + esc_half - n) / n < 2e-3
