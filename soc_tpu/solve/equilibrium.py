"""Equilibrium-temperature dust: E<->T mapping, T solve, emission.

Reimplements the reference's in-SOC equilibrium solver chain:
  * host-side E(T) table over NE log-spaced energies (ASOC.py:643-689)
  * per-cell T lookup from integrated absorbed energy
    (kernel_ASOC_aux.c:745-790 EqTemperature)
  * per-cell, per-frequency thermal emission (kernel_ASOC_aux.c:793 Emission)

The table is built once in float64 on the host; the per-cell solve and the
[CELLS, NFREQ] emission evaluation are jitted element-wise device code.
"""

from dataclasses import dataclass, field
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import EMIT_COEFF, FACTOR, H_K, PARSEC, PLANCK, planck_intensity


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TemperatureTable:
    """Log-spaced energy -> temperature lookup: E[i] = emin * ke**i."""

    ttt: jax.Array                                    # [NE] float32 T values
    emin: float = field(metadata=dict(static=True))
    ke: float = field(metadata=dict(static=True))
    ne: int = field(metadata=dict(static=True))


def build_temperature_table(freq, abs_gl, gl_pc, ne=30000, tmax=1600.0):
    """Integrate E_out(T) = 4 pi FACTOR/(GL pc) * trapz(k_abs * B_nu(T)) and
    invert onto a log-spaced energy grid (exact reference math)."""
    freq = np.asarray(freq, np.float64)
    abs_gl = np.asarray(abs_gl, np.float64)
    tstep = tmax / ne
    tt = 1.0 + tstep * np.arange(ne)
    # trapezoid over frequency for every T (vectorized outer product)
    bnu = planck_intensity(freq[None, :], tt[:, None])   # [NE, NFREQ]
    tmp = abs_gl[None, :] * bnu
    df = freq[2:] - freq[:-2]
    res = (tmp[:, 0] * (freq[1] - freq[0]) + tmp[:, -1] * (freq[-1] - freq[-2])
           + np.sum(tmp[:, 1:-1] * df[None, :], axis=1))
    eout = (4.0 * np.pi * FACTOR / (gl_pc * PARSEC)) * 0.5 * res
    emin, emax = eout[0], eout[-1] * 0.9999
    ke = (emax / emin) ** (1.0 / (ne - 1.0))
    egrid = emin * ke ** np.arange(ne)
    ttt = np.interp(egrid, eout, tt).astype(np.float32)
    return TemperatureTable(ttt=jnp.asarray(ttt), emin=float(emin),
                            ke=float(ke), ne=int(ne))


def cell_levels(grid):
    """[CELLS] int32 hierarchy level of every cell (static unrolled)."""
    lev = jnp.zeros(grid.cells, jnp.int32)
    idx = jnp.arange(grid.cells, dtype=jnp.int32)
    for l in range(1, grid.levels):
        lev = jnp.where(idx >= grid.off[l], l, lev)
    return lev


def temperature_lookup(table, absorbed_integrated, dens, lev, gl_pc_parsec,
                       beta=1.0, cr_heating=0.0):
    """Shared per-cell E->T lookup used by the single-device and the
    sharded (parallel/mesh.py) solvers: TABS tally -> absorbed energy per H
    -> log-grid interpolation of the precomputed TTT table."""
    scale = (PLANCK * FACTOR) / gl_pc_parsec
    # beta: ALI escape probability per cell (Ein/beta in the lookup,
    # ASOC.py:2056-2062); scalar 1.0 without ALI
    ein = (scale * absorbed_integrated
           * jnp.exp2(3.0 * lev.astype(jnp.float32))
           / jnp.maximum(dens, 1e-30)) / beta
    # cosmic-ray heating: multiplier on the canonical 1e-27 erg/s/H rate
    # (kernel_ASOC_aux.c:769-772 CR_HEATING)
    ein = ein + 1.0e-27 * FACTOR * cr_heating
    oplgke = 1.0 / np.log10(table.ke)
    ie = jnp.clip(jnp.floor(
        oplgke * jnp.log10(jnp.maximum(ein, 1e-37) / table.emin)),
        0, table.ne - 2).astype(jnp.int32)
    e_lo = table.emin * jnp.power(jnp.float32(table.ke), ie.astype(jnp.float32))
    wi = (e_lo * table.ke - ein) / (e_lo * (table.ke - 1.0))
    t = wi * table.ttt[ie] + (1.0 - wi) * table.ttt[ie + 1]
    return jnp.where(dens > 1.0e-7, jnp.clip(t, 3.0, 1600.0), 10.0)


@partial(jax.jit, static_argnames=())
def solve_temperature(grid, table, absorbed_integrated, gl_pc_parsec,
                      beta=1.0, cr_heating=0.0):
    """Per-cell equilibrium temperature from integrated absorbed energy.

    absorbed_integrated : [CELLS] the TABS tally (trapezoid-weighted photon
    counts carrying FACTOR); gl_pc_parsec : GL*PARSEC in cm.
    Matches the device EqTemperature kernel: empty/parent cells get T=10,
    valid cells are clamped to [3, 1600] K.
    """
    return temperature_lookup(table, absorbed_integrated, grid.dens,
                              cell_levels(grid), gl_pc_parsec,
                              beta=beta, cr_heating=cr_heating)


@jax.jit
def emission(freq, abs_gl, temperature, gl_pc_parsec):
    """EMITTED[CELLS, NFREQ] = FACTOR * 4 pi /(h nu) * k_abs * B_nu(T) / LENGTH.

    Photon counts per Hz per H atom scaled by FACTOR (reference Emission
    kernel constant 2.79639459e-20 = 1e-20 * 8 pi / c^2)."""
    coeff = np.float32(EMIT_COEFF * FACTOR)
    freq = jnp.asarray(freq, jnp.float32)[None, :]
    t = jnp.maximum(temperature, 1e-3)[:, None]
    x = jnp.clip(jnp.float32(H_K) * freq / t, 1e-30, 80.0)
    return (coeff * jnp.asarray(abs_gl, jnp.float32)[None, :]
            * freq * freq / jnp.expm1(x) / jnp.float32(gl_pc_parsec))
