"""Equilibrium temperature solver: inversion round-trip + emission physics."""

import numpy as np
import jax.numpy as jnp

from soc_tpu.constants import FACTOR, PARSEC, PLANCK, planck_intensity
from soc_tpu.grid import uniform_grid
from soc_tpu.solve import equilibrium


def synthetic_dust(nfreq=40):
    freq = np.logspace(11.2, 15.3, nfreq)
    # crudely kappa ~ nu^1.8 in the FIR flattening at high freq
    abs_gl = 1e-9 * (freq / 1e12) ** 1.8 / (1.0 + (freq / 3e14) ** 1.8)
    return freq, abs_gl.astype(np.float32)


def eout_of_T(freq, abs_gl, gl_pc, T):
    """Direct emitted-energy integral for one temperature (table math)."""
    bnu = planck_intensity(freq, T)
    tmp = np.asarray(abs_gl, np.float64) * bnu
    df = freq[2:] - freq[:-2]
    res = (tmp[0] * (freq[1] - freq[0]) + tmp[-1] * (freq[-1] - freq[-2])
           + np.sum(tmp[1:-1] * df))
    return (4.0 * np.pi * FACTOR / (gl_pc * PARSEC)) * 0.5 * res


def test_table_inversion_roundtrip():
    freq, abs_gl = synthetic_dust()
    gl_pc = 0.01
    table = equilibrium.build_temperature_table(freq, abs_gl, gl_pc, ne=30000)
    grid = uniform_grid(4, 4, 4, density=2.0)
    gl_cm = gl_pc * PARSEC
    for t_true in (8.0, 15.0, 30.0, 120.0, 700.0):
        eout = eout_of_T(freq, abs_gl, gl_pc, t_true)
        # absorbed tally that corresponds to Ein = eout for density-2 cells:
        # Ein = (PLANCK*FACTOR/gl_cm) * tabs / dens
        tabs = np.full(grid.cells,
                       eout * 2.0 / (PLANCK * FACTOR / gl_cm), np.float32)
        t = np.asarray(equilibrium.solve_temperature(
            grid, table, jnp.asarray(tabs), gl_cm))
        np.testing.assert_allclose(t, t_true, rtol=2e-3)


def test_empty_cells_get_t10():
    freq, abs_gl = synthetic_dust()
    table = equilibrium.build_temperature_table(freq, abs_gl, 0.01)
    grid = uniform_grid(2, 2, 2, density=1e-10)
    t = np.asarray(equilibrium.solve_temperature(
        grid, table, jnp.zeros(8, jnp.float32), 0.01 * PARSEC))
    np.testing.assert_allclose(t, 10.0)


def test_emission_matches_planck_formula():
    freq, abs_gl = synthetic_dust(10)
    gl_cm = 0.01 * PARSEC
    T = np.asarray([12.0, 25.0, 80.0], np.float32)
    emitted = np.asarray(equilibrium.emission(freq, abs_gl,
                                              jnp.asarray(T), gl_cm))
    for i, t in enumerate(T):
        expect = (FACTOR * 4.0 * np.pi / (PLANCK * freq)) * abs_gl * \
            planck_intensity(freq, t) / gl_cm
        # atol floor: float32 + exponent clipping flush the deep Wien tail
        # (values ~20 orders below the peak) toward zero
        np.testing.assert_allclose(emitted[i], expect, rtol=2e-4, atol=1e-14)


def test_energy_balance_of_emission():
    """The emitted spectrum integrated with trapezoid * h nu must return the
    absorbed energy that produced T (closure of the whole solve)."""
    freq, abs_gl = synthetic_dust()
    gl_pc = 0.01
    gl_cm = gl_pc * PARSEC
    table = equilibrium.build_temperature_table(freq, abs_gl, gl_pc)
    grid = uniform_grid(2, 2, 2, density=1.0)
    eout = eout_of_T(freq, abs_gl, gl_pc, 20.0)
    tabs = np.full(8, eout / (PLANCK * FACTOR / gl_cm), np.float32)
    t = np.asarray(equilibrium.solve_temperature(
        grid, table, jnp.asarray(tabs), gl_cm))
    emitted = np.asarray(equilibrium.emission(freq, abs_gl,
                                              jnp.asarray(t), gl_cm))[0]
    # integral of emitted photons * h nu over freq = absorbed energy density
    integrand = emitted * PLANCK * freq
    df = freq[2:] - freq[:-2]
    tot = 0.5 * (integrand[0] * (freq[1] - freq[0])
                 + integrand[-1] * (freq[-1] - freq[-2])
                 + np.sum(integrand[1:-1] * df))
    np.testing.assert_allclose(tot, eout, rtol=5e-3)
