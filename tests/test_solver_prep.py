"""A2E_pre solver generation: physics validation on a synthetic grain model.

Validation strategy (no runnable reference here): the thermal-continuous
stochastic solution of a LARGE grain in a steady radiation field must
converge to the equilibrium-temperature solution -- total emitted energy
equals total absorbed energy, and the spectrum peaks at the equilibrium T.
"""

import numpy as np
import pytest

from soc_tpu.constants import BOLTZMANN, C_LIGHT, FACTOR, PLANCK
from soc_tpu.solve.grain_model import GSETDust
from soc_tpu.solve import solver_prep, stochastic
from soc_tpu.solve.solver_file import write_solver, read_solver


def synthetic_dust(nsize=2, size_a=None, s_frac=None):
    """Silicate-ish grains with Debye-like enthalpy E ~ a^3 T^4 / (1+T)."""
    qnfreq = 48
    qfreq = np.logspace(11, 15.5, qnfreq)
    qsize = np.asarray([5e-8, 1e-7, 1e-6, 1e-5])     # cm
    # Qabs ~ a * nu law at low freq, saturating at 1
    qabs = np.zeros((4, qnfreq))
    for i, a in enumerate(qsize):
        x = a * qfreq / 3e4
        qabs[i] = x / (1.0 + x)
    c_temp = np.logspace(0, np.log10(3000.0), 64)
    c_size = qsize.copy()
    # E(T) per grain: Debye T^3 heat capacity with T_D ~ 500 K and silicate
    # atom density => E ~ 0.35 a^3 T^4 erg (a in cm), flattening above T_D
    c_e = np.zeros((4, 64))
    for i, a in enumerate(c_size):
        c_e[i] = 0.35 * a**3 * c_temp**4 / (1.0 + (c_temp / 500.0) ** 3)
    size_a = np.asarray([1e-7, 3e-6][:nsize] if size_a is None else size_a)
    nsize = len(size_a)
    s_frac = np.asarray([0.7, 0.3][:nsize] if s_frac is None else s_frac,
                        np.float64)
    s_frac = s_frac / s_frac.sum()
    return GSETDust(
        grain_density=1.0e-10, size_a=size_a, s_frac=s_frac,
        tmin=np.full(nsize, 3.0), tmax=np.full(nsize, 200.0),
        qsize=qsize, qfreq=qfreq, qabs=qabs, qsca=qabs * 0.5,
        g=np.zeros((4, qnfreq)),
        c_size=c_size, c_temp=c_temp, c_e=c_e)


def isrf_absorptions(dust, freq, scale=1.0):
    """Absorbed photons per H per Hz (x FACTOR) for a diluted 1e4 K field."""
    t_rad = 1.0e4
    w = 1.0e-13 * scale
    x = np.clip(PLANCK * freq / (BOLTZMANN * t_rad), 1e-6, 600)
    bnu = 2.0 * PLANCK * (freq / C_LIGHT) ** 2 * freq / np.expm1(x)
    kabs = dust.kabs(freq)
    # ABS (file convention) = FACTOR * 4 pi J_nu/(h nu) * kabs
    return (FACTOR * 4.0 * np.pi * w * bnu
            / (PLANCK * freq) * kabs).astype(np.float32)


@pytest.fixture(scope="module")
def solver():
    dust = synthetic_dust()
    freq = np.logspace(11.3, 15.2, 40)
    return dust, freq, solver_prep.build_solver(dust, freq, ne=128)


def test_tdown_positive_increasing(solver):
    dust, freq, sol = solver
    for sd in sol.sizes:
        assert sd.tdown[0] == 0.0
        assert np.all(sd.tdown[1:] > 0)
        # cooling rates rise with energy (the growth factor depends on the
        # enthalpy-grid spacing; only monotone trend is universal)
        assert sd.tdown[-1] > 2.0 * sd.tdown[1]


def test_weights_structure(solver):
    dust, freq, sol = solver
    for sd in sol.sizes:
        assert np.all(sd.iw >= 0)
        valid = sd.l1 >= 0
        assert valid.sum() > 0
        # stream length matches the L1/L2 ranges
        lens = np.where(valid, sd.l2 - sd.l1 + 1, 0)
        assert lens.sum() == len(sd.iw)


def test_solver_file_roundtrip_through_disk(tmp_path, solver):
    dust, freq, sol = solver
    path = tmp_path / "synth.solver"
    write_solver(path, sol)
    sol2 = read_solver(path)
    np.testing.assert_allclose(sol2.sk_abs, sol.sk_abs, rtol=1e-6)
    np.testing.assert_array_equal(sol2.sizes[0].iw, sol.sizes[0].iw)


def test_energy_balance_stochastic(solver):
    """Steady state: emitted energy == absorbed energy, per size."""
    dust, freq, sol = solver
    absorbed = isrf_absorptions(dust, freq)[None, :].repeat(4, axis=0)
    emitted = stochastic.solve_emission(sol, absorbed, clip_last=False)
    # energy in = integral ABS_tot * AF... per H: sum over sizes is total
    e_in = np.trapezoid(absorbed[0] * PLANCK * freq, freq)
    e_out = np.trapezoid(emitted[0] * PLANCK * freq, freq)
    assert abs(e_out - e_in) / e_in < 0.08, (e_out, e_in)


def test_large_grain_matches_equilibrium(solver):
    """In a strong field (absorption rate >> cooling cascade rate) the big
    grain's stochastic solution must converge to the equilibrium-temperature
    spectrum (thermal-continuous limit)."""
    dust, freq, sol = solver
    absorbed = isrf_absorptions(dust, freq, scale=1e6)[None, :]
    w_flat, tdown, ea = stochastic.prepare_size_arrays(sol, 1)
    import jax.numpy as jnp
    stoch = np.asarray(stochastic.solve_batch(
        w_flat, tdown, ea, jnp.asarray(absorbed), sol.ne))[0]
    equil = stochastic.solve_equilibrium_size(sol, 1, absorbed)[0]
    # compare where emission is significant (>1e-4 of peak); the Wien tail
    # legitimately exceeds equilibrium from temperature fluctuations
    m = equil > 1e-4 * equil.max()
    ratio = stoch[m] / equil[m]
    np.testing.assert_allclose(np.median(ratio), 1.0, atol=0.05)
    assert ratio.min() > 0.9 and ratio.max() < 1.5
