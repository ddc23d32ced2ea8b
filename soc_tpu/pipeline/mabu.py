"""Multi-dust emission orchestration (the A2E_MABU.py workload).

Splits total absorptions between dust populations in proportion to their
(abundance-weighted) absorption cross sections, solves each population's
emission -- stochastic A2E for gset dusts, equilibrium temperature for
eqdust -- and sums the abundance-weighted emissions:

    ABS_d[cell, f]  = ABS[cell, f] * R[f, d] / sum_d' ABU[cell, d'] R[f, d']
                      (kernel_A2E_MABU_aux.c split_absorbed)
    EMIT[cell, f]   = sum_d ABU[cell, d] * EMIT_d[cell, f]
                      (A2E_MABU.py:1120-1145)

In-process function calls over arrays instead of the reference's
os.system + /dev/shm file chain.
"""

from dataclasses import dataclass

import numpy as np

from ..constants import EMIT_COEFF, FACTOR, H_K, PLANCK, planck_intensity
from ..solve import stochastic
from ..solve.solver_file import SolverData


@dataclass
class DustComponent:
    """One dust population in a multi-dust run."""

    name: str
    kind: str                      # 'gset' (stochastic) or 'eqdust'
    kabs: np.ndarray               # [NFREQ] cross section per H (relative
    #                                 values are what matters for the split)
    solver: SolverData = None      # for kind == 'gset'
    nstoch: int = 999
    # eqdust path:
    freq: np.ndarray = None


def split_absorbed(absorbed, rabs, abu, idust, den=None):
    """Per-dust absorption share (per unit abundance of that dust).

    den : optional precomputed sum_d' ABU[c,d'] R[f,d'] -- it is the same
    for every dust, so multi-dust callers compute it once."""
    if den is None:
        den = np.einsum("cd,fd->cf", abu, rabs)
    return absorbed * rabs[None, :, idust] / np.maximum(den, 1e-40)


def cr_heating_channel(mode, dens, cells):
    """Extra per-cell heating rate [erg/s/H * FACTOR] injected through the
    LAST frequency channel of the absorbed array (A2E_MABU.py:795-817):
      1 : full cosmic-ray rate 1e-27 erg/s/H
      2 : 2x that (deliberate upper limit)
      3 : gas-dust coupling 9e-34 * n(H) * sqrt(Tgas) * (Tgas - Tdust)
          with the reference's ad hoc Tgas(n), dT(n) interpolations
    """
    if mode == 1:
        return np.full(cells, 1.0e-27 * FACTOR, np.float32)
    if mode == 2:
        return np.full(cells, 2.0e-27 * FACTOR, np.float32)
    if mode == 3:
        logn = np.log10(np.clip(np.asarray(dens, np.float64), 1e-8, 1e20))
        xs = [-8.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 20.0]
        tg = np.interp(logn, xs, [15, 15, 15, 15, 14, 12, 10, 7, 6, 6, 6])
        dt = np.interp(logn, xs, [5, 5, 5, 5, 5, 5, 3, 1, 0, 0, 0])
        return (9.0e-34 * np.asarray(dens, np.float64) * np.sqrt(tg) * dt
                * FACTOR).astype(np.float32)
    raise ValueError("CR_HEATING mode %r" % mode)


def solve_equilibrium_eqdust(kabs, freq, absorbed, ne=30000,
                             cr_channel=False):
    """SolveEquilibriumDust (A2E_MABU.py:436-560 + kernel_eqsolver.c):
    per-cell T from the E<->T table, emission per unit density.

    cr_channel=True: the last frequency channel holds a direct heating
    rate (erg/s/H * FACTOR), excluded from the photon integration and
    added to Ein as-is (kernel_eqsolver.c:27-33)."""
    freq = np.asarray(freq, np.float64)
    kabs = np.asarray(kabs, np.float64)
    tstep = 1600.0 / ne
    tt = 1.0 + tstep * np.arange(ne)
    bnu = planck_intensity(freq[None, :], tt[:, None])
    tmp = kabs[None, :] * bnu
    df = freq[2:] - freq[:-2]
    res = (tmp[:, 0] * (freq[1] - freq[0]) + tmp[:, -1] * (freq[-1] - freq[-2])
           + np.sum(tmp[:, 1:-1] * df[None, :], axis=1))
    eout = 4.0 * np.pi * FACTOR * 0.5 * res
    # per-cell Ein: trapezoid of ABS * h nu (kernel_eqsolver.c EqTemperature)
    absorbed = np.asarray(absorbed, np.float64)
    ein_extra = 0.0
    if cr_channel:
        absorbed = absorbed.copy()
        ein_extra = absorbed[:, -1].copy()
        absorbed[:, -1] = 0.0
    integ = absorbed * (PLANCK * freq)[None, :]
    ein = ein_extra + 0.5 * np.sum((integ[:, 1:] + integ[:, :-1])
                                   * (freq[1:] - freq[:-1])[None, :], axis=1)
    t = np.interp(ein, eout, tt)
    x = np.clip(H_K * freq[None, :] / np.maximum(t[:, None], 1e-3),
                1e-10, 500)
    emit = (EMIT_COEFF * FACTOR) * kabs[None, :] * freq[None, :] ** 2 \
        / np.expm1(x)
    return emit.astype(np.float32), t.astype(np.float32)


def solve_emission_multi(components, absorbed, abu=None,
                         return_components=False, cr_mode=0, dens=None,
                         pol=None):
    """Full multi-dust solve.

    components : list[DustComponent]
    absorbed   : [CELLS, NFREQ] total absorptions (absorbed.data payload)
    abu        : [CELLS, NDUST] abundances (default: all ones)
    cr_mode    : CR_HEATING 1/2/3 -- inject the extra heating rate through
                 the last frequency channel and split it between dusts like
                 any absorption (ratio of cross sections at the highest
                 frequency ~ physical grain cross sections,
                 A2E_MABU.py:780-817); mode 3 needs dens [CELLS].
    pol        : optional {component index: spec} for the `polarisation`
                 keyword (A2E_MABU.py:158-167, 615-637): spec is
                 ('aalg', a_alg[CELLS]) for a stochastic dust (emission
                 restricted to aligned sizes a >= a_alg) or
                 ('rfactor', R[CELLS, NFREQ]) for an eqdust (the .rpol
                 aligned-cross-section fraction interpolated per cell).
    Returns EMITTED [CELLS, NFREQ] float32; with return_components=True,
    (EMITTED, [per-dust (absorbed_d, emit_d)]) -- the training pairs the
    NN surrogate path consumes (A2E_MABU.py:1017-1068). With pol given,
    PEMITTED [CELLS, NFREQ] is appended to the return value.
    """
    cells, nfreq = absorbed.shape
    ndust = len(components)
    if abu is None:
        abu = np.ones((cells, ndust), np.float32)
    if cr_mode > 0:
        absorbed = np.asarray(absorbed).copy()
        absorbed[:, -1] = cr_heating_channel(cr_mode, dens, cells)
    # normalized relative cross sections (A2E_MABU.py:338-342)
    rabs = np.zeros((nfreq, ndust))
    for d, comp in enumerate(components):
        rabs[:, d] = np.clip(comp.kabs, 1e-40, 1e30)
    rabs /= (1e-40 + rabs.sum(axis=1))[:, None]
    rabs = np.clip(rabs, 1e-30, 1.0)

    emitted = np.zeros((cells, nfreq), np.float32)
    pemitted = np.zeros((cells, nfreq), np.float32) if pol else None
    per_dust = []
    split_den = np.einsum("cd,fd->cf", abu, rabs)
    for d, comp in enumerate(components):
        absd = split_absorbed(absorbed, rabs, abu, d, den=split_den)
        pol_d = pol.get(d) if pol else None
        if comp.kind == "gset":
            # stochastic grains: with CR heating the reference feeds the
            # extra channel to A2E as highest-frequency absorptions (the
            # split file keeps it); identical here
            if pol_d is not None and pol_d[0] == "aalg":
                emit_d, pemit_d = stochastic.solve_emission(
                    comp.solver, absd, nstoch=comp.nstoch, aalg=pol_d[1])
            else:
                emit_d = stochastic.solve_emission(comp.solver, absd,
                                                   nstoch=comp.nstoch)
                pemit_d = None
        elif comp.kind == "eqdust":
            emit_d, _ = solve_equilibrium_eqdust(comp.kabs, comp.freq, absd,
                                                 cr_channel=cr_mode > 0)
            pemit_d = emit_d * pol_d[1] \
                if pol_d is not None and pol_d[0] == "rfactor" else None
        else:
            raise ValueError(f"unknown dust kind {comp.kind!r}")
        emitted += emit_d * abu[:, d][:, None]
        if pemitted is not None and pemit_d is not None:
            pemitted += pemit_d * abu[:, d][:, None]
        if return_components:
            per_dust.append((absd, emit_d))
    out = (emitted,)
    if return_components:
        out += (per_dust,)
    if pol:
        out += (pemitted,)
    return out if len(out) > 1 else emitted
