"""Solver-file generation: the A2E_pre stage.

Builds, per grain size, the arrays the stochastic solver consumes
(reference: A2E_pre.py:180-291 + kernel_A2E_pre.c):

  * energy grid      E[NE+1] from T = TMIN + (TMAX-TMIN)*(i/NE)^2 via T2E
  * cooling rates    Tdown[NE]: Draine & Li (2001) eq. 41 thermal-continuous
                     approximation (kernel PrepareTdown, :123-205)
  * heating weights  sparse (Iw, L1, L2): trapezoid quadrature of the
                     bin-overlap function G(E) against frequency-grid hat
                     functions (kernel PrepareIntegrationWeightsTrapezoid,
                     :580-736 -- the only variant valid for large grains)
  * emission array   EA[NFREQ, NE] = SKabs_Int * B_nu(T_center)/(h nu) *
                     4 pi FACTOR
  * Ibeg[NFREQ]      first energy bin whose centre exceeds the photon energy

All host-side float64 NumPy: this is offline preprocessing (the reference
runs it on CPU via OpenCL as well); the hot per-cell solve lives in
stochastic.py.
"""

import numpy as np

from ..constants import BOLTZMANN, C_LIGHT, FACTOR, PLANCK
from .solver_file import SizeData, SolverData

# 8 pi / (c^2 h^3), the kernel's literal 9.612370e+58
TDOWN_COEFF = 9.612370e58
SS = 8   # substeps per frequency bin in the Tdown integral


def energy_grid(dust, isize, ne):
    """T and E grids (NE+1 boundaries) for one size (A2E_pre.py:215-218)."""
    nepo = ne + 1
    t = (dust.tmin[isize] + (dust.tmax[isize] - dust.tmin[isize])
         * (np.arange(nepo) / (nepo - 1.0)) ** 2.0)
    e = dust.t2e(isize, t)
    return t, e


def prepare_tdown(freq, skabs_grain, e, t, ne):
    """Cooling rates Tdown[NE] (kernel PrepareTdown, kernel_A2E_pre.c:123).

    skabs_grain : pi a^2 Qabs for a single grain at `freq`
    e, t        : energy/temperature grids [NE+1]
    """
    ef = PLANCK * np.asarray(freq, np.float64)
    tdown = np.zeros(ne)
    nfreq = len(freq)

    def c_abs(energy):
        return np.interp(energy / PLANCK, freq, skabs_grain)

    def integrand(energy, kt):
        x = np.minimum(energy / kt, 700.0)
        return energy ** 3 * c_abs(energy) / np.expm1(x)

    for u in range(1, ne):
        eu = 0.5 * (e[u] + e[u + 1])
        el = 0.5 * (e[u - 1] + e[u])
        tu = np.interp(eu, e, t)
        kt = BOLTZMANN * tu
        total = 0.0
        # leading segment [0, min(Ef[0], Eu)] (the reference folds this into
        # its first trapezoid from (0,0); for Eu < Ef[0] its backward
        # sub-stepping produced junk that DoSolve clipped away -- here the
        # segment is integrated properly with C(E<Ef[0]) clamped to C[0])
        top = min(ef[0], eu)
        ee0 = 0.0
        yy0 = 0.0
        for ee1 in np.arange(1, SS + 1) * top / SS:
            yy1 = integrand(ee1, kt)
            total += 0.5 * (ee1 - ee0) * (yy1 + yy0)
            ee0, yy0 = ee1, yy1
        i = 0
        # full frequency bins below Eu, SS substeps each
        while i < nfreq - 1 and ef[i + 1] < eu:
            sub = ef[i] + (np.arange(1, SS + 1)) * (ef[i + 1] - ef[i]) / SS
            for ee1 in sub:
                yy1 = integrand(ee1, kt)
                total += 0.5 * (ee1 - ee0) * (yy1 + yy0)
                ee0, yy0 = ee1, yy1
            i += 1
        # last partial step [Ef[i], Eu]
        if i < nfreq - 1 and eu > ef[i]:
            sub = ef[i] + (np.arange(1, SS + 1)) * (eu - ef[i]) / SS
            for ee1 in sub:
                yy1 = integrand(ee1, kt)
                total += 0.5 * (ee1 - ee0) * (yy1 + yy0)
                ee0, yy0 = ee1, yy1
        tdown[u] = total * TDOWN_COEFF / (eu - el)
    return tdown.astype(np.float32)


def prepare_weights_trapezoid(freq, e, ne):
    """Sparse heating integration weights for all (l, u) pairs.

    Port of PrepareIntegrationWeightsTrapezoid (kernel_A2E_pre.c:580-736)
    including its exact quadrature decisions (mid-point G on the falling
    flank, intrabin term for u == l+1). Returns (iw, l1, l2) in the file's
    sparse stream order.
    """
    ef = PLANCK * np.asarray(freq, np.float64)
    nfreq = len(freq)
    l1 = np.full((ne, ne), -1, np.int32)
    l2 = np.full((ne, ne), -2, np.int32)
    stream = []

    for l in range(ne - 1):
        el = 0.5 * (e[l] + e[l + 1])
        d_el = e[l + 1] - e[l]
        for u in range(l + 1, ne):
            eu = 0.5 * (e[u] + e[u + 1])
            d_eu = e[u + 1] - e[u]
            w1 = e[u] - e[l + 1]
            w2 = min(e[u] - e[l], e[u + 1] - e[l + 1])
            w3 = max(e[u] - e[l], e[u + 1] - e[l + 1])
            w4 = e[u + 1] - e[l]
            if ef[0] > w4 or ef[-1] < w1:
                continue
            tmp = np.zeros(nfreq)
            coeff = 1.0 / (eu - el) / (FACTOR * PLANCK)

            i = 1
            while i < nfreq - 1 and ef[i] < w1:
                i += 1
            i = max(i - 1, 0)

            def hat_add(i, a, b, g1, g2):
                alpha = (a - ef[i]) / (ef[i + 1] - ef[i])
                beta = (b - ef[i]) / (ef[i + 1] - ef[i])
                tmp[i] += 0.5 * (b - a) * (g1 * a * (1 - alpha)
                                           + g2 * b * (1 - beta)) * coeff
                tmp[i + 1] += 0.5 * (b - a) * (g1 * a * alpha
                                               + g2 * b * beta) * coeff

            # rising flank [W1, W2]: G = (E - W1)/dEl
            a = np.clip(w1, ef[i], ef[i + 1])
            b = np.clip(w2, a, ef[i + 1])
            g1 = (a - w1) / d_el
            g2 = (b - w1) / d_el
            hat_add(i, a, b, g1, g2)
            if b < w2:
                i += 1
            while i < nfreq - 1 and b < w2:
                a, g1 = b, g2
                b = min(w2, ef[i + 1])
                g2 = (b - w1) / d_el
                hat_add(i, a, b, g1, g2)
                if b < w2:
                    i += 1
            # plateau [W2, W3]: G = min(dEl, dEu)/dEl
            while i < nfreq - 1 and b < w3:
                a, g1 = b, g2
                b = min(w3, ef[i + 1])
                g2 = min(d_el, d_eu) / d_el
                hat_add(i, a, b, g1, g2)
                if b < w3:
                    i += 1
            # falling flank [W3, W4]: G evaluated at the segment midpoint
            while i < nfreq - 1 and b < w4:
                a, g1 = b, g2
                b = min(w4, ef[i + 1])
                g2 = (w4 - 0.5 * (a + b)) / d_el
                hat_add(i, a, b, g1, g2)
                if b < w4:
                    i += 1
            # intrabin term for the nearest-neighbour transition
            if u == l + 1:
                i = 0
                b = ef[0]
                while i < nfreq - 1 and ef[i] < d_el:
                    a = b
                    b = np.clip(d_el, a, ef[i + 1])
                    g1 = 1.0 - a / d_el
                    g2 = 1.0 - b / d_el
                    hat_add(i, a, b, g1, g2)
                    i += 1

            nz = np.nonzero(tmp > 0.0)[0]
            if len(nz) == 0:
                continue
            first, last = int(nz[0]), int(nz[-1])
            l1[l, u] = first
            l2[l, u] = last
            stream.append(tmp[first:last + 1].astype(np.float32))

    iw = (np.concatenate(stream) if stream else np.zeros(0, np.float32))
    return iw, l1, l2


def prepare_emission_array(freq, skabs_int, e, ne, dust=None, isize=None):
    """EA[NFREQ, NE] and Ibeg[NFREQ] (A2E_pre.py:268-290)."""
    freq = np.asarray(freq, np.float64)
    ef = PLANCK * freq
    nfreq = len(freq)
    ec = 0.5 * (e[:ne] + e[1:ne + 1])
    if dust is not None:
        tc = dust.e2t(isize, ec)
    else:
        tc = np.interp(ec, e, np.linspace(1, 100, ne + 1))
    # B_nu(T)/(h nu) photon intensity
    ea = np.zeros((nfreq, ne))
    for i in range(ne):
        x = np.clip(PLANCK * freq / (BOLTZMANN * tc[i]), 1e-10, 700)
        bnu = 2.0 * PLANCK * (freq / C_LIGHT) ** 2 * freq / np.expm1(x)
        ea[:, i] = skabs_int * bnu / (PLANCK * freq)
    ea *= FACTOR * 4.0 * np.pi
    ibeg = np.zeros(nfreq, np.int32)
    for ifr in range(nfreq):
        start = 1
        while (0.5 * (e[start - 1] + e[start]) < ef[ifr]
               and start < ne):
            start += 1
        ibeg[ifr] = start
    return ea.astype(np.float32), ibeg


def build_solver(dust, freq, ne=256):
    """Full A2E_pre: GSETDust + frequency grid -> SolverData."""
    freq = np.asarray(freq, np.float64)
    nfreq = len(freq)
    nsize = dust.nsize
    sk_abs = np.zeros((nsize, nfreq))
    for s in range(nsize):
        sk_abs[s] = dust.skabs_int(s, freq)
    sizes = []
    for s in range(nsize):
        t, e = energy_grid(dust, s, ne)
        skabs_grain = sk_abs[s] / (dust.s_frac[s] * dust.grain_density)
        iw, l1, l2 = prepare_weights_trapezoid(freq, e, ne)
        tdown = prepare_tdown(freq, skabs_grain, e, t, ne)
        ea, ibeg = prepare_emission_array(freq, sk_abs[s], e, ne,
                                          dust=dust, isize=s)
        sizes.append(SizeData(iw=iw, l1=l1, l2=l2, tdown=tdown, ea=ea,
                              ibeg=ibeg))
    return SolverData(freq=freq.astype(np.float32),
                      grain_density=dust.grain_density,
                      size_a=dust.size_a.astype(np.float32),
                      s_frac=dust.s_frac.astype(np.float32),
                      ne=ne, sk_abs=sk_abs.astype(np.float32), sizes=sizes)
