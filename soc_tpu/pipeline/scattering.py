"""Scattered-light pipeline (the ASOCS.py workload).

Per selected frequency: simulate packets from the background / point
sources with forced first scattering and peel-off toward every observer;
accumulate OUT[NDIR, NY, NX] and write the reference's outcoming.socs
container: int32 [NY, NX, NFREQ] + float32 FFREQ header, then float32
[NFREQ, NDIR, NY, NX] (ASOCS.py:385-397).
"""

import os
import time

import numpy as np
import jax.numpy as jnp

from ..config import RunConfig
from ..constants import PLANCK
from ..io.cloud import read_cloud
from ..io.dust import read_simple_dust, read_scattering_function
from ..io.fields import read_background_intensity
from ..render import mapping as render_mapping
from ..render.scattered import simulate_scattering
from ..transport import sources as src
from ..transport.medium import medium_from_optics
from ..utils.cache import enable_compile_cache


def run(ini_path=None, cfg=None, write_files=True, workdir=None,
        nlanes=1 << 14):
    enable_compile_cache()
    if cfg is None:
        cfg = RunConfig(ini_path)
    if workdir is None:
        workdir = os.path.dirname(os.path.abspath(ini_path)) if ini_path \
            else "."
    orig = os.getcwd()
    os.chdir(workdir)
    try:
        return _run_inner(cfg, write_files, nlanes)
    finally:
        os.chdir(orig)


def _run_inner(cfg, write_files, nlanes):
    cfg.validate()
    grid = read_cloud(cfg.file_cloud, cfg.kdensity, cfg.max_levels)
    optics = [read_simple_dust(f, cfg.gl) for f in cfg.file_optical]
    freq = optics[0].freq
    cfg.freq = freq
    nfreq = len(freq)
    bins = cfg.dsc_bins if cfg.dsc_bins > 0 else 2500
    dsc, csc = read_scattering_function(cfg.file_scafunc[0], nfreq, bins)
    medium = medium_from_optics(optics, dsc, csc, freq)
    seed = np.uint32(max(0.0, cfg.seed) * 2**31) + np.uint32(77777)

    ndir = len(cfg.obs_theta)
    nxp, nyp = cfg.npix
    odirs = np.zeros((ndir, 3), np.float32)
    ras = np.zeros((ndir, 3), np.float32)
    des = np.zeros((ndir, 3), np.float32)
    for i in range(ndir):
        odirs[i], ras[i], des[i] = render_mapping.observer_basis(
            cfg.obs_theta[i], cfg.obs_phi[i])
    centre = cfg.mapcentre
    if centre[0] < -1e7:
        centre = (0.5 * grid.nx, 0.5 * grid.ny, 0.5 * grid.nz)

    area = int(grid.area)
    outcoming = np.zeros((nfreq, ndir, nyp, nxp), np.float32)
    ibg = None
    if cfg.bgpac > 0 and cfg.file_background:
        ibg = read_background_intensity(cfg.file_background, nfreq) \
            * cfg.scale_background
    lps = None
    if cfg.no_ps > 0 and cfg.pspac > 0:
        lps = np.zeros((cfg.no_ps, nfreq), np.float32)
        for i, f in enumerate(cfg.file_pointsource):
            lps[i] = np.fromfile(f, np.float32, nfreq) * cfg.ps_scale[i]

    sim_lo, sim_hi = cfg.sim_f
    for ifreq in range(nfreq):
        if not (sim_lo <= freq[ifreq] <= sim_hi):
            continue
        physics = dict(kabs=medium.abs_gl[ifreq], ksca=medium.sca_gl[ifreq],
                       csc=medium.csc[ifreq], dsc=medium.dsc[ifreq],
                       tw=medium.tw[ifreq])
        if ibg is not None:
            batch = max(1, int(round(cfg.bgpac / (8.0 * area))))
            per_freq = 8 * area * batch
            wbg = np.pi / (PLANCK * 8.0 * batch)
            bg_photons = np.float32(ibg[ifreq] * wbg / freq[ifreq])
            params = dict(photons=jnp.float32(bg_photons),
                          ifreq=jnp.int32(ifreq),
                          per_freq=jnp.int32(per_freq),
                          hi_base=jnp.uint32(src.stream_hi_base("sca_bg")))
            out = simulate_scattering(
                grid, physics, params, per_freq, odirs, ras, des, centre,
                cfg.map_dx, (nxp, nyp), seed + ifreq, source_kind="bg",
                nlanes=nlanes, ffs=cfg.ffs > 0)
            outcoming[ifreq] += out
        if lps is not None:
            from ..constants import PARSEC
            pspac = max(1, cfg.pspac)
            wps = 1.0 / (PLANCK * pspac * (cfg.gl * PARSEC) ** 2)
            ps_photons = (lps[:, ifreq] * wps / freq[ifreq]).astype(
                np.float32)
            params = dict(ps_pos=jnp.asarray(cfg.ps_pos, jnp.float32),
                          photons=jnp.asarray(ps_photons),
                          ifreq=jnp.int32(ifreq),
                          per_freq=jnp.int32(pspac * cfg.no_ps),
                          hi_base=jnp.uint32(src.stream_hi_base("sca_ps")))
            out = simulate_scattering(
                grid, physics, params, pspac * cfg.no_ps, odirs, ras, des,
                centre, cfg.map_dx, (nxp, nyp), seed + ifreq,
                source_kind="ps", nlanes=nlanes, ffs=cfg.ffs > 0)
            outcoming[ifreq] += out

    if write_files:
        with open("outcoming.socs", "wb") as fp:
            np.asarray([nyp, nxp, nfreq], np.int32).tofile(fp)
            np.asarray(freq, np.float32).tofile(fp)
            outcoming.tofile(fp)
    return outcoming
