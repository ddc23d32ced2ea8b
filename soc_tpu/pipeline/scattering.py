"""Scattered-light pipeline (the ASOCS.py workload).

Per selected frequency, simulate packets from every configured source with
peel-off toward the observers and accumulate OUT:

  * isotropic background   (SimRAM_PB II==1, kernel_ASOC_sca.c:471)
  * healpix-sky background (SimRAM_HP, kernel_ASOC_sca.c:40)
  * point sources          (SimRAM_PS, kernel_ASOC_sca.c:1462)
  * dust cell emission     (SimRAM_CL, kernel_ASOC_sca.c:1098; reads the
    emitted file, EMIT = EMITTED * 1e-20*GL*PARSEC/8^level * DENS,
    ASOCS.py:790-795)
  * diffuse volume field   (same kernel, EMIT = DIFFUSERAD * GL*PARSEC /
    8^level * K_DIFFUSE, ASOCS.py:640-650)

With `perspective x y z` (+ optional `outnside N`) the output is an
all-sky healpix map around the internal observer (NDIR<0 mode,
ASOCS.py:43-49); otherwise OUT[NDIR, NY, NX] orthographic maps.

Output container `outcoming.socs` (ASOCS.py:385-402):
  flat maps: int32 [NY, NX, NFREQ] + float32 FFREQ + [NFREQ, NDIR, NY, NX]
  healpix  : int32 [NSIDE, NFREQ]  + float32 FFREQ + [NFREQ, 12*NSIDE^2]
Values are scaled to surface brightness with k = FREQ*1e23*PLANCK/(DX^2)
(healpix: / pixel solid angle) -- ASOCS.py:873-884.

Multiple dusts get WITH_MSF treatment: per-species CSC sampling and
abundance-weighted per-dust DSC peel-off.
"""

import os

import numpy as np
import jax.numpy as jnp

from ..config import RunConfig
from ..constants import PARSEC, PLANCK
from ..io.cloud import read_cloud
from ..io.dust import read_simple_dust, read_scattering_function
from ..io.fields import read_background_intensity
from ..render import mapping as render_mapping
from ..render.scattered import simulate_scattering
from ..transport import sources as src
from ..transport.medium import medium_from_optics
from ..utils.cache import enable_compile_cache


def _hpbg_projected_area(grid, npix):
    """Per-pixel A_proj(dir) / (AREA/4): the cloud's projected area toward
    each healpix pixel, normalized by the isotropic mean (<|cos|> = 1/2
    per face makes the mean of A_proj over the sphere equal AREA/4)."""
    from ..render import healpix as hp
    nside = int(np.sqrt(npix // 12))
    theta, phi = hp.pix2ang_ring(nside, jnp.arange(npix))
    theta = np.asarray(theta)
    phi = np.asarray(phi)
    st = np.sin(theta)
    d = np.stack([st * np.cos(phi), st * np.sin(phi), np.cos(theta)], -1)
    aproj = (np.abs(d[:, 0]) * grid.ny * grid.nz
             + np.abs(d[:, 1]) * grid.nx * grid.nz
             + np.abs(d[:, 2]) * grid.nx * grid.ny)
    return aproj / (grid.area / 4.0)


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
    ndust = len(optics)
    if not cfg.file_scafunc:
        raise ValueError("scattered-light run needs a `dsc` file in the ini")
    dscs, cscs = [], []
    for path in cfg.file_scafunc:
        d, c = read_scattering_function(path, nfreq, bins)
        dscs.append(d)
        cscs.append(c)
    medium = medium_from_optics(optics, dscs[0], cscs[0], freq)
    seed = np.uint32(max(0.0, cfg.seed) * 2**31) + np.uint32(77777)

    # WITH_MSF: one scattering function per dust + abundances
    msf = None
    if ndust > 1 and len(dscs) == ndust:
        abu = np.ones((grid.cells, ndust), np.float32) / ndust
        for d, path in enumerate(cfg.file_abundance[:ndust]):
            if path and not path.startswith("#"):
                abu[:, d] = np.fromfile(path, np.float32, grid.cells)
        msf = dict(abu=jnp.asarray(abu),
                   dscs=np.stack(dscs), cscs=np.stack(cscs),
                   sca=np.stack([np.asarray(o.sca_gl) for o in optics]))

    ndir = len(cfg.obs_theta)
    nxp, nyp = cfg.npix
    healpix_nside = 0
    obs_pos = None
    if cfg.intobs[0] > -1e7:
        # internal observer -> all-sky healpix output
        healpix_nside = int(cfg.keys.get("outnside", [[128]])[0][0])
        obs_pos = cfg.intobs
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
    if healpix_nside > 0:
        outcoming = np.zeros((nfreq, 12 * healpix_nside ** 2), np.float32)
    else:
        outcoming = np.zeros((nfreq, ndir, nyp, nxp), np.float32)
    ibg = None
    if cfg.bgpac > 0 and cfg.file_background:
        ibg = read_background_intensity(cfg.file_background, nfreq) \
            * cfg.scale_background
    hpbg = None
    if cfg.bgpac > 0 and cfg.file_hpbg:
        hpbg = np.fromfile(cfg.file_hpbg, np.float32).reshape(nfreq, -1) \
            * cfg.scale_background
    lps = None
    if cfg.no_ps > 0 and cfg.pspac > 0:
        lps = np.zeros((cfg.no_ps, nfreq), np.float32)
        for i, f in enumerate(cfg.file_pointsource):
            lps[i] = np.fromfile(f, np.float32, nfreq) * cfg.ps_scale[i]
    emitted = None
    if cfg.clpac > 0:
        if not os.path.exists(cfg.file_emitted):
            # the reference crashes on the missing memmap (ASOCS.py:790);
            # silently dropping the dust-emission source would mask a
            # misconfigured run
            raise FileNotFoundError(
                "scattering: cellpackets %d but the emitted file %r does "
                "not exist (run the rt/emission stage first, or set "
                "cellpackets 0)" % (cfg.clpac, cfg.file_emitted))
        from ..io.fields import read_cell_frequency_array
        emitted = read_cell_frequency_array(cfg.file_emitted)
        if emitted.shape[1] != nfreq:
            from .driver import remit_mask_of
            full = np.zeros((emitted.shape[0], nfreq), np.float32)
            full[:, remit_mask_of(cfg, freq)] = emitted
            emitted = full
    diffuserad = None
    if cfg.file_diffuse and (cfg.dfpac > 0 or cfg.clpac > 0):
        from .driver import read_diffuse_field
        diffuserad = read_diffuse_field(cfg.file_diffuse, grid.cells)
    roi_load = None
    if cfg.file_roi_load and cfg.roipac > 0:
        # ROI boundary source in the scattering run (ASOCS.py II==3)
        from ..transport.roi import read_roi_file
        rnx, rny, rnz, rl_nside, rl_data = read_roi_file(cfg.file_roi_load)
        rl_npix = 12 * rl_nside * rl_nside
        rl_nelem = rl_data.shape[1] // rl_npix
        roi_load = (rnx, rny, rnz, rl_nelem, rl_npix, rl_data)

    from ..solve.equilibrium import cell_levels
    lev = np.asarray(cell_levels(grid))
    dens = np.asarray(grid.dens)

    n_dev = int(getattr(cfg, "n_devices", 0))
    if n_dev:
        import jax
        if n_dev < 0:
            n_dev = len(jax.devices())
        if n_dev > len(jax.devices()):
            raise ValueError("devices %d: only %d visible"
                             % (n_dev, len(jax.devices())))

    def sim(physics, params, total, kind, ffs):
        if n_dev > 1:
            # `devices N`: the budget splits over a flat dp mesh with the
            # product-path id scheme; one psum of the map per channel
            from ..render.scattered import simulate_scattering_sharded
            return simulate_scattering_sharded(
                n_dev, grid, physics, params, total, odirs, ras, des,
                centre, cfg.map_dx, (nxp, nyp), seed, source_kind=kind,
                nlanes=nlanes, ffs=ffs, healpix_nside=healpix_nside,
                obs_pos=obs_pos)
        return simulate_scattering(
            grid, physics, params, total, odirs, ras, des, centre,
            cfg.map_dx, (nxp, nyp), seed, source_kind=kind,
            nlanes=nlanes, ffs=ffs, healpix_nside=healpix_nside,
            obs_pos=obs_pos)

    sim_lo, sim_hi = cfg.sim_f
    _hp_aproj = None
    for ifreq in range(nfreq):
        if not (sim_lo <= freq[ifreq] <= sim_hi):
            continue
        physics = dict(kabs=medium.abs_gl[ifreq], ksca=medium.sca_gl[ifreq],
                       csc=medium.csc[ifreq], dsc=medium.dsc[ifreq],
                       tw=medium.tw[ifreq])
        if msf is not None:
            physics.update(
                msf_csc=jnp.asarray(msf["cscs"][:, ifreq]),
                msf_dsc=jnp.asarray(msf["dscs"][:, ifreq]),
                msf_abu=msf["abu"],
                msf_sca=jnp.asarray(msf["sca"][:, ifreq]))
        if ibg is not None:
            batch = max(1, int(round(cfg.bgpac / (8.0 * area))))
            per_freq = 8 * area * batch
            wbg = np.pi / (PLANCK * 8.0 * batch)
            params = dict(photons=jnp.float32(ibg[ifreq] * wbg
                                              / freq[ifreq]),
                          ifreq=jnp.int32(ifreq),
                          per_freq=jnp.int32(per_freq),
                          hi_base=jnp.uint32(src.stream_hi_base("sca_bg")))
            outcoming[ifreq] += sim(physics, params, per_freq, "bg",
                                    cfg.ffs > 0)
        if hpbg is not None:
            per_freq = max(1, int(cfg.bgpac))
            wbg = np.pi * area / (PLANCK * per_freq)
            vals = (np.asarray(hpbg[ifreq], np.float64)
                    * (wbg / freq[ifreq]))
            # per-pixel projected-area factor A_proj(dir)/(AREA/4): the
            # face-entry sampler launches equal packet counts per pixel,
            # but the power a parallel beam delivers scales with the
            # cloud's projected area toward that pixel. This reproduces
            # the reference's bounding-sphere launch (ASOCS.py:472-474,
            # WBG = pi*4*pi*Rout^2 with misses dying on the Surface step)
            # exactly in expectation, without wasting the missed packets.
            if _hp_aproj is None:
                _hp_aproj = _hpbg_projected_area(grid, hpbg.shape[1])
            vals = vals * _hp_aproj
            params = dict(hpbg=jnp.asarray(vals.astype(np.float32)),
                          cdf=None,
                          ifreq=jnp.int32(ifreq),
                          per_freq=jnp.int32(per_freq),
                          hi_base=jnp.uint32(src.stream_hi_base("sca_hpbg")))
            outcoming[ifreq] += sim(physics, params, per_freq, "hpbg",
                                    cfg.ffs > 0)
        if lps is not None:
            pspac = max(1, cfg.pspac)
            wps = 1.0 / (PLANCK * pspac * (cfg.gl * PARSEC) ** 2)
            ps_photons = (lps[:, ifreq] * wps / freq[ifreq]).astype(
                np.float32)
            params = dict(ps_pos=jnp.asarray(cfg.ps_pos, jnp.float32),
                          photons=jnp.asarray(ps_photons),
                          ifreq=jnp.int32(ifreq),
                          per_freq=jnp.int32(pspac * cfg.no_ps),
                          hi_base=jnp.uint32(src.stream_hi_base("sca_ps")))
            outcoming[ifreq] += sim(physics, params, pspac * cfg.no_ps,
                                    "ps", cfg.ffs > 0)
        if emitted is not None:
            #  EMIT = EMITTED * 1e-20 * GL*PARSEC/8^level * DENS
            #  (ASOCS.py:790-795; 1e-20 removes the FACTOR scaling)
            per_cell = max(1, int(cfg.clpac) // grid.cells)
            emit = (np.asarray(emitted[:, ifreq], np.float64)
                    * (1.0e-20 * cfg.gl * PARSEC / 8.0 ** lev) * dens)
            emit[dens < 1e-10] = 0.0
            params = dict(emit=jnp.asarray((emit / per_cell)
                                           .astype(np.float32)),
                          per_cell=jnp.int32(per_cell),
                          ifreq=jnp.int32(ifreq),
                          per_freq=jnp.int32(per_cell * grid.cells),
                          hi_base=jnp.uint32(src.stream_hi_base("sca_cell")))
            outcoming[ifreq] += sim(physics, params, per_cell * grid.cells,
                                    "cell", cfg.ffs > 0)
        if roi_load is not None:
            rnx, rny, rnz, rl_nelem, rl_npix, rl_data = roi_load
            reps = max(1, int(cfg.roipac) // (rl_nelem * rl_npix))
            load = (np.asarray(rl_data[ifreq], np.float64)
                    * cfg.roi_load_scale).reshape(rl_nelem, rl_npix)
            params = dict(roi_load=jnp.asarray(load.astype(np.float32)),
                          roi_dim=(rnx, rny, rnz),
                          reps=jnp.int32(reps),
                          ifreq=jnp.int32(ifreq),
                          per_freq=jnp.int32(reps * rl_nelem * rl_npix),
                          hi_base=jnp.uint32(src.stream_hi_base("roi")))
            outcoming[ifreq] += sim(physics, params,
                                    reps * rl_nelem * rl_npix, "roi",
                                    cfg.ffs > 0)
        if diffuserad is not None:
            dfpac = cfg.dfpac if cfg.dfpac > 0 else cfg.clpac
            per_cell = max(1, int(dfpac) // grid.cells)
            dr_ind = ifreq + (diffuserad.shape[1] - nfreq)
            if dr_ind >= 0:
                emit = (np.asarray(diffuserad[:, dr_ind], np.float64)
                        * (cfg.k_diffuse * cfg.gl * PARSEC / 8.0 ** lev))
                emit[dens < 1e-10] = 0.0
                params = dict(emit=jnp.asarray((emit / per_cell)
                                               .astype(np.float32)),
                              per_cell=jnp.int32(per_cell),
                              ifreq=jnp.int32(ifreq),
                              per_freq=jnp.int32(per_cell * grid.cells),
                              hi_base=jnp.uint32(
                                  src.stream_hi_base("diffuse")))
                outcoming[ifreq] += sim(physics, params,
                                        per_cell * grid.cells, "cell",
                                        cfg.ffs > 0)

    # final surface-brightness scaling (ASOCS.py:873-884)
    for ifreq in range(nfreq):
        if healpix_nside > 0:
            k = freq[ifreq] * 1.0e23 * PLANCK \
                / (4.0 * np.pi / (12.0 * healpix_nside ** 2))
        else:
            k = freq[ifreq] * 1.0e23 * PLANCK / (cfg.map_dx ** 2)
        outcoming[ifreq] *= k

    if write_files:
        if cfg.fits > 0 and healpix_nside <= 0 and ndir == 1:
            # single-direction FITS image cube instead of the binary
            # container (ASOCS.py:387-392, 892: '<file_scattering>.fits')
            from ..io.fits import write_fits_image
            # the reference substitutes 1 kpc when DISTANCE is unset
            # (ASOCS.py:885-889)
            pix_deg = np.degrees(cfg.map_dx * cfg.gl
                                 / (cfg.distance if cfg.distance > 0
                                    else 1000.0))
            write_fits_image("%s.fits" % cfg.file_scattering,
                             outcoming[:, 0], ra_deg=cfg.fits_ra,
                             de_deg=cfg.fits_de, pix_deg=pix_deg)
        else:
            with open("outcoming.socs", "wb") as fp:
                if healpix_nside > 0:
                    np.asarray([healpix_nside, nfreq], np.int32).tofile(fp)
                else:
                    np.asarray([nyp, nxp, nfreq], np.int32).tofile(fp)
                np.asarray(freq, np.float32).tofile(fp)
                outcoming.tofile(fp)
    return outcoming


