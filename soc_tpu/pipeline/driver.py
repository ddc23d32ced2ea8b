"""End-to-end emission radiative-transfer pipeline (the ASOC.py equivalent).

Phases (call stack mirrors SURVEY.md section 3.1, but as in-process function
calls over device arrays instead of kernel launches + host staging):
  1. constant sources: background + point sources, all frequencies batched
     into mixed-frequency packet chunks -> CTABS (+ per-frequency FABSORBED)
  2. iterations: dust re-emission packets (when cellpackets > 0), equilibrium
     temperature solve, thermal emission
  3. maps: frequency-fused orthographic LOS integration -> map_dir_XX.bin

Outputs keep the reference's binary formats so downstream tooling
(plot_results.py etc.) works unchanged.
"""

import os
import time
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..config import RunConfig
from ..constants import FACTOR, PARSEC, PLANCK
from ..grid import Grid
from ..io.cloud import read_cloud, write_cell_field
from ..io.dust import read_simple_dust, read_scattering_function
from ..io.fields import (read_background_intensity,
                         write_cell_frequency_array, write_map_file)
from ..solve import equilibrium
from ..transport.medium import medium_from_optics
from ..transport.propagate import transport_run
from ..render import mapping as render_mapping
from ..utils.cache import enable_compile_cache

DEFAULT_LANES = 1 << 17


@dataclass
class RunResult:
    grid: Grid = None
    freq: np.ndarray = None
    ctabs: np.ndarray = None            # integrated constant-source heating
    absorbed: np.ndarray = None         # [CELLS, NFREQ] (file scaling applied)
    temperature: np.ndarray = None      # [CELLS]
    emitted: np.ndarray = None          # [CELLS, NFREQ]
    maps: dict = field(default_factory=dict)       # idir -> [NF, NY, NX]
    tau_maps: dict = field(default_factory=dict)
    escaped: np.ndarray = None          # [NFREQ] photons that left the volume
    injected: np.ndarray = None         # [NFREQ] photons injected
    timings: dict = field(default_factory=dict)


def _pool_lanes(nlanes, per_freq):
    """Lane-pool size: at most the per-frequency budget, power-of-two,
    >= 1024 (static per run, so one compile covers all frequencies)."""
    n = min(nlanes, max(1024, per_freq))
    return 1 << (n - 1).bit_length() if n & (n - 1) else n


def _run_over_freqs(grid, medium, kind, make_params, per_freq, tabs, intf,
                    seed, nlanes, per_freq_tally, phase=None, iteration=0,
                    mirror_mask=0):
    """Run one transport pass per frequency (uniform-frequency fast path:
    scalar cross sections, [BINS] CSC row -- all frequencies share one
    compiled executable)."""
    import sys
    from ..transport.sources import stream_hi_base
    progress = os.environ.get("SOC_TPU_PROGRESS", "0") != "0"
    nfreq = medium.nfreq
    hi_base = stream_hi_base(phase or kind, iteration)
    esc_list, abs_list = [], []
    t_loop = time.time()
    for ifreq in range(nfreq):
        if progress:
            print("  [%s] freq %d/%d  t=%.1fs" %
                  (kind, ifreq + 1, nfreq, time.time() - t_loop),
                  file=sys.stderr, flush=True)
        physics = dict(kabs=medium.abs_gl[ifreq], ksca=medium.sca_gl[ifreq],
                       csc=medium.csc[ifreq], tw=medium.tw[ifreq])
        params = make_params(ifreq)
        params["ifreq"] = jnp.int32(ifreq)
        params["per_freq"] = jnp.int32(per_freq)
        params["hi_base"] = jnp.uint32(hi_base)
        tabs, intf, esc, absd = transport_run(
            grid, physics, params, jnp.int32(per_freq), tabs, intf, seed,
            source_kind=kind, nlanes=_pool_lanes(nlanes, per_freq),
            per_freq_tally=per_freq_tally,
            mirror_mask=mirror_mask)
        esc_list.append(esc)
        abs_list.append(absd)
    escaped = np.asarray([float(e[0]) for e in esc_list])
    absorbed = np.asarray([float(a) for a in abs_list])
    return tabs, intf, escaped, absorbed


def simulate_background(grid, medium, cfg, ibg, tabs, intf, seed,
                        lanes=DEFAULT_LANES, per_freq_tally=False,
                        mixed=True, chunk=4 << 20):
    """Phase-1 isotropic background over all frequencies.

    Packet budget: the reference sends 8*AREA*BATCH packets per frequency
    (ASOC.py:1060-1063); we keep that exact normalization so tallies match.

    mixed=True runs one pool over ALL frequencies (packets tagged by
    channel): the drain tail is paid once instead of NFREQ times -- measured
    2.1x faster than the per-frequency loop on the soc_example workload.
    Work is chunked (default 4M packets/call) to stay under the device
    watchdog for long single executions.
    Returns (tabs, intf, escaped[NF], injected[NF]).
    """
    area = int(grid.area)
    batch = max(1, int(round(cfg.bgpac / (8.0 * area))))
    per_freq = 8 * area * batch                 # packets per frequency
    wbg = np.pi / (PLANCK * 8.0 * batch)
    bg_photons = (np.asarray(ibg, np.float64) * wbg
                  / np.asarray(cfg.freq, np.float64)).astype(np.float32)

    from ..transport.sources import stream_hi_base
    if mixed:
        nfreq = medium.nfreq
        physics = dict(kabs=medium.abs_gl, ksca=medium.sca_gl,
                       csc=medium.csc, tw=medium.tw)
        bg = jnp.asarray(bg_photons)
        total = per_freq * nfreq            # Python int: may exceed 2^31
        nlanes = _pool_lanes(lanes, total if total < (1 << 31) else chunk)
        escaped = jnp.zeros(nfreq, jnp.float32)
        for off in range(0, total, chunk):
            n = min(chunk, total - off)
            # chunk origin split host-side into (frequency, in-freq index):
            # all device id math stays 32-bit no matter how large `total` is
            params = dict(photons=bg, ifreq=None,
                          per_freq=jnp.int32(per_freq),
                          ifreq0=jnp.int32(off // per_freq),
                          k0=jnp.uint32(off % per_freq),
                          hi_base=jnp.uint32(stream_hi_base("bg")))
            tabs, intf, esc, absd = transport_run(
                grid, physics, params, jnp.int32(n), tabs, intf, seed,
                source_kind="bg", nlanes=nlanes,
                per_freq_tally=per_freq_tally, esc_bins=nfreq,
                mirror_mask=mirror_mask_of(cfg))
            escaped = escaped + esc
        escaped = np.asarray(escaped)
    else:
        def make_params(ifreq):
            return dict(photons=jnp.float32(bg_photons[ifreq]))

        tabs, intf, escaped, absorbed = _run_over_freqs(
            grid, medium, "bg", make_params, per_freq, tabs, intf, seed,
            lanes, per_freq_tally, mirror_mask=mirror_mask_of(cfg))
    injected = np.float64(per_freq) * np.asarray(bg_photons, np.float64)
    return tabs, intf, escaped, injected


def simulate_hpbg(grid, medium, cfg, hpbg, tabs, intf, seed,
                  lanes=DEFAULT_LANES, per_freq_tally=False, weighted=False):
    """Phase-1 Healpix-sky background (SimRAM_HP equivalent).

    hpbg : [NFREQ, NPIX] sky intensities; photons per packet =
    (pi*AREA/(PLANCK*BGPAC)) / freq * HPBG[pix] (ASOC.py:1050-1063), with
    optional per-pixel importance weighting (HPBG_WEIGHTED).
    Returns (tabs, intf, escaped[NF], injected[NF]).
    """
    area = grid.area
    per_freq = max(1, int(cfg.bgpac))
    wbg = np.pi * area / (PLANCK * per_freq)
    nfreq = medium.nfreq
    freq = np.asarray(cfg.freq, np.float64)
    injected = np.zeros(nfreq)

    def make_params(ifreq):
        vals = np.asarray(hpbg[ifreq], np.float64) * (wbg / freq[ifreq])
        npx = len(vals)
        if weighted:
            p = vals / max(vals.mean(), 1e-300)
            p = np.clip(p, 1e-3, 1e4)
            p /= p.sum()
            w = (1.0 / npx) / p                  # packet weight correction
            cdf = np.cumsum(p)
            cdf[-1] = 1.00001
            injected[ifreq] = np.sum(p * (vals * w))
            return dict(hpbg=jnp.asarray((vals * w).astype(np.float32)),
                        cdf=jnp.asarray(cdf.astype(np.float32)))
        injected[ifreq] = vals.mean()
        return dict(hpbg=jnp.asarray(vals.astype(np.float32)), cdf=None)

    tabs, intf, escaped, absorbed = _run_over_freqs(
        grid, medium, "hpbg", make_params, per_freq, tabs, intf, seed,
        lanes, per_freq_tally)
    return tabs, intf, escaped, injected * per_freq


def simulate_point_sources(grid, medium, cfg, lps, tabs, intf, seed,
                           lanes=DEFAULT_LANES, per_freq_tally=False):
    """Phase-1 point sources (internal positions)."""
    if cfg.no_ps < 1 or cfg.pspac < 1:
        return tabs, intf, np.zeros(medium.nfreq), 0.0
    pspac = max(1, cfg.pspac)
    wps = 1.0 / (PLANCK * pspac * (cfg.gl * PARSEC) ** 2)
    freq = np.asarray(cfg.freq, np.float64)
    ps_photons = (np.asarray(lps, np.float64) * wps
                  / freq[None, :]).astype(np.float32)    # [NO_PS, NFREQ]
    ps_pos = jnp.asarray(np.asarray(cfg.ps_pos, np.float32))
    per_freq = pspac * cfg.no_ps

    extra = {}
    if cfg.ps_method == 2:
        from ..transport.sources import analyse_external_point_sources
        nside, side, area = analyse_external_point_sources(grid, cfg.ps_pos)
        extra = dict(xps_nside=jnp.asarray(nside),
                     xps_side=jnp.asarray(side),
                     xps_area=jnp.asarray(area))
    elif cfg.ps_method == 1:
        extra = dict(halfspace=jnp.int32(1))

    def make_params(ifreq):
        return dict(ps_pos=ps_pos,
                    photons=jnp.asarray(ps_photons[:, ifreq]), **extra)

    tabs, intf, escaped, absorbed = _run_over_freqs(
        grid, medium, "ps", make_params, per_freq, tabs, intf, seed,
        lanes, per_freq_tally)
    injected = np.sum(np.asarray(ps_photons, np.float64), axis=0) * pspac
    return tabs, intf, escaped, injected


def emweight_allocation(emit_col, clpac, lims=(0.0, 1e10), rng=None):
    """Emission-weighted packets-per-cell with Russian roulette
    (ASOC.py:1276-1298 EMWEI semantics). Returns (cell_of_id, weight[CELLS],
    total_packets): weight = 1/count for count >= 1 cells; roulette cells
    get one packet of weight 1/EMWEI with probability EMWEI.
    """
    emit_col = np.asarray(emit_col, np.float64)
    cells = len(emit_col)
    wei = clpac * emit_col / max(emit_col.sum(), 1e-32)
    wei = np.clip(wei, lims[0], lims[1])
    counts = np.floor(wei).astype(np.int64)
    frac = wei < 1.0
    if rng is None:
        rng = np.random.default_rng(1234)
    survive = frac & (rng.random(cells) < wei)
    counts = np.where(frac, survive.astype(np.int64), np.maximum(counts, 1))
    counts = np.where(wei <= 0.0, 0, counts)
    weight = np.zeros(cells, np.float64)
    m = counts > 0
    weight[m & ~frac] = 1.0 / counts[m & ~frac]
    weight[m & frac] = 1.0 / np.maximum(wei[m & frac], 1e-30)
    cell_of_id = np.repeat(np.arange(cells, dtype=np.int32), counts)
    return cell_of_id, weight.astype(np.float32), len(cell_of_id)


def simulate_cell_emission(grid, medium, cfg, emitted, tabs, intf, seed,
                           lanes=DEFAULT_LANES, per_freq_tally=False,
                           iteration=0):
    """Phase-2 dust re-emission (SimRAM_CL equivalent).

    emitted : [CELLS, NFREQ] photons/Hz/H per cell. Uniform allocation:
    packets per cell = max(1, CLPAC//CELLS), photon weight =
    EMIT[cell]/packets_per_cell. With cfg.use_emweight > 0 the per-cell
    packet count follows the cell's share of total emission (Russian
    roulette below one packet).
    """
    from ..transport.sources import stream_hi_base
    emitted_np = np.asarray(emitted)
    emitted = jnp.asarray(emitted)
    hi_base = stream_hi_base("cell", iteration)

    if cfg.use_emweight > 0:
        # allocation varies per frequency => per-frequency pools with a
        # host-built id->cell map. The roulette RNG is counter-based
        # (Philox keyed by (seed, iteration)) so allocations are
        # reproducible across runs; the lane-pool size is keyed to CLPAC
        # (not the realized total) so ONE executable covers all frequencies.
        rng = np.random.Generator(np.random.Philox(
            key=np.uint64([int(seed) & 0xFFFFFFFF, iteration])))
        nlanes = _pool_lanes(lanes, int(cfg.clpac))
        escaped = np.zeros(medium.nfreq)
        for ifreq in range(medium.nfreq):
            cell_of_id, weight, total = emweight_allocation(
                emitted_np[:, ifreq], int(cfg.clpac),
                lims=cfg.emweight_lim[:2], rng=rng)
            if total == 0:
                continue
            physics = dict(kabs=medium.abs_gl[ifreq],
                           ksca=medium.sca_gl[ifreq],
                           csc=medium.csc[ifreq], tw=medium.tw[ifreq])
            # pad the id->cell map to a static shape (extra ids are never
            # generated: total_packets caps the refill)
            pad = _pool_lanes(1 << 30, total)
            com = np.full(pad, grid.cells - 1, np.int32)
            com[:total] = cell_of_id
            params = dict(emit=emitted[:, ifreq] * jnp.asarray(weight),
                          cell_of_id=jnp.asarray(com),
                          ifreq=jnp.int32(ifreq),
                          per_freq=jnp.int32(pad),
                          hi_base=jnp.uint32(hi_base))
            tabs, intf, esc, absd = transport_run(
                grid, physics, params, jnp.int32(total), tabs, intf,
                seed, source_kind="cell", nlanes=nlanes,
                per_freq_tally=per_freq_tally)
            escaped[ifreq] = float(esc[0])
        return tabs, intf, escaped, None

    per_cell = max(1, int(cfg.clpac) // grid.cells)
    per_freq = per_cell * grid.cells

    if cfg.with_ali:
        # per-frequency loop with XAB self-absorption tally (ALI)
        xab = jnp.zeros(grid.cells, jnp.float32)
        escaped = np.zeros(medium.nfreq)
        for ifreq in range(medium.nfreq):
            physics = dict(kabs=medium.abs_gl[ifreq],
                           ksca=medium.sca_gl[ifreq],
                           csc=medium.csc[ifreq], tw=medium.tw[ifreq])
            params = dict(emit=emitted[:, ifreq] / np.float32(per_cell),
                          per_cell=jnp.int32(per_cell),
                          ifreq=jnp.int32(ifreq),
                          per_freq=jnp.int32(per_freq),
                          hi_base=jnp.uint32(hi_base))
            tabs, intf, esc, absd, xab = transport_run(
                grid, physics, params, jnp.int32(per_freq), tabs, intf,
                seed, source_kind="cell",
                nlanes=_pool_lanes(lanes, per_freq),
                per_freq_tally=per_freq_tally, with_ali=True, xab=xab)
            escaped[ifreq] = float(esc[0])
        return tabs, intf, escaped, np.asarray(xab)

    def make_params(ifreq):
        return dict(emit=emitted[:, ifreq] / np.float32(per_cell),
                    per_cell=jnp.int32(per_cell))

    tabs, intf, escaped, absorbed = _run_over_freqs(
        grid, medium, "cell", make_params, per_freq, tabs, intf, seed,
        lanes, per_freq_tally, iteration=iteration)
    return tabs, intf, escaped, None


def run(ini_path=None, cfg=None, lanes=DEFAULT_LANES, write_files=True,
        workdir=None):
    """Full pipeline; returns RunResult. workdir defaults to the ini dir."""
    enable_compile_cache()
    t_start = time.time()
    if cfg is None:
        cfg = RunConfig(ini_path)
    if workdir is None:
        workdir = os.path.dirname(os.path.abspath(ini_path)) if ini_path else "."
    orig = os.getcwd()
    os.chdir(workdir)
    try:
        return _run_inner(cfg, lanes, write_files, t_start)
    finally:
        os.chdir(orig)


def mirror_mask_of(cfg):
    """'mirror xXyYzZ' keyword -> 6-bit mask (ASOC.py:321-324)."""
    m = 0
    for bit, ch in enumerate("xXyYzZ"):
        if ch in cfg.mirror:
            m |= 1 << bit
    return m


def _run_inner(cfg, lanes, write_files, t_start):
    cfg.validate()
    res = RunResult()
    timings = res.timings

    # ---- model input
    t0 = time.time()
    grid = read_cloud(cfg.file_cloud, cfg.kdensity, cfg.max_levels)
    optics = [read_simple_dust(f, cfg.gl) for f in cfg.file_optical]
    freq = optics[0].freq
    cfg.freq = freq
    cfg.nfreq = len(freq)
    nfreq = len(freq)
    bins = cfg.dsc_bins if cfg.dsc_bins > 0 else 2500
    dsc, csc = read_scattering_function(cfg.file_scafunc[0], nfreq, bins)
    medium = medium_from_optics(optics, dsc, csc, freq)
    res.grid, res.freq = grid, freq
    seed = np.uint32(max(0.0, cfg.seed) * 2**31) + np.uint32(12345)
    timings["input"] = time.time() - t0

    # ---- map-only mode (reference: iterations 0 + existing emitted file;
    # ASOC.py:744-769): skip simulation/solve, render maps from the file
    if cfg.iterations < 1 and os.path.exists(cfg.file_emitted):
        from ..io.fields import read_cell_frequency_array
        res.emitted = read_cell_frequency_array(cfg.file_emitted)
        res.ctabs = np.zeros(grid.cells, np.float32)
        res.escaped = np.zeros(nfreq)
        res.injected = np.zeros(nfreq)
        _render_phase(cfg, grid, medium, res, freq, res.emitted,
                      write_files, timings)
        timings["total"] = time.time() - t_start
        return res

    # ---- phase 1: constant sources
    t0 = time.time()
    per_freq_tally = not cfg.noabsorbed
    tabs = jnp.zeros(grid.cells, jnp.float32)
    intf = jnp.zeros((grid.cells, nfreq) if per_freq_tally else (1, 1),
                     jnp.float32)
    injected = np.zeros(nfreq)
    escaped = np.zeros(nfreq)
    if cfg.bgpac > 0 and cfg.file_background:
        ibg = read_background_intensity(cfg.file_background, nfreq)
        ibg = ibg * cfg.scale_background
        tabs, intf, esc, inj = simulate_background(
            grid, medium, cfg, ibg, tabs, intf, seed, lanes, per_freq_tally)
        escaped += np.asarray(esc)
        injected += inj
    if cfg.bgpac > 0 and cfg.file_hpbg:
        hpbg = np.fromfile(cfg.file_hpbg, np.float32).reshape(nfreq, -1)
        hpbg = hpbg * cfg.scale_background
        tabs, intf, esc, inj = simulate_hpbg(
            grid, medium, cfg, hpbg, tabs, intf, seed + 3, lanes,
            per_freq_tally, weighted=cfg.has_key("hpbgw"))
        escaped += np.asarray(esc)
        injected += inj
    if cfg.no_ps > 0 and cfg.pspac > 0:
        lps = np.zeros((cfg.no_ps, nfreq), np.float32)
        for i, f in enumerate(cfg.file_pointsource):
            lps[i] = np.fromfile(f, np.float32, nfreq) * cfg.ps_scale[i]
        tabs, intf, esc, inj = simulate_point_sources(
            grid, medium, cfg, lps, tabs, intf, seed, lanes, per_freq_tally)
        escaped += np.asarray(esc)
        injected += inj
    ctabs = tabs
    res.ctabs = np.asarray(ctabs)
    res.escaped = escaped
    res.injected = injected
    timings["constant_sources"] = time.time() - t0

    # ---- phase 2: iterations (T solve + emission, optional self-heating)
    t0 = time.time()
    gl_cm = cfg.gl * PARSEC
    temperature = None
    emitted = None
    if not cfg.nosolve:
        table = equilibrium.build_temperature_table(freq, optics[0].abs_gl,
                                                    cfg.gl)
    # WITH_REFERENCE control variate: simulate only the CHANGE in emission
    # between iterations and carry the previous tally (ASOC.py:1599-1633,
    # 1975-1985) -- negative packet weights propagate through the linear
    # tally math unchanged.
    oemitted = None
    otabs = None
    if not cfg.nosolve:
        emit_total = ctabs
        for iteration in range(max(1, cfg.iterations)):
            beta = 1.0
            if cfg.clpac > 0 and emitted is not None:
                if cfg.with_reference and oemitted is not None:
                    sim_emit = jnp.asarray(emitted) - oemitted
                else:
                    sim_emit = emitted
                tabs_it = jnp.zeros(grid.cells, jnp.float32)
                tabs_it, intf, _, xab = simulate_cell_emission(
                    grid, medium, cfg, sim_emit, tabs_it, intf,
                    seed, lanes, per_freq_tally, iteration=iteration)
                if cfg.with_reference and oemitted is not None:
                    tabs_it = tabs_it + otabs
                if cfg.with_reference:
                    otabs = tabs_it
                    oemitted = jnp.asarray(emitted)
                emit_total = tabs_it + ctabs
                if cfg.with_ali and xab is not None:
                    # escape probability beta = (XEM - XAB)/XEM per cell
                    tw = np.asarray(medium.tw, np.float64)
                    xem = (np.asarray(emitted, np.float64) @ tw)
                    beta_np = np.clip(
                        (xem - xab) / np.maximum(xem, 1e-30), 1e-2, 1.0)
                    beta_np[xem <= 0] = 1.0
                    beta = jnp.asarray(beta_np.astype(np.float32))
            temperature = equilibrium.solve_temperature(
                grid, table, emit_total, gl_cm, beta=beta,
                cr_heating=cfg.cr_heating)
            emitted = equilibrium.emission(freq, optics[0].abs_gl,
                                           temperature, gl_cm)
            if cfg.clpac <= 0:
                break   # nothing changes between iterations without CLPAC
        res.temperature = np.asarray(temperature)
        res.emitted = np.asarray(emitted)
    timings["solve"] = time.time() - t0

    # ---- intensity output for DustEM coupling (SAVE_INTENSITY==1,
    # ASOC.py:1496-1505): I[cell,f] = (PLANCK*FREQ/ABS_f)*8^level*INT/DENS,
    # written as ISRF.DAT [CELLS, NFREQ]
    if per_freq_tally and cfg.has_key("saveint"):
        lev = np.asarray(equilibrium.cell_levels(grid))
        dens = np.asarray(grid.dens)
        absf = np.asarray(medium.abs_gl, np.float64)
        coeff = (PLANCK * np.asarray(freq, np.float64)[None, :]
                 / np.maximum(absf, 1e-300)[None, :]
                 * (8.0 ** lev)[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            intensity = (coeff * np.asarray(intf)
                         / np.maximum(dens, 1e-35)[:, None])
        intensity[dens <= 0.0] = 0.0
        if write_files:
            path = cfg.keys.get("saveint", [[None]])[0]
            fname = path[1] if path and len(path) > 1 else "ISRF.DAT"
            write_cell_frequency_array(fname, intensity.astype(np.float32))

    # ---- absorbed-file output (reference end-of-run scaling)
    if per_freq_tally:
        lev = np.asarray(equilibrium.cell_levels(grid))
        dens = np.asarray(grid.dens)
        fabs = np.asarray(intf)
        coeff = (8.0 ** lev) * (FACTOR / gl_cm)
        with np.errstate(divide="ignore", invalid="ignore"):
            fabs = fabs * (coeff / np.maximum(dens, 1e-35))[:, None]
        fabs[dens <= 0.0] = -1.0e20          # parent cells marked
        res.absorbed = fabs
        if write_files and cfg.file_absorbed:
            write_cell_frequency_array(cfg.file_absorbed, fabs)

    if write_files and temperature is not None and cfg.file_temperature:
        write_cell_field(cfg.file_temperature, grid, res.temperature)
    if write_files and emitted is not None and cfg.file_emitted:
        write_cell_frequency_array(cfg.file_emitted, res.emitted)

    _render_phase(cfg, grid, medium, res, freq, res.emitted, write_files,
                  timings)
    timings["total"] = time.time() - t_start
    return res


def _render_phase(cfg, grid, medium, res, freq, emitted, write_files,
                  timings):
    """Phase 3: orthographic frequency-fused maps + polarization maps."""
    t0 = time.time()
    if not cfg.nomap and emitted is not None:
        centre = cfg.mapcentre
        if centre[0] < -1e7:
            centre = (0.5 * grid.nx, 0.5 * grid.ny, 0.5 * grid.nz)
        kk = render_mapping.map_scale_kk(cfg.gl)
        emit_map = jnp.asarray(
            (np.asarray(emitted, np.float64)
             * (kk * freq)[None, :]).astype(np.float32))
        ext_gl = jnp.asarray(np.asarray(medium.abs_gl) +
                             np.asarray(medium.sca_gl))
        if cfg.npix[1] <= 0:
            # all-sky Healpix map around the internal observer
            # (NPIX.x == NSIDE; reference writes headerless map.healpix)
            intobs = cfg.intobs if cfg.intobs[0] > -1e7 else centre
            phot, tau, colden = render_mapping.render_healpix(
                grid, emit_map, ext_gl, intobs, int(cfg.npix[0]))
            res.maps[0] = np.asarray(phot)
            res.tau_maps[0] = np.asarray(tau)
            if write_files:
                res.maps[0].astype(np.float32).tofile("map.healpix")
        elif cfg.intobs[0] > -1e7:
            # perspective panorama from inside the model
            phot, tau, colden = render_mapping.render_perspective(
                grid, emit_map, ext_gl, cfg.intobs, tuple(cfg.npix))
            res.maps[0] = np.asarray(phot)
            res.tau_maps[0] = np.asarray(tau)
            if write_files:
                write_map_file("map_dir_00.bin", res.maps[0])
        else:
            for idir in range(len(cfg.obs_theta)):
                odir, ra, de = render_mapping.observer_basis(
                    cfg.obs_theta[idir], cfg.obs_phi[idir])
                phot, tau, colden = render_mapping.render_ortho(
                    grid, emit_map, ext_gl, jnp.asarray(odir),
                    jnp.asarray(ra), jnp.asarray(de), centre, cfg.map_dx,
                    tuple(cfg.npix))
                res.maps[idir] = np.asarray(phot)
                res.tau_maps[idir] = np.asarray(tau)
                if write_files:
                    write_map_file("map_dir_%02d.bin" % idir, res.maps[idir])
                    if cfg.fits > 0:
                        from ..io.fits import write_fits_image
                        pix_deg = None
                        if cfg.distance > 0:
                            pix_deg = np.degrees(
                                cfg.gl * cfg.map_dx / cfg.distance)
                        write_fits_image("map_dir_%02d.fits" % idir,
                                         res.maps[idir], pix_deg=pix_deg)

    # ---- polarization maps (I, Q, U, N), reference PolMapping
    if cfg.polmap > 0 and emitted is not None and len(cfg.b_files) == 3:
        from ..io.cloud import read_hierarchy
        from ..render.polarization import render_pol
        bvec = []
        for bf in cfg.b_files:
            _, _, _, _, vals = read_hierarchy(bf)
            bvec.append(np.concatenate(vals))
        bfield = jnp.asarray(np.stack(bvec, -1).astype(np.float32))
        centre = cfg.mapcentre
        if centre[0] < -1e7:
            centre = (0.5 * grid.nx, 0.5 * grid.ny, 0.5 * grid.nz)
        kk = render_mapping.map_scale_kk(cfg.gl)
        emit_map = jnp.asarray((np.asarray(emitted, np.float64)
                                * (kk * freq)[None, :]).astype(np.float32))
        ext_gl = jnp.asarray(np.asarray(medium.abs_gl)
                             + np.asarray(medium.sca_gl))
        polred = len(cfg.file_polred) > 0
        for idir in range(len(cfg.obs_theta)):
            odir, ra, de = render_mapping.observer_basis(
                cfg.obs_theta[idir], cfg.obs_phi[idir])
            s_i, s_q, s_u, colden = render_pol(
                grid, emit_map, ext_gl, bfield, cfg.p0, jnp.asarray(odir),
                jnp.asarray(ra), jnp.asarray(de), centre, cfg.map_dx,
                tuple(cfg.npix), polred=polred,
                rho_weight=False)
            res.maps[("pol", idir)] = (np.asarray(s_i), np.asarray(s_q),
                                       np.asarray(s_u), np.asarray(colden))
            if write_files:
                # binary fallback of the reference's polmap FITS output:
                # [4, NF, NY, NX] float32 = I, Q, U, N(broadcast)
                nf = len(freq)
                colden_cm = np.asarray(colden) * cfg.gl * PARSEC
                stack = np.stack([np.asarray(s_i), np.asarray(s_q),
                                  np.asarray(s_u),
                                  np.broadcast_to(colden_cm[None],
                                                  (nf,) + colden.shape)])
                stack.astype(np.float32).tofile("polmap_dir_%02d.bin" % idir)
    timings["maps"] = time.time() - t0

