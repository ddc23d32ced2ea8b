"""Full pipeline automation (the ASOC_driver.py workload).

Chains: solver-file generation (A2E_pre) for stochastic dusts -> absorption
run (simulation with nosolve, per-frequency tallies) -> multi-dust emission
(A2E_MABU) -> map run. The reference chains these via os.system over
binary files (ASOC_driver.py:224-473); here they are in-process function
calls, with the reference's intermediate files still written so any stage
can be re-run or inspected.
"""

import copy
import os

import numpy as np

from ..config import RunConfig
from ..io.dust import read_simple_dust
from ..io.fields import read_cell_frequency_array, write_cell_frequency_array
from ..solve import solver_prep
from ..solve.grain_model import read_gset_dust
from ..solve.solver_file import read_solver, write_solver
from ..constants import PARSEC
from . import driver, mabu


def dust_kind(path):
    """First non-comment header token of a dust file: 'eqdust' (simple) or
    'gsetdust' (stochastic GSET container). Mirrors the reference's header
    dispatch (ASOC_driver.py:96-132, ASOC_aux.py:559-575) instead of
    substring heuristics."""
    with open(path) as fp:
        for line in fp:
            tok = line.split("#")[0].strip()
            if tok:
                return tok.split()[0]
    raise ValueError("empty dust file: %s" % path)


def classify_dusts(cfg):
    """gset dusts (stochastic) vs simple eqdust files."""
    stochastic, simple = [], []
    for path in cfg.file_optical:
        kind = dust_kind(path)
        if kind == "gsetdust":
            stochastic.append(path)
        elif kind == "eqdust":
            simple.append(path)
        else:
            raise ValueError("unknown dust header %r in %s" % (kind, path))
    return stochastic, simple


def prepare_solver_files(cfg, ne=128, force=False):
    """A2E_pre stage: build <dust>.solver for every stochastic dust.

    An existing solver file is reused only if it matches the requested
    frequency grid and enthalpy-bin count -- a stale file from an earlier
    run with a different freq.dat or `nenumber` is rebuilt, not silently
    solved on the wrong axes."""
    ne = cfg.ne_number or ne      # ini `nenumber` wins for every caller
    solvers = {}
    stoch, _ = classify_dusts(cfg)
    for path in stoch:
        out = os.path.splitext(path)[0] + ".solver"
        sol = None
        if not force and os.path.exists(out):
            sol = read_solver(out)
            stale = (sol.ne != ne or sol.nfreq != len(cfg.freq)
                     or not np.allclose(sol.freq, cfg.freq, rtol=1e-5))
            if stale:
                sol = None
        if sol is None:
            dust = read_gset_dust(path)
            sol = solver_prep.build_solver(dust, cfg.freq, ne=ne)
            write_solver(out, sol)
        solvers[path] = sol
    return solvers


def build_components(cfg, freq, ne=128):
    """DustComponent list (stochastic solvers + simple eqdusts) for the
    A2E_MABU stage."""
    stoch, simple = classify_dusts(cfg)
    solvers = prepare_solver_files(cfg, ne=ne) if stoch else {}
    comps = []
    for path in stoch:
        sol = solvers[path]
        comps.append(mabu.DustComponent(
            name=os.path.splitext(os.path.basename(path))[0], kind="gset",
            kabs=sol.k_abs, solver=sol))
    for path in simple:
        opt = read_simple_dust(path, cfg.gl)
        comps.append(mabu.DustComponent(
            name=os.path.splitext(os.path.basename(path))[0], kind="eqdust",
            kabs=np.asarray(opt.abs_gl, np.float64) / (cfg.gl * PARSEC),
            freq=freq))
    return comps


def read_abundances(cfg, cells, ndust):
    if not cfg.file_abundance:
        return None
    abu = np.ones((cells, ndust), np.float32)
    for d, path in enumerate(cfg.file_abundance):
        if path and not path.startswith("#"):
            abu[:, d] = np.fromfile(path, np.float32, cells)
    return abu


def _nearest_indices(freq, values_um):
    from ..constants import um2f
    return [int(np.argmin(np.abs(np.asarray(freq) - um2f(u))))
            for u in values_um]


def _rpol_factor(name, freq, aalg):
    """R(aalg[cell], freq): fraction of the cross section in aligned
    grains a >= aalg, from the <dust>.rpol table (A2E_MABU.py:615-637 --
    log-frequency interpolation between columns, then size interpolation
    at each cell's aalg with zero fill outside the size grid)."""
    tab = np.loadtxt("%s.rpol" % name)
    apol, fpol, rpol = tab[1:, 0], tab[0, 1:], tab[1:, 1:]
    lf = np.log(fpol)
    out = np.zeros((len(aalg), len(freq)), np.float32)
    for k, f in enumerate(np.asarray(freq, np.float64)):
        i = int(np.argmin(np.abs(fpol - f)))
        if fpol[i] > f:
            i = max(i - 1, 0)
        j = min(i + 1, len(fpol) - 1)
        wj = 0.0 if i == j else (np.log(f) - lf[i]) / (lf[j] - lf[i])
        col = (1.0 - wj) * rpol[:, i] + wj * rpol[:, j]
        out[:, k] = np.interp(aalg, apol, col, left=0.0, right=0.0)
    return out


def pol_specs(cfg, comps, freq, cells):
    """Per-component polarised-emission specs from the `polarisation`
    keyword (cfg.aalg: dust name -> per-cell a_alg file written by RAT
    alignment tools; A2E_MABU.py:158-167)."""
    if not cfg.aalg:
        return None
    pol = {}
    for d, comp in enumerate(comps):
        f_aalg = cfg.aalg.get(comp.name)
        if f_aalg is None:
            continue
        # aalg file = one leading count value + CELLS float32
        # (A2E_MABU.py:636 fromfile(...)[1:])
        aalg = np.fromfile(f_aalg, np.float32)[1:][:cells]
        if comp.kind == "gset":
            pol[d] = ("aalg", aalg)
        else:
            pol[d] = ("rfactor", _rpol_factor(comp.name, freq, aalg))
    return pol or None


def emission_stage(cfg, comps, absorbed, abu, freq, ne=128, dens=None):
    """A2E_MABU stage with the library / NN surrogate variants
    (ASOC_driver.py:91-133 nnmake/nnsolve; A2E_MABU.py:1017-1068 NN paths;
    A2E_LIB solve_with_library_2).

    absorbed : [CELLS, NF_ABS] cleaned payload (parents zeroed). For
    nnsolve/uselib runs NF_ABS may be the reduced nnabs/FSELECT set.
    Returns (EMITTED [CELLS, NFREQ], PEMITTED or None) -- nnsolve fills
    only the nnemit columns; PEMITTED is the polarised emission when the
    `polarisation` keyword names any dust (surrogate paths: None).
    """
    from ..solve import nn as nnmod
    from ..solve import library as libmod
    cells = absorbed.shape[0]
    nfreq = len(freq)

    if cfg.nn_solve:
        # NN-only emission: per-dust surrogates, summed with abundances
        emitted = np.zeros((cells, nfreq), np.float32)
        iabs = _nearest_indices(freq, cfg.nn_abs) if cfg.nn_abs else None
        iemit = _nearest_indices(freq, cfg.nn_emit) \
            if cfg.nn_emit else list(range(nfreq))
        x = absorbed if iabs is None or absorbed.shape[1] != nfreq \
            else absorbed[:, iabs]
        for d, comp in enumerate(comps):
            model = nnmod.nn_load("%s_%s.nn" % (cfg.nn_solve, comp.name))
            y = nnmod.nn_solve(model, x)
            w = abu[:, d][:, None] if abu is not None else 1.0
            emitted[:, iemit] += y * w
        return emitted, None

    if cfg.file_library and os.path.exists(cfg.file_library):
        # uselib: absorbed holds the FSELECT reference frequencies
        lib = libmod.load_library(cfg.file_library)
        nref = len(lib["ref_indices"])
        if absorbed.shape[1] == nfreq:
            absorbed = absorbed[:, lib["ref_indices"]]
        elif absorbed.shape[1] != nref:
            raise ValueError("library expects %d reference freqs, "
                             "absorbed has %d" % (nref, absorbed.shape[1]))
        lib_direct = dict(lib)
        lib_direct["ref_indices"] = list(range(absorbed.shape[1]))
        return libmod.solve_with_library(lib_direct, absorbed), None

    pol = pol_specs(cfg, comps, freq, cells)
    out = mabu.solve_emission_multi(
        comps, absorbed, abu, return_components=True,
        cr_mode=int(cfg.cr_heating), dens=dens, pol=pol)
    (emitted, per_dust), pemitted = out[:2], out[2] if pol else None

    if cfg.nn_make:
        # train per-dust surrogates on this solve's (absorbed, emitted)
        # pairs; nnthin subsamples training cells (A2E_MABU nnthin)
        iabs = _nearest_indices(freq, cfg.nn_abs) if cfg.nn_abs \
            else list(range(nfreq))
        iemit = _nearest_indices(freq, cfg.nn_emit) if cfg.nn_emit \
            else list(range(nfreq))
        thin = max(1, cfg.nn_thin)
        for comp, (absd, emit_d) in zip(comps, per_dust):
            model = nnmod.nn_fit(absd[::thin][:, iabs],
                                 emit_d[::thin][:, iemit],
                                 hidden=cfg.nn_net)
            nnmod.nn_save("%s_%s.nn" % (cfg.nn_make, comp.name), model)
    return emitted, pemitted


def run_pipeline(ini_path, lanes=driver.DEFAULT_LANES, ne=128, mode=None):
    """ASOC_driver equivalent: absorptions -> emission -> maps.

    mode: None (plain chain), 'makelib' (full solve + build the binned
    emission library), or 'uselib' (simulate only the FSELECT reference
    frequencies, answer emission from the library) --
    ASOC_driver.py:11-21 CLI modes.
    """
    workdir = os.path.dirname(os.path.abspath(ini_path))
    orig = os.getcwd()
    os.chdir(workdir)
    try:
        return _run_pipeline_inner(ini_path, lanes, ne, mode)
    finally:
        os.chdir(orig)


def _simple_dust_substitutes(cfg):
    """RT/map stages need simple-dust optics: swap every gset dust for its
    <name>_simple.dust (ASOC_driver.py:240-245, 'gs_' prefix dropped),
    generating the file from the gset Q tables if it does not exist yet
    (the reference requires a separate DustLib step for this)."""
    stoch_paths, _ = classify_dusts(cfg)
    if not stoch_paths:
        return list(cfg.file_optical)
    from ..solve.grain_model import gset_effective_optics, read_gset_dust
    from ..io.dust import write_simple_dust
    rt_optical = []
    for path in cfg.file_optical:
        if path not in stoch_paths:
            rt_optical.append(path)
            continue
        d, b = os.path.split(os.path.splitext(path)[0])
        if b.startswith("gs_"):
            b = b[3:]
        simp = os.path.join(d, b + "_simple.dust")
        if not os.path.exists(simp):
            gset = read_gset_dust(path)
            freq_rt = np.asarray(gset.qfreq)
            for p2 in cfg.file_optical:     # prefer an eqdust grid
                if p2 not in stoch_paths:
                    freq_rt = read_simple_dust(p2, cfg.gl).freq
                    break
            write_simple_dust(
                simp, gset_effective_optics(gset, freq_rt, cfg.gl), cfg.gl)
        rt_optical.append(simp)
    return rt_optical


def _run_pipeline_inner(ini_path, lanes, ne, mode):
    from ..solve import library as libmod
    cfg = RunConfig(ini_path).validate()
    # ini `nenumber` overrides the caller's enthalpy-grid size
    # (ASOC_driver.py:93,220: A2E_pre.py ... nenumber)
    ne = cfg.ne_number or ne

    # Stage 1: absorption run (nosolve; all frequencies tallied).
    cfg_rt = copy.deepcopy(cfg)
    cfg_rt.nosolve = True
    cfg_rt.noabsorbed = False
    cfg_rt.nomap = True
    # the RT stage needs simple-dust optics: swap every gset dust for its
    # <name>_simple.dust (ASOC_driver.py:240-245, 'gs_' prefix dropped),
    # generating the file from the gset Q tables if it does not exist yet
    # (the reference requires a separate DustLib step for this)
    rt_optical = _simple_dust_substitutes(cfg)
    cfg_rt.file_optical = rt_optical
    if mode == "uselib":
        cfg_rt.lib_abs = True
        if not cfg_rt.fselect:
            # peek at the frequency grid to pick default reference freqs
            opt0 = read_simple_dust(cfg.file_optical[0], cfg.gl) \
                if dust_kind(cfg.file_optical[0]) == "eqdust" else None
            freq0 = opt0.freq if opt0 is not None else None
            if freq0 is None:
                from ..solve.grain_model import read_gset_dust
                freq0 = np.asarray(read_gset_dust(cfg.file_optical[0]).qfreq)
            idx = libmod.choose_reference_frequencies(freq0)
            cfg_rt.fselect = [float(freq0[i]) for i in idx]
            cfg.fselect = cfg_rt.fselect
    # stochastic dusts cannot be read as simple dust files by the RT stage:
    # the RT needs combined optical properties, which for gset dusts come
    # from the solver-file cross sections
    res_rt = driver.run(cfg=cfg_rt, lanes=lanes, workdir=".")
    absorbed = res_rt.absorbed
    cells = res_rt.grid.cells
    freq = res_rt.freq
    cfg.freq = freq

    # Stage 2: A2E_pre + A2E_MABU emission (or library/NN variants).
    comps = build_components(cfg, freq, ne=ne)
    abu = read_abundances(cfg, cells, len(comps))
    # the absorbed file payload has parent cells marked -1e20: mask them
    valid = absorbed[:, 0] > -1e19
    abs_clean = np.where(valid[:, None], absorbed, 0.0).astype(np.float32)
    if mode == "uselib" and not cfg.file_library:
        cfg.file_library = os.path.splitext(cfg.file_optical[0])[0] + ".lib"
    if mode == "makelib":
        cfg.file_library = ""      # makelib must solve for real, not lookup
    if cfg.abs_thin > 1:
        # absthin: only every n:th cell was saved for training purposes
        # (ASOC.py absthin); solve those and leave the rest zero
        abs_clean = abs_clean[::cfg.abs_thin]
    dens_full = np.asarray(res_rt.grid.dens)
    emitted_part, pemitted_part = emission_stage(
        cfg, comps, abs_clean,
        abu[::cfg.abs_thin] if abu is not None
        and cfg.abs_thin > 1 else abu, freq, ne=ne,
        dens=dens_full[::cfg.abs_thin]
        if cfg.abs_thin > 1 else dens_full)

    def _expand(part):
        if cfg.abs_thin > 1:
            out = np.zeros((cells, len(freq)), np.float32)
            out[::cfg.abs_thin] = part
        else:
            out = part
        out[~valid] = 0.0
        return out

    emitted = _expand(emitted_part)
    write_cell_frequency_array(cfg.file_emitted, emitted)
    if pemitted_part is not None:
        # polarised emission of the aligned dusts -> <emitted>.P
        # (A2E_MABU.py:589, 651-656)
        write_cell_frequency_array(cfg.file_emitted + ".P",
                                   _expand(pemitted_part))

    if mode == "makelib":
        # build the binned lookup library from this full solve
        ref_idx = [int(np.argmin(np.abs(freq - fv))) for fv in cfg.fselect] \
            if cfg.fselect else libmod.choose_reference_frequencies(freq)
        lib = libmod.build_library(abs_clean, emitted_part, ref_idx)
        out = cfg.file_library or \
            os.path.splitext(cfg.file_optical[0])[0] + ".lib"
        libmod.save_library(out, lib)

    # Stage 3: map run from the emitted file.
    cfg_map = copy.deepcopy(cfg)
    cfg_map.file_optical = rt_optical
    cfg_map.iterations = 0
    cfg_map.nosolve = True
    res_map = driver.run(cfg=cfg_map, lanes=lanes, workdir=".")
    return res_rt, emitted, res_map
