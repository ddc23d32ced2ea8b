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
    """A2E_pre stage: build <dust>.solver for every stochastic dust."""
    stoch, _ = classify_dusts(cfg)
    solvers = {}
    for path in stoch:
        out = os.path.splitext(path)[0] + ".solver"
        if force or not os.path.exists(out):
            dust = read_gset_dust(path)
            sol = solver_prep.build_solver(dust, cfg.freq, ne=ne)
            write_solver(out, sol)
            solvers[path] = sol
        else:
            solvers[path] = read_solver(out)
    return solvers


def run_pipeline(ini_path, lanes=driver.DEFAULT_LANES, ne=128):
    """ASOC_driver equivalent: absorptions -> emission -> maps."""
    workdir = os.path.dirname(os.path.abspath(ini_path))
    orig = os.getcwd()
    os.chdir(workdir)
    try:
        return _run_pipeline_inner(ini_path, lanes, ne)
    finally:
        os.chdir(orig)


def _run_pipeline_inner(ini_path, lanes, ne):
    cfg = RunConfig(ini_path).validate()

    # Stage 1: absorption run (nosolve; all frequencies tallied).
    cfg_rt = copy.deepcopy(cfg)
    cfg_rt.nosolve = True
    cfg_rt.noabsorbed = False
    cfg_rt.nomap = True
    # stochastic dusts cannot be read as simple dust files by the RT stage:
    # the RT needs combined optical properties, which for gset dusts come
    # from the solver-file cross sections
    res_rt = driver.run(cfg=cfg_rt, lanes=lanes, workdir=".")
    absorbed = res_rt.absorbed
    cells = res_rt.grid.cells
    freq = res_rt.freq
    cfg.freq = freq

    # Stage 2: A2E_pre + A2E_MABU emission.
    stoch, simple = classify_dusts(cfg)
    solvers = prepare_solver_files(cfg, ne=ne)
    comps = []
    for path in stoch:
        sol = solvers[path]
        comps.append(mabu.DustComponent(
            name=os.path.basename(path), kind="gset",
            kabs=sol.k_abs, solver=sol))
    for path in simple:
        opt = read_simple_dust(path, cfg.gl)
        comps.append(mabu.DustComponent(
            name=os.path.basename(path), kind="eqdust",
            kabs=np.asarray(opt.abs_gl, np.float64) / (cfg.gl * PARSEC),
            freq=freq))
    abu = None
    if cfg.file_abundance:
        abu = np.ones((cells, len(comps)), np.float32)
        for d, path in enumerate(cfg.file_abundance):
            if path and not path.startswith("#"):
                abu[:, d] = np.fromfile(path, np.float32, cells)
    # the absorbed file payload has parent cells marked -1e20: mask them
    valid = absorbed[:, 0] > -1e19
    abs_clean = np.where(valid[:, None], absorbed, 0.0).astype(np.float32)
    emitted = mabu.solve_emission_multi(comps, abs_clean, abu)
    emitted[~valid] = 0.0
    write_cell_frequency_array(cfg.file_emitted, emitted)

    # Stage 3: map run from the emitted file.
    cfg_map = copy.deepcopy(cfg)
    cfg_map.iterations = 0
    cfg_map.nosolve = True
    res_map = driver.run(cfg=cfg_map, lanes=lanes, workdir=".")
    return res_rt, emitted, res_map
