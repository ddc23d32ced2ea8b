#!/usr/bin/env python
"""Benchmark: the reference soc_example workload on real TPU hardware.

Reports every BASELINE.md metric:
  * bg transport packets/s (headline; baseline 4.7e5 pkt/s from the
    reference's ~2.5 s / 1e6-packet frequency iteration, ASOC.py:1176-1177)
  * speed-of-light fraction: achieved packet rate vs the pure-traversal
    stepping bound (march_path_lengths on the same cloud/entries)
  * A2E stochastic solve cells/s (baseline 7006 cells/s @ BATCH 8192,
    A2E.py:90)
  * orthographic map render time (64^3 cloud, 44 freqs, 512x512)
  * full-pipeline wall time on the soc_example config
  * octree-refined transport pkt/s (BASELINE config 2) and scattered-light
    peel-off pkt/s (config 4)

Transport/SoL are best-of-3 against the shared-tunnel run-to-run variance.
Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "detail"}.
"""

import json
import os
import sys
import time
import zipfile

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
REFERENCE_PACKETS_PER_SEC = 4.7e5
REFERENCE_A2E_CELLS_PER_SEC = 7006.0


def prepare_workdir(workdir):
    os.makedirs(workdir, exist_ok=True)
    with zipfile.ZipFile("/root/reference/soc_example.zip") as z:
        for name in ("my.ini", "tmp.dust", "tmp.dsc", "bg_intensity.bin",
                     "freq.dat"):
            z.extract(name, workdir)
    # generate the cloud exactly like the example's make_cloud.py
    n = 64
    with open(os.path.join(workdir, "tmp.cloud"), "wb") as fp:
        np.asarray([n, n, n, 1, n**3], np.int32).tofile(fp)
        np.asarray([n**3], np.int32).tofile(fp)
        np.ones(n**3, np.float32).tofile(fp)
    return os.path.join(workdir, "my.ini")


def bench_transport(workdir, lanes, repeats=3):
    """Best-of-N phase-1 background transport throughput."""
    import jax.numpy as jnp
    from soc_tpu.config import RunConfig
    from soc_tpu.io.cloud import read_cloud
    from soc_tpu.io.dust import read_simple_dust, read_scattering_function
    from soc_tpu.io.fields import read_background_intensity
    from soc_tpu.pipeline import driver
    from soc_tpu.transport.medium import medium_from_optics

    cfg = RunConfig(os.path.join(workdir, "my.ini"))
    orig = os.getcwd()
    os.chdir(workdir)
    try:
        grid = read_cloud(cfg.file_cloud, cfg.kdensity, cfg.max_levels)
        optics = [read_simple_dust(f, cfg.gl) for f in cfg.file_optical]
        freq = optics[0].freq
        cfg.freq = freq
        nfreq = len(freq)
        dsc, csc = read_scattering_function(cfg.file_scafunc[0], nfreq,
                                            2500)
        medium = medium_from_optics(optics, dsc, csc, freq)
        ibg = read_background_intensity(cfg.file_background, nfreq)

        area = int(grid.area)
        batch = max(1, int(round(cfg.bgpac / (8.0 * area))))
        per_freq = 8 * area * batch
        total_packets = per_freq * nfreq

        best = None
        times = []
        for rep in range(repeats):
            tabs = jnp.zeros(grid.cells, jnp.float32)
            intf = jnp.zeros((1, 1), jnp.float32)
            t0 = time.time()
            tabs, intf, esc, inj = driver.simulate_background(
                grid, medium, cfg, ibg, tabs, intf,
                np.uint32(12345 + rep), lanes=lanes,
                per_freq_tally=False)
            # forced readback: block_until_ready alone can return early on
            # the tunnelled backend (measured), a transfer cannot
            tabs_np = np.asarray(tabs)
            dt = time.time() - t0
            times.append(dt)
            closure = abs((inj - np.asarray(esc)).sum() / inj.sum())
            sane = bool(np.isfinite(tabs_np).all() and 0 < closure < 1)
            if best is None or dt < best[0]:
                best = (dt, sane)
        return dict(packets=total_packets, times=[round(t, 2) for t in times],
                    best_s=round(best[0], 2),
                    pps=total_packets / best[0], sane=best[1],
                    grid=grid, medium=medium)
    finally:
        os.chdir(orig)


def bench_speed_of_light(grid, total_packets, repeats=3, nrays=1 << 17):
    """Pure-traversal stepping bound on the same cloud: march rays from
    random surface entries to exit, no physics."""
    import jax
    import jax.numpy as jnp
    from soc_tpu.ops.traverse import march_path_lengths
    from soc_tpu.transport.sources import background_entry

    rng = np.random.default_rng(7)
    stream = jnp.asarray(
        rng.integers(0, 2**31, nrays, dtype=np.int64).astype(np.uint32))
    pos, dirs = background_entry(grid.nx, grid.ny, grid.nz, stream,
                                 jnp.uint32(1), 99)
    march = jax.jit(lambda p, d: march_path_lengths(grid, p, d))
    total = march(pos, dirs)
    total.block_until_ready()          # compile + warm
    best = None
    rounds = max(1, total_packets // nrays)
    for rep in range(repeats):
        t0 = time.time()
        for _ in range(min(rounds, 8)):
            total = march(pos, dirs)
        _ = float(np.asarray(total).sum())       # forced readback
        dt = (time.time() - t0) / min(rounds, 8)
        if best is None or dt < best:
            best = dt
    return nrays / best


def bench_sol_stepping(lanes, iters=100, grid=None, medium=None):
    """Speed-of-light STEPPING fraction: the REAL transport loop's lane-step
    rate vs the march+gather+deposit floor (the memory ops every Monte-Carlo
    step must perform) on the identical loop shape.  The production loop is
    measured directly -- transport_run with a fixed max_iters and an
    unlimited packet budget does exactly iters*refill_period*lanes
    lane-steps (march/service split, refill, esc flush and all); the floor
    is ablate_step's 'bound' variant (traversal + density gather + deposit,
    free path never ends).  Pass (grid, medium) to measure the fraction on
    a different model (the reference-scale section re-runs it at 16.8M
    cells, where the gather floor itself is lower)."""
    import time as _t
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import ablate_step as ab
    if grid is None:
        grid, medium = ab.load_workload()
    import jax.numpy as jnp
    from soc_tpu.transport.propagate import transport_run
    from soc_tpu.transport.sources import stream_hi_base
    physics = dict(kabs=medium.abs_gl, ksca=medium.sca_gl, csc=medium.csc,
                   tw=medium.tw)
    nfreq = medium.nfreq
    refill = 8
    params = dict(photons=jnp.ones(nfreq, jnp.float32), ifreq=None,
                  per_freq=jnp.int32(1 << 20), ifreq0=jnp.int32(0),
                  k0=jnp.uint32(0), hi_base=jnp.uint32(stream_hi_base("bg")))

    def run_real():
        tabs = jnp.zeros(grid.cells, jnp.float32)
        intf = jnp.zeros((1, 1), jnp.float32)
        tabs, _, _, _ = transport_run(
            grid, physics, params, jnp.int32(2**31 - 1), tabs, intf,
            jnp.uint32(7), source_kind="bg", nlanes=lanes, max_iters=iters,
            refill_period=refill, esc_bins=nfreq)
        return tabs

    # forced readback of a DEVICE-REDUCED scalar (4 bytes): pulling the
    # full [CELLS] tabs would dominate the timing at 16.8M cells over the
    # ~10-40 MB/s tunnel link (67 MB ~ 5 s) and measure the link, not the
    # loop; jnp.sum then np.asarray still forces real completion
    _ = float(np.asarray(jnp.sum(run_real())))
    best = None
    for _ in range(3):
        t0 = _t.time()
        _ = float(np.asarray(jnp.sum(run_real())))
        dt = _t.time() - t0
        best = dt if best is None else min(best, dt)
    real_rate = iters * refill * lanes / best

    tabs, _ = ab.ablate_run(grid, physics, jnp.float32(1.0), 7,
                            variant="bound", nlanes=lanes, iters=iters)
    _ = float(np.asarray(jnp.sum(tabs)))
    bbest = None
    for _ in range(3):
        t0 = _t.time()
        tabs, _ = ab.ablate_run(grid, physics, jnp.float32(1.0), 7,
                                variant="bound", nlanes=lanes, iters=iters)
        _ = float(np.asarray(jnp.sum(tabs)))     # 4-byte forced readback
        dt = _t.time() - t0
        bbest = dt if bbest is None else min(bbest, dt)
    bound_rate = iters * ab.REFILL * lanes / bbest
    return real_rate, bound_rate


def bench_octree(medium, lanes, total_packets=1 << 23, repeats=3, depth=3):
    """BASELINE config 2: background transport through a depth-level
    octree-refined 64^3 cloud (central 8^3 root block refined, then a
    64-cell refinement cascade at every deeper level; depth=3 reproduces
    the original round-2 grid bit-for-bit, depth=6 quantifies the
    per-step cost growth of the multi-level machinery)."""
    import time as _t
    import jax.numpy as jnp
    from soc_tpu.grid import grid_from_arrays, encode_link_np
    from soc_tpu.transport.propagate import transport_run
    from soc_tpu.transport.sources import stream_hi_base

    n = 64
    rng = np.random.default_rng(3)
    root = (1000.0 * rng.uniform(0.5, 1.5, n ** 3)).astype(np.float32)
    ii = np.asarray([x + n * y + n * n * z
                     for z in range(28, 36)
                     for y in range(28, 36)
                     for x in range(28, 36)], np.int64)
    root[ii] = encode_link_np(
        np.arange(0, 8 * len(ii), 8, dtype=np.int32))
    arrays, lcells = [root], [n ** 3]
    m = len(ii)
    for lvl in range(1, depth):
        vals = (1000.0 * 2.0 ** lvl
                * rng.uniform(0.5, 1.5, 8 * m)).astype(np.float32)
        if lvl < depth - 1:                       # 64 re-refined cells
            sub = np.arange(64) * (8 * m // 64) + 5
            vals[sub] = encode_link_np(np.arange(0, 8 * 64, 8,
                                                 dtype=np.int32))
            m_next = 64
        else:
            m_next = 0
        arrays.append(vals)
        lcells.append(8 * m)
        m = m_next
    grid = grid_from_arrays(n, n, n, lcells, arrays)

    nfreq = medium.nfreq
    physics = dict(kabs=medium.abs_gl, ksca=medium.sca_gl,
                   csc=medium.csc, tw=medium.tw)
    per_freq = total_packets // nfreq
    params = dict(photons=jnp.full(nfreq, 1e-3, jnp.float32), ifreq=None,
                  per_freq=jnp.int32(per_freq), ifreq0=jnp.int32(0),
                  k0=jnp.uint32(0), hi_base=jnp.uint32(stream_hi_base("bg")))

    def go():
        tabs = jnp.zeros(grid.cells, jnp.float32)
        intf = jnp.zeros((1, 1), jnp.float32)
        tabs, _, esc, _ = transport_run(
            grid, physics, params, jnp.int32(per_freq * nfreq), tabs, intf,
            jnp.uint32(11), source_kind="bg", nlanes=lanes, esc_bins=nfreq)
        return tabs

    best = None
    sane = True
    for _ in range(repeats):
        t0 = _t.time()
        tabs = go()
        sane &= bool(np.isfinite(np.asarray(tabs)).all())  # forced readback
        dt = _t.time() - t0
        best = dt if best is None or dt < best else best
    assert sane
    return per_freq * nfreq / best


def bench_sca(lanes, total_packets=1 << 21, repeats=3):
    """BASELINE config 4: scattered light with peel-off -- background
    source, one frequency channel of the soc_example dust, 128^2 map."""
    import time as _t
    import jax.numpy as jnp
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import ablate_step as ab
    from soc_tpu.render.scattered import simulate_scattering
    from soc_tpu.render.mapping import observer_basis

    grid, medium = ab.load_workload()
    ifreq = 20
    physics = dict(kabs=medium.abs_gl[ifreq], ksca=medium.sca_gl[ifreq],
                   csc=medium.csc[ifreq], dsc=medium.dsc[ifreq],
                   tw=jnp.float32(1.0))
    odir, ra, de = observer_basis(0.3, 0.4)
    centre = (grid.nx / 2, grid.ny / 2, grid.nz / 2)
    params = dict(photons=jnp.float32(1.0), ifreq=jnp.int32(0),
                  per_freq=jnp.int32(total_packets))
    best = None
    steps_ffs = peel_ffs = None
    for _ in range(repeats):
        t0 = _t.time()
        out, st = simulate_scattering(
            grid, physics, params, total_packets, odir, ra, de, centre,
            0.5, (128, 128), np.uint32(9), source_kind="bg",
            nlanes=lanes, capacity=1 << 20, return_stats=True)
        s = float(np.asarray(out).sum())          # forced readback
        dt = _t.time() - t0
        best = dt if best is None or dt < best else best
        steps_ffs = st["lane_steps"]
        peel_ffs = st["peel_lane_steps"]
    assert np.isfinite(s) and s > 0
    # pure-march reference on the same engine (ffs off; the channel is
    # optically thin so nothing scatters, so there are no events and no
    # peel rays): one full chord per packet.  The measured lane-step
    # counts attribute the pps gap to workload: chord_equivalents = FFS
    # transport lane-steps / march-only lane-steps (a counted fact of
    # this run, not a timing inference); step_parity compares effective
    # lane-step rates with the peel-ray marches included on the FFS side.
    best_m = None
    steps_march = None
    for _ in range(repeats):
        t0 = _t.time()
        out, st = simulate_scattering(
            grid, physics, params, total_packets, odir, ra, de, centre,
            0.5, (128, 128), np.uint32(9), source_kind="bg",
            nlanes=lanes, capacity=1 << 20, ffs=False, return_stats=True)
        _ = float(np.asarray(out).sum())
        dt = _t.time() - t0
        best_m = dt if best_m is None or dt < best_m else best_m
        steps_march = st["lane_steps"]
    detail = dict(chord_equivalents=round(steps_ffs / steps_march, 2),
                  lane_steps_ffs=steps_ffs, peel_lane_steps_ffs=peel_ffs,
                  lane_steps_march=steps_march,
                  step_parity=round(
                      ((steps_ffs + peel_ffs) / best)
                      / (steps_march / best_m), 3))
    return total_packets / best, total_packets / best_m, detail


def real_dust_solver(workdir, ne=128):
    """A .solver built by the actual A2E_pre path (solver_prep) from a GSET
    grain model with 4 stochastic sizes, on the soc_example frequency grid
    -- realistic heating/cooling matrices and spectra, not random ones.
    Round-trips through the .solver file ABI (write_solver/read_solver)."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_solver_prep import synthetic_dust, isrf_absorptions
    from soc_tpu.solve import solver_prep
    from soc_tpu.solve.solver_file import write_solver, read_solver
    freq = np.loadtxt(os.path.join(workdir, "freq.dat"))
    dust = synthetic_dust(size_a=[5e-8, 1e-7, 3e-7, 1e-6],
                          s_frac=[0.4, 0.3, 0.2, 0.1])
    solver = solver_prep.build_solver(dust, freq, ne=ne)
    path = os.path.join(workdir, "bench.solver")
    write_solver(path, solver)
    solver = read_solver(path)
    # per-cell ISRF heating spanning 4 dex of field strength
    unit = isrf_absorptions(dust, freq)
    return solver, unit


def measure_link(piece_bytes=6 << 20, n_pieces=2, repeats=2):
    """Measured host<->device link bandwidth (MB/s up, down), best-of-N,
    at a given transfer granularity.

    On this harness the device sits behind a tunnel whose bandwidth is
    both mood- AND SIZE-dependent (measured in-run: 5.8 MB pieces move at
    ~8 MB/s while a single 24 MB buffer moves at ~30 MB/s), so the A2E
    serial ceiling must be probed with the same piece size and count as
    the solve's actual superbatch traffic -- otherwise the efficiency
    number compares against a ceiling the link never offers."""
    import jax
    import jax.numpy as jnp
    xs = [np.random.default_rng(i).random(piece_bytes // 4)
          .astype(np.float32) for i in range(n_pieces)]
    ups, downs = [], []
    for _ in range(repeats):
        t0 = time.time()
        ds = [jax.device_put(x) for x in xs]
        _ = [float(np.asarray(d[-1])) for d in ds]   # force completion
        ups.append(time.time() - t0)
        t0 = time.time()
        _ = [np.asarray(d) for d in ds]
        downs.append(time.time() - t0)
    tot = piece_bytes * n_pieces
    # mean, not best-of: the solve makes MANY transfers over a drifting
    # link, so the mean is the estimator of what the link actually gave
    # the run (best-of overstates the ceiling and understates efficiency)
    return (tot / (sum(ups) / len(ups)) / 1e6,
            tot / (sum(downs) / len(downs)) / 1e6)


def bench_a2e(workdir, cells=131072, ne=128):
    """Stochastic-heating solve throughput on a real GSET-dust solver."""
    import jax
    import jax.numpy as jnp
    from soc_tpu.solve import stochastic
    solver, unit = real_dust_solver(workdir, ne=ne)
    nfreq = solver.nfreq
    rng = np.random.default_rng(0)
    strength = (10.0 ** rng.uniform(0.0, 4.0, cells)).astype(np.float32)
    absorbed = strength[:, None] * unit[None, :]
    # first pass compiles, second finishes warming the device caches;
    # then best-of-3 (same policy as the transport metric)
    emitted = stochastic.solve_emission(solver, absorbed)
    stochastic.solve_emission(solver, absorbed)
    # link bandwidth bracketing the timed region, probed at the solve's
    # own transfer granularity (superbatch = 2 chunks x 16384 rows): the
    # end-to-end solve is link-bound (absorbed up + emitted down), so the
    # honest denominator is THIS run's serial link ceiling for the SAME
    # piece sizes, not an assumed or large-buffer bandwidth
    piece = 2 * 16384 * nfreq * 4
    n_pieces = max(1, cells * nfreq * 4 // piece)
    up0, down0 = measure_link(piece, n_pieces)
    best = None
    for _ in range(3):
        t0 = time.time()
        emitted = stochastic.solve_emission(solver, absorbed)
        _ = float(jnp.sum(jnp.asarray(emitted)))   # forced readback
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    up1, down1 = measure_link(piece, n_pieces)
    assert np.isfinite(emitted).all()
    # energy sanity on the real dust: emitted integrates to the absorbed
    # energy within the solver's discretization (checked loosely here;
    # the tight check lives in tests/test_solver_prep.py)
    assert float(emitted.max()) > 0
    up, down = 0.5 * (up0 + up1), 0.5 * (down0 + down1)
    payload = cells * nfreq * 4          # bytes each way (float32)
    ceiling = cells / (payload / (up * 1e6) + payload / (down * 1e6))
    # the dispatch overlaps readbacks with uploads on a drain thread and
    # the tunnel is full-duplex, so the achievable bound is set by the
    # SLOWER direction alone, not the directions' sum
    duplex = cells / (payload / (min(up, down) * 1e6))
    link = dict(up_mbps=round(up, 1), down_mbps=round(down, 1),
                up_both=[round(up0, 1), round(up1, 1)],
                down_both=[round(down0, 1), round(down1, 1)],
                serial_ceiling_cells_per_sec=round(ceiling, 1),
                duplex_ceiling_cells_per_sec=round(duplex, 1))

    # device-resident rate: input/output stay on device, so the (dev-tunnel)
    # host-link bandwidth -- not a property of the TPU -- is excluded; this
    # is the rate an in-pipeline solve with device-resident tallies sees
    dev_best = None
    if jax.default_backend() == "tpu":
        from soc_tpu.solve.pallas_a2e import solve_all_chunks
        # blessed accessor: fails loudly if the fused path is unavailable
        # instead of silently dropping the device-resident metric
        w_stack, td_stack, ea_stack = stochastic.get_fused_stacks(solver)
        blk = jnp.asarray(absorbed.reshape(-1, 16384, nfreq))
        blk.block_until_ready()
        for _ in range(3):
            t0 = time.time()
            tot, _ = solve_all_chunks(w_stack, td_stack, ea_stack, blk,
                                      None, ne)
            _ = float(np.asarray(tot[0, 0, 0]))    # 4-byte readback
            dt = time.time() - t0
            dev_best = dt if dev_best is None else min(dev_best, dt)
    return cells / best, (cells / dev_best if dev_best else None), link


def bench_map(grid, medium, freq, npix=512):
    import jax.numpy as jnp
    from soc_tpu.render.mapping import observer_basis, render_ortho
    nf = len(freq)
    emit = jnp.ones((grid.cells, nf), jnp.float32)
    ext = medium.abs_gl + medium.sca_gl
    odir, ra, de = observer_basis(0.3, 0.4)
    centre = (grid.nx / 2, grid.ny / 2, grid.nz / 2)
    args = (grid, emit, ext, jnp.asarray(odir), jnp.asarray(ra),
            jnp.asarray(de), jnp.asarray(centre, jnp.float32), 0.125,
            (npix, npix))
    phot, tau, colden = render_ortho(*args)
    phot.block_until_ready()           # compile
    t0 = time.time()
    phot, tau, colden = render_ortho(*args)
    _ = float(jnp.sum(phot))                       # forced readback
    return time.time() - t0


def bench_scaling(lanes, total=1 << 18):
    """Packet-throughput scaling efficiency over the visible devices
    (BASELINE: >= 70% at 2+ hosts). Runs the PRODUCT sharded path
    (parallel/product.run_freqs) on 1 device and on all of them; returns
    None on a single-chip harness (the dry-run driver exercises the
    multi-device path on a virtual mesh instead).

    total : packets per channel (44 channels ~ 11M packets/run at the
        default; tests pass a small value for the CPU mesh).

    Only meaningful on real chips: on a virtual CPU mesh the N "devices"
    share the same host cores, so the measured efficiency (~0.3 at N=8)
    reflects core oversubscription, not ICI scaling."""
    import jax
    n = len(jax.devices())
    if n < 2:
        return None
    import time as _t
    import jax.numpy as jnp
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import ablate_step as ab
    from soc_tpu.parallel.product import ProductMesh, run_freqs
    grid, medium = ab.load_workload()

    def rate(ndev):
        pm = ProductMesh(ndev, medium.nfreq)
        def make_params(_i):
            return dict(photons=jnp.float32(1.0))
        def once():
            tabs = jnp.zeros(grid.cells, jnp.float32)
            intf = jnp.zeros((1, 1), jnp.float32)
            tabs, _, esc, _, _ = run_freqs(
                pm, grid, medium, "bg", make_params, total, tabs, intf,
                7, lanes, False)
            return float(np.asarray(tabs).sum())
        once()
        best = None
        for _ in range(3):
            t0 = _t.time()
            once()
            dt = _t.time() - t0
            best = dt if best is None else min(best, dt)
        return total * medium.nfreq / best

    r1 = rate(1)
    rn = rate(n)
    return dict(devices=n, pps_1=round(r1, 1), pps_n=round(rn, 1),
                efficiency=round(rn / (n * r1), 3))


def bench_large(workdir, lanes, repeats=2):
    """Reference-scale section (VERDICT r5 item 1): a 16.8M-cell model.

    Every other number in this bench lives on a 262k-cell model whose
    density table is ~1 MB; the reference's entire memory design exists
    for 1e8-5e8 cells ("4 x CELLS floats ~ 7.2 GB @ 480e6 cells",
    /root/reference/ASOC.py:39-53, 441-453).  This section measures the
    same quantities where they start to matter: a 256^3 root + central
    16^3 refinement cascade (16,814,080 cells; the [CELLS, NFREQ] tally
    is 2.96 GB, already past any keep-it-all-in-HBM-per-channel comfort):

      * the random gather / scatter-add floor re-probed at the
        HBM-resident table size (round-4 methodology, 16.8M-entry table)
      * bg transport pkt/s with the per-frequency absorption tally in a
        host memmap -- the actual driver mmapabs path, one device column
        per channel (driver.simulate_background host_tally)
      * out-of-core A2E streaming over a reference-ABI absorbed file
        (4.19M rows x 44 -- cells are independent, so row count scales
        time linearly; the streaming reader/writer path is identical at
        any row count) with the real GSET solver, link-attributed
      * the 512x512x44 orthographic map render against the 16.8M grid
    """
    import shutil
    import time as _t
    import jax
    import jax.numpy as jnp
    from soc_tpu.config import RunConfig
    from soc_tpu.grid import grid_from_arrays, encode_link_np
    from soc_tpu.io.cloud import write_hierarchy, read_cloud
    from soc_tpu.io.dust import read_simple_dust, read_scattering_function
    from soc_tpu.io.fields import read_background_intensity
    from soc_tpu.pipeline import driver
    from soc_tpu.render.mapping import observer_basis, render_ortho
    from soc_tpu.solve import stochastic
    from soc_tpu.transport.medium import medium_from_optics

    ldir = os.path.join(workdir, "large")
    os.makedirs(ldir, exist_ok=True)
    # env knobs exist for CPU smoke tests only; the bench default is the
    # full 256^3 reference-scale model
    n = int(os.environ.get("SOC_BENCH_LARGE_N", 256))
    cloud = os.path.join(ldir, "large.cloud")
    if not os.path.exists(cloud):
        rng = np.random.default_rng(12)
        root = (1000.0 * rng.uniform(0.5, 1.5, n ** 3)).astype(np.float32)
        c0, c1 = n // 2 - 8, n // 2 + 8
        ii = np.asarray([x + n * y + n * n * z
                         for z in range(c0, c1)
                         for y in range(c0, c1)
                         for x in range(c0, c1)], np.int64)
        root[ii] = encode_link_np(
            np.arange(0, 8 * len(ii), 8, dtype=np.int32))
        l1 = (2000.0 * rng.uniform(0.5, 1.5,
                                   8 * len(ii))).astype(np.float32)
        sub = np.arange(512) * (len(l1) // 512) + 3
        l1[sub] = encode_link_np(np.arange(0, 8 * 512, 8, dtype=np.int32))
        l2 = (4000.0 * rng.uniform(0.5, 1.5, 8 * 512)).astype(np.float32)
        write_hierarchy(cloud, n, n, n, [n ** 3, len(l1), len(l2)],
                        [root, l1, l2])
    for f in ("tmp.dust", "tmp.dsc", "bg_intensity.bin"):
        shutil.copy(os.path.join(workdir, f), ldir)
    with open(os.path.join(ldir, "large.ini"), "w") as fp:
        fp.write("gridlength 0.01\ncloud large.cloud\ndensity 1.0\n"
                 "seed 1.0\noptical tmp.dust\ndsc tmp.dsc 2500\n"
                 "bgpackets 1\nbackground bg_intensity.bin\n"
                 "mapping 16 16 1.0\ndirections 0 0\nprefix large\n")
    orig = os.getcwd()
    os.chdir(ldir)
    try:
        cfg = RunConfig("large.ini")
        grid = read_cloud("large.cloud", cfg.kdensity, cfg.max_levels)
        optics = [read_simple_dust("tmp.dust", cfg.gl)]
        freq = optics[0].freq
        cfg.freq = freq
        nfreq = len(freq)
        dsc, csc = read_scattering_function("tmp.dsc", nfreq, 2500)
        medium = medium_from_optics(optics, dsc, csc, freq)
        ibg = read_background_intensity("bg_intensity.bin", nfreq)
    finally:
        os.chdir(orig)
    cells = int(grid.cells)
    out = dict(cells=cells, levels=int(grid.levels))

    # ---- gather/scatter floor at the 16.8M-entry table (round-4 probe
    # methodology: constant random index set, chained reps in one jit)
    idxn = 1 << 17
    reps_in = 16
    rngp = np.random.default_rng(7)
    idx = jnp.asarray(rngp.integers(0, cells, idxn,
                                    dtype=np.int64).astype(np.int32))
    vals = jnp.asarray(rngp.random(idxn).astype(np.float32))
    tbl = grid.dens

    @jax.jit
    def probe_gather(tbl, idx):
        acc = jnp.zeros(idxn, jnp.float32)
        for _ in range(reps_in):
            acc = acc + tbl[idx]
            idx = (idx + 1) % cells      # chain: no rep elimination
        return acc

    @jax.jit
    def probe_scatter(idx, vals):
        o = jnp.zeros(cells, jnp.float32)
        for _ in range(reps_in):
            o = o.at[idx].add(vals, mode="drop")
            idx = (idx + 1) % cells
        return o

    def timeit(fn, *args):
        r = fn(*args)
        _ = np.asarray(r.ravel()[:1])            # forced readback
        best = None
        for _ in range(3):
            t0 = _t.time()
            r = fn(*args)
            _ = np.asarray(r.ravel()[:1])
            dt = _t.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    out["gather_melem_per_s"] = round(
        idxn * reps_in / timeit(probe_gather, tbl, idx) / 1e6, 1)
    out["scatter_melem_per_s"] = round(
        idxn * reps_in / timeit(probe_scatter, idx, vals) / 1e6, 1)

    # ---- stepping rate vs the memory-op floor ON this grid: the
    # speed-of-light claim re-proven where the gather floor is lower.
    # Denominator note: at this table size the in-loop 'bound' ablation
    # (all lanes marching forever = fully random access) measures SLOWER
    # than the real loop -- the real loop's surface refills give its
    # gathers locality the random march lacks (measured 35 vs 15
    # Msteps/s) -- so the fraction is reported against the probed
    # single-memory-op random floor min(gather, scatter): a step must do
    # at least one such op, making this the conservative (perfect-
    # overlap) denominator. Both raw numbers are published.
    step_rate, bound_rate = bench_sol_stepping(lanes, iters=150,
                                               grid=grid, medium=medium)
    out["stepping_rate_msteps_per_s"] = round(step_rate / 1e6, 1)
    out["stepping_inloop_bound_msteps_per_s"] = round(bound_rate / 1e6, 1)
    floor = min(out["gather_melem_per_s"], out["scatter_melem_per_s"])
    out["sol_stepping_fraction_vs_random_floor"] = round(
        step_rate / 1e6 / floor, 3)

    # ---- bg transport under the mmapabs host tally (2 channels: the
    # optically thin 250 um and the thick 0.15 um end of the real dust)
    tally_path = os.path.join(ldir, "tally.mmap")
    host_tally = np.memmap(tally_path, np.float32, mode="w+",
                           shape=(cells, nfreq))
    freq_mask = np.zeros(nfreq, bool)
    chans = [10, 43]
    freq_mask[chans] = True
    area = int(grid.area)
    pkt = int(freq_mask.sum()) * 8 * area
    times = []
    for rep in range(repeats):
        tabs0 = jnp.zeros(cells, jnp.float32)
        intf0 = jnp.zeros((1, 1), jnp.float32)
        t0 = _t.time()
        tabs, _, esc, inj = driver.simulate_background(
            grid, medium, cfg, ibg, tabs0, intf0, np.uint32(77 + rep),
            lanes=lanes, per_freq_tally=True, freq_mask=freq_mask,
            host_tally=host_tally)
        col_sums = [float(host_tally[:, c].sum()) for c in chans]
        times.append(round(_t.time() - t0, 2))
    out["bg_transport_pps"] = round(pkt / min(times), 1)
    out["bg_transport_s_all"] = times
    out["bg_channels"] = chans
    sane = all(np.isfinite(s) and s > 0 for s in col_sums)
    del host_tally
    os.unlink(tally_path)

    # ---- out-of-core A2E streaming (reference absorbed.data ABI)
    rows = int(os.environ.get("SOC_BENCH_LARGE_ROWS", 1 << 22))
    apath = os.path.join(ldir, "absorbed.large")
    solver, unit = real_dust_solver(workdir)
    if not os.path.exists(apath):
        rngl = np.random.default_rng(5)
        with open(apath, "wb") as fp:
            np.asarray([rows, nfreq], np.int32).tofile(fp)
            for i0 in range(0, rows, 1 << 18):
                m = min(1 << 18, rows - i0)
                s = (10.0 ** rngl.uniform(0, 4, m)).astype(np.float32)
                (s[:, None] * unit[None, :]).astype(np.float32).tofile(fp)
    epath = os.path.join(ldir, "emitted.large")
    # the streaming solve transfers in the same 2x16384-row superbatches
    piece = 2 * 16384 * nfreq * 4
    up0, down0 = measure_link(piece, 4)
    t0 = _t.time()
    nrows = stochastic.solve_emission_streaming(solver, apath, epath)
    dt = _t.time() - t0
    up1, down1 = measure_link(piece, 4)
    assert nrows == rows
    a2e_cps = rows / dt
    up, down = 0.5 * (up0 + up1), 0.5 * (down0 + down1)
    payload = rows * nfreq * 4
    ceiling = rows / (payload / (up * 1e6) + payload / (down * 1e6))
    duplex = rows / (payload / (min(up, down) * 1e6))
    with open(epath, "rb") as fp:
        np.fromfile(fp, np.int32, 2)
        head = np.fromfile(fp, np.float32, 1 << 20)
    sane = sane and bool(np.isfinite(head).all() and head.max() > 0)
    out["a2e_stream_cells_per_sec"] = round(a2e_cps, 1)
    out["a2e_stream_rows"] = rows
    out["a2e_link"] = dict(up_mbps=round(up, 1), down_mbps=round(down, 1),
                           serial_ceiling_cells_per_sec=round(ceiling, 1),
                           duplex_ceiling_cells_per_sec=round(duplex, 1))
    # headline efficiency keeps the serial up+down ceiling as its base
    # (values > 1 demonstrate the duplex overlap); the duplex-based
    # ratio is reported alongside as the ultimate bound
    out["a2e_link_efficiency"] = round(a2e_cps / ceiling, 3)
    out["a2e_link_efficiency_duplex"] = round(a2e_cps / duplex, 3)
    os.unlink(epath)

    # ---- ini-driven driver.run end to end at 16.8M cells: the FULL
    # orchestration (phase 1 under the mmapabs memmap tally, T solve,
    # one emission iteration, maps), not just phase calls -- `simum`
    # restricts phase 1 to a FIR band exactly as a user would for a
    # band-limited run (the T field is then band-limited too; this is a
    # scale/orchestration proof, the physics-complete runs live above)
    if os.environ.get("SOC_BENCH_LARGE_E2E", "1") != "0":
        with open(os.path.join(ldir, "large_e2e.ini"), "w") as fp:
            fp.write("gridlength 0.01\ncloud large.cloud\ndensity 1.0\n"
                     "seed 1.0\noptical tmp.dust\ndsc tmp.dsc 2500\n"
                     "bgpackets 1\ncellpackets 65536\n"
                     "background bg_intensity.bin\n"
                     "mapping 128 128 2.0\ndirections 0 0\n"
                     "iterations 1\nprefix large\nsimum 150 400\n"
                     "mmapabs\ntemperature large.T\n")
        os.chdir(ldir)
        try:
            t0 = _t.time()
            res = driver.run("large_e2e.ini", lanes=lanes)
            out["driver_e2e_s"] = round(_t.time() - t0, 1)
            out["driver_e2e_phases"] = {
                k: round(float(v), 1) for k, v in res.timings.items()}
            tarr = np.asarray(res.temperature)
            sane = sane and bool(np.isfinite(tarr).all())
            out["driver_e2e_t_range"] = [round(float(tarr.min()), 2),
                                         round(float(tarr.max()), 2)]
        except Exception as e:          # noqa: BLE001 -- report, don't die
            out["driver_e2e_error"] = "%s: %s" % (type(e).__name__, e)
            sane = False
        finally:
            os.chdir(orig)

    # ---- 512x512x44 map render against the 16.8M-cell grid
    emit = jnp.ones((cells, nfreq), jnp.float32)
    ext = medium.abs_gl + medium.sca_gl
    odir, ra, de = observer_basis(0.3, 0.4)
    centre = (n / 2.0, n / 2.0, n / 2.0)
    args = (grid, emit, ext, jnp.asarray(odir), jnp.asarray(ra),
            jnp.asarray(de), jnp.asarray(centre, jnp.float32), 0.5,
            (512, 512))
    phot, tau, colden = render_ortho(*args)
    _ = float(jnp.sum(phot))                     # compile + warm
    t0 = _t.time()
    phot, tau, colden = render_ortho(*args)
    s = float(jnp.sum(phot))
    out["map_render_s_512x512x44"] = round(_t.time() - t0, 3)
    sane = sane and np.isfinite(s) and s > 0
    out["sane"] = bool(sane)
    return out


def bench_xl(workdir, lanes):
    """The reference's documented MAXIMUM scale: a 480-million-cell model.

    The reference's memory-budget comment is written for exactly this
    size -- "4 x CELLS floats ~ 7.2 GB @ 480e6 cells"
    (/root/reference/ASOC.py:39-42) with CELLS capped at 2^31-1 int32
    (:143-147).  This section builds a 783^3 = 480,048,687-cell uniform
    grid (one float32 plane = 1.92 GB; the [CELLS, NFREQ] tally would be
    84 GB, which is why mmapabs / frequency sharding exist -- that path
    is proven at 16.8M cells above, here the integrated tally is used)
    and measures single-channel bg transport, the random-access floor at
    the 480M-entry table, and a 512x512 single-channel map render.
    Capability proof + throughput at the int32 design ceiling.
    """
    import time as _t
    import jax
    import jax.numpy as jnp
    from soc_tpu.grid import Grid
    from soc_tpu.io.dust import read_simple_dust, read_scattering_function
    from soc_tpu.render.mapping import observer_basis, render_ortho
    from soc_tpu.transport.propagate import transport_run
    from soc_tpu.transport.sources import stream_hi_base

    n = int(os.environ.get("SOC_BENCH_XL_N", 783))
    pkts = int(os.environ.get("SOC_BENCH_XL_PKTS", 1 << 19))
    cells = n ** 3
    rng = np.random.default_rng(21)
    dens_np = rng.random(cells, dtype=np.float32) + np.float32(0.5)
    dens_np *= np.float32(1000.0 * 64.0 / n)   # hold total optical depth
    t0 = _t.time()
    dens = jax.device_put(dens_np)
    _ = float(np.asarray(dens[-1]))
    upload_s = _t.time() - t0
    del dens_np
    # levels == 1: the parent array is never read by any traversal branch
    # (they all early-out on grid.levels), so a 1-element placeholder
    # avoids a second 1.92 GB plane on device and on the link
    grid = Grid(dens=dens, lcells=jnp.asarray([cells], jnp.int32),
                off=jnp.asarray([0], jnp.int32),
                par=jnp.zeros(1, jnp.int32),
                nx=n, ny=n, nz=n, levels=1, cells=cells)
    out = dict(cells=cells, upload_s=round(upload_s, 1))

    optics = [read_simple_dust(os.path.join(workdir, "tmp.dust"), 0.01)]
    freq = optics[0].freq
    nfreq = len(freq)
    dsc, csc = read_scattering_function(os.path.join(workdir, "tmp.dsc"),
                                        nfreq, 2500)
    chan = 30                                    # 2.15 um: tau ~ 1, albedo .6
    physics = dict(kabs=jnp.float32(optics[0].abs_gl[chan]),
                   ksca=jnp.float32(optics[0].sca_gl[chan]),
                   csc=jnp.asarray(np.asarray(csc, np.float32)[chan]),
                   tw=jnp.float32(1.0))

    # gather/scatter floor at the 480M-entry table (same probe as 16.8M)
    idxn = 1 << 17
    reps_in = 16
    idx = jnp.asarray(rng.integers(0, cells, idxn,
                                   dtype=np.int64).astype(np.int32))

    @jax.jit
    def probe_gather(tbl, idx):
        acc = jnp.zeros(idxn, jnp.float32)
        for _ in range(reps_in):
            acc = acc + tbl[idx]
            idx = (idx + 1) % cells
        return acc

    pg = probe_gather(grid.dens, idx)
    _ = np.asarray(pg.ravel()[:1])
    best = None
    for _ in range(3):
        t0 = _t.time()
        pg = probe_gather(grid.dens, idx)
        _ = np.asarray(pg.ravel()[:1])
        best = min(best or 9e9, _t.time() - t0)
    out["gather_melem_per_s"] = round(idxn * reps_in / best / 1e6, 1)

    # chunked executions: a single multi-minute device execution at this
    # size gets killed by the worker watchdog (observed: one 2^20-packet
    # call crashed the TPU worker; 2^17-packet chunks at ~15 s each run
    # clean -- the same reason driver.simulate_background chunks at 4M)
    chunk = min(pkts, 1 << 17)
    xl_lanes = min(lanes, 1 << 14)
    tabs = jnp.zeros(cells, jnp.float32)
    intf = jnp.zeros((1, 1), jnp.float32)
    t0 = _t.time()
    s = 0.0
    for k0 in range(0, pkts, chunk):
        params = dict(photons=jnp.float32(1.0), ifreq=jnp.int32(0),
                      per_freq=jnp.int32(chunk), k0=jnp.uint32(k0),
                      hi_base=jnp.uint32(stream_hi_base("bg")))
        tabs, intf, esc, inj = transport_run(
            grid, physics, params, jnp.int32(chunk), tabs, intf,
            jnp.uint32(31), source_kind="bg", nlanes=xl_lanes, esc_bins=1)
        s = float(np.asarray(jnp.sum(tabs)))     # 4-byte forced readback
    dt = _t.time() - t0
    out["bg_transport_pps"] = round(pkts / dt, 1)
    out["bg_transport_s"] = round(dt, 1)
    sane = np.isfinite(s) and s > 0

    # 256^2 keeps the single render execution well under the watchdog
    # (the 783-cell-deep LOS costs ~3x the 256^3 render per pixel)
    emit = jnp.ones((cells, 1), jnp.float32)
    ext = jnp.asarray([float(optics[0].abs_gl[chan]
                             + optics[0].sca_gl[chan])], jnp.float32)
    odir, ra, de = observer_basis(0.3, 0.4)
    centre = (n / 2.0, n / 2.0, n / 2.0)
    args = (grid, emit, ext, jnp.asarray(odir), jnp.asarray(ra),
            jnp.asarray(de), jnp.asarray(centre, jnp.float32),
            n / 256.0, (256, 256))
    phot, tau, colden = render_ortho(*args)
    _ = float(np.asarray(jnp.sum(phot)))
    t0 = _t.time()
    phot, tau, colden = render_ortho(*args)
    sm = float(np.asarray(jnp.sum(phot)))
    out["map_render_s_256x256x1"] = round(_t.time() - t0, 2)
    sane = sane and np.isfinite(sm) and sm > 0
    out["sane"] = bool(sane)
    return out


def warm_device_link():
    """Pay the one-time tunnel costs OUTSIDE every timed region.

    Measured on the axon tunnel (fresh process): the FIRST device->host
    readback stalls ~300 s regardless of payload size (16 bytes!) -- a
    lazy channel-setup cost of the tunnel infrastructure, not of this
    framework or of XLA. It was the dominant term of BENCH_r03's 1136 s
    first transport rep. One throwaway tiny round trip here moves it out
    of the benchmark numbers; on real local TPUs this is a no-op
    (milliseconds)."""
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    _ = np.asarray(jnp.zeros(4, jnp.float32) + 1)
    _ = np.asarray(jax.device_put(np.zeros((256, 256), np.float32)))
    dt = time.time() - t0
    if dt > 1.0:
        print("# warm_device_link: first round trip took %.1f s "
              "(tunnel channel setup)" % dt, file=sys.stderr)


def main():
    from soc_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    warm_device_link()
    from soc_tpu.pipeline import driver

    workdir = os.environ.get("SOC_BENCH_DIR", "/tmp/soc_bench")
    ini = prepare_workdir(workdir)
    # 32k lanes is the measured sweet spot on v5e after the gather-hoist
    # optimization (671k vs 649k pkt/s at 16k; 8k/16k/32k swept on-chip)
    lanes = int(os.environ.get("SOC_BENCH_LANES", 1 << 15))

    tr = bench_transport(workdir, lanes)
    grid, medium = tr.pop("grid"), tr.pop("medium")
    pps = tr["pps"]

    sol_pps = bench_speed_of_light(grid, tr["packets"])
    step_rate, bound_rate = bench_sol_stepping(lanes)
    octree_pps = bench_octree(medium, lanes)
    octree6_pps = bench_octree(medium, lanes, depth=6)
    sca_pps, sca_march_pps, sca_detail = bench_sca(lanes)
    a2e_cps, a2e_dev_cps, a2e_link = bench_a2e(workdir)
    scaling = bench_scaling(lanes)
    freq = np.loadtxt(os.path.join(workdir, "freq.dat"))
    map_s = bench_map(grid, medium, freq)

    # end-to-end pipeline wall time (the full soc_example run); two reps
    # like the transport metric -- the first rep after a code change pays
    # one-off XLA compiles (cache misses land in the timed region), the
    # second is the steady state a user sees on every later run
    e2e_all = []
    for _ in range(2):
        t0 = time.time()
        res = driver.run(ini, lanes=lanes)
        e2e_all.append(round(time.time() - t0, 2))
    e2e = min(e2e_all)

    # reference-scale section last: its fresh 16.8M-cell executables must
    # not pollute the small-model steady-state timings above
    large = None
    if os.environ.get("SOC_BENCH_LARGE", "1") != "0":
        large = bench_large(workdir, lanes)
    # 480M-cell capability section: the reference's documented maximum;
    # never allowed to kill the bench (reported as an error string if the
    # environment can't take it)
    xl = None
    if os.environ.get("SOC_BENCH_XL", "1") != "0":
        try:
            xl = bench_xl(workdir, lanes)
        except Exception as e:          # noqa: BLE001 -- report, don't die
            xl = dict(error="%s: %s" % (type(e).__name__, e), sane=False)

    result = {
        "metric": "bg_transport_packets_per_sec",
        "value": round(pps, 1),
        "unit": "packets/s/chip",
        "vs_baseline": round(pps / REFERENCE_PACKETS_PER_SEC, 3),
        "detail": {
            "total_packets": tr["packets"],
            "transport_s_best_of_3": tr["best_s"],
            "transport_s_all": tr["times"],
            "speed_of_light_pps": round(sol_pps, 1),
            "speed_of_light_fraction": round(pps / sol_pps, 3),
            "stepping_rate_msteps_per_s": round(step_rate / 1e6, 1),
            "stepping_bound_msteps_per_s": round(bound_rate / 1e6, 1),
            "sol_stepping_fraction": round(step_rate / bound_rate, 3),
            "octree3_transport_pps": round(octree_pps, 1),
            "octree6_transport_pps": round(octree6_pps, 1),
            "sca_peeloff_pps": round(sca_pps, 1),
            "sca_march_pps": round(sca_march_pps, 1),
            "sca_workload": sca_detail,
            # two bases, labeled: end-to-end includes host<->device traffic
            # (here a dev-tunnel link, 10-45 MB/s), device-resident is the
            # rate an in-pipeline solve with device-resident tallies sees.
            # a2e_link attributes the end-to-end number to THIS run's
            # measured link bandwidth: a2e_link_efficiency = achieved /
            # the serial up+down ceiling (values > 1 demonstrate the
            # drain-thread overlap of the full-duplex tunnel); the
            # duplex ceiling (slower direction alone) and its ratio are
            # reported alongside as the ultimate wire bound.
            "a2e_cells_per_sec": round(a2e_cps, 1),
            "a2e_device_cells_per_sec": (round(a2e_dev_cps, 1)
                                         if a2e_dev_cps else None),
            "a2e_vs_baseline": round(a2e_cps / REFERENCE_A2E_CELLS_PER_SEC,
                                     2),
            "a2e_device_vs_baseline": (
                round(a2e_dev_cps / REFERENCE_A2E_CELLS_PER_SEC, 2)
                if a2e_dev_cps else None),
            "a2e_link": a2e_link,
            "a2e_link_efficiency": round(
                a2e_cps / a2e_link["serial_ceiling_cells_per_sec"], 3),
            "a2e_link_efficiency_duplex": round(
                a2e_cps / a2e_link["duplex_ceiling_cells_per_sec"], 3),
            "scaling": scaling,     # null on a single-chip harness
            "map_render_s_512x512x44": round(map_s, 3),
            "pipeline_e2e_s": round(e2e, 2),
            "pipeline_e2e_all": e2e_all,
            "large_model": large,
            "xl_model": xl,
            "sane": tr["sane"] and bool(
                np.isfinite(res.temperature).all())
            and (large is None or large["sane"])
            and (xl is None or xl["sane"]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
