"""Stochastically-heated grain emission: the A2E solve, TPU-native.

The reference's DoSolve kernel (kernel_A2E.c:2-104) builds, per cell and per
grain size, a lower-triangular heating-rate matrix from sparse integration
weights, folds it, and runs a forward substitution for the steady-state
energy-bin populations. Here the same math is recast into MXU-shaped ops:

  1. heating matrix  A[b, u, l] = sum_f W[u, l, f] * (ABS[b, f] * AF[f])
     -- one dense [batch, NFREQ] x [NFREQ, NE*NE] matmul (W densified once
     per size at load; NE*NE*NFREQ floats ~ 12 MB)
  2. fold            B[b, j, l] = sum_{u=j}^{NE-2} A[b, u, l]  (j <= NE-2)
                     B[b, NE-1, l] = A[b, NE-1, l]
     -- a reversed cumulative sum (kernel_A2E.c:72-77 semantics: the bottom
     row is never folded into the others)
  3. forward substitution with progressive overflow rescale
     (kernel_A2E.c:80-89) -- lax.fori_loop over NE rows, vectorized over the
     cell batch
  4. emission        EMIT[b, f] = sum_i EA'[f, i] * X[b, i]
     -- one [batch, NE] x [NE, NFREQ] matmul; EA' has bins below Ibeg zeroed

Throughput target: >> the reference's ~7e3 cells/s (A2E.py:88-92).
"""

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .solver_file import densify_weights


def prepare_size_arrays(solver, isize):
    """Host-side per-size preprocessing -> device arrays for solve_batch.

    Results are cached on the solver object: the densify pass is a Python
    loop over NE^2 bands (~0.1 s per size) that would otherwise rerun on
    every iteration of the thermal solve."""
    cache = getattr(solver, "_prep_cache", None)
    if cache is None:
        cache = solver._prep_cache = {}
    if isize in cache:
        return cache[isize]
    sd = solver.sizes[isize]
    ne, nfreq = solver.ne, solver.nfreq
    w = densify_weights(sd, ne, nfreq)              # [NE, NE, NFREQ]
    # absorption fraction of this size (A2E.py:346-349)
    with np.errstate(divide="ignore", invalid="ignore"):
        af = (np.asarray(solver.sk_abs[isize], np.float64)
              / np.asarray(solver.k_abs, np.float64))
        af = af / (solver.s_frac[isize] * solver.grain_density)
    af = np.clip(np.nan_to_num(af, nan=1e-32), 1e-32, 1e100).astype(np.float32)
    # fold AF into the weight matrix (same per-frequency product)
    w = w * af[None, None, :]
    # emission array with Ibeg masking folded in (kernel_A2E.c:96-100)
    ea = np.asarray(sd.ea, np.float32).copy()       # [NFREQ, NE]
    for f in range(nfreq):
        ea[f, : sd.ibeg[f]] = 0.0
    out = (jnp.asarray(w.reshape(ne * ne, nfreq)),
           jnp.asarray(sd.tdown),
           jnp.asarray(ea))
    cache[isize] = out
    return out


def prepare_size_arrays_fused(solver, isize):
    """Per-size arrays for the fused Pallas solve (pallas_a2e).

    The fold (stage 2 of solve_batch) is linear in the heating weights, so
    it is applied to the weight matrix once here -- the device matmul then
    yields the folded matrix S[c, j, l] = sum_{u>=j} A[c, u, l] directly
    and the kernel skips the per-cell cumulative sum.  Returns
    (w_t [NFREQ, NE*NE] folded+transposed, tdown [NE], ea [NFREQ, NE]).
    """
    cache = getattr(solver, "_prep_cache", None)
    if cache is None:
        cache = solver._prep_cache = {}
    key = ("fused", isize)
    if key in cache:
        return cache[key]
    w_flat, tdown, ea = prepare_size_arrays(solver, isize)
    ne = solver.ne
    w = np.asarray(w_flat, np.float64).reshape(ne, ne, -1)
    # the XLA path clamps each heating entry max(dot, 0) BEFORE folding
    # (kernel_A2E.c:50); pre-folding makes that clamp unreachable, so the
    # fused path is exact only when every dot is provably >= 0 -- i.e.
    # all weights AND all absorbed values are non-negative. Record the
    # weight half here; solve_emission checks the absorbed half.
    cache[("fused_nonneg", isize)] = bool(w.min() >= 0.0)
    wf = np.cumsum(w[::-1], axis=0)[::-1]
    w_t = np.ascontiguousarray(
        wf.reshape(ne * ne, -1).T.astype(np.float32))
    out = (jnp.asarray(w_t), tdown, ea)
    cache[key] = out
    return out


@partial(jax.jit, static_argnames=("ne",))
def solve_batch(w_flat, tdown, ea, absorbed, ne):
    """Steady-state emission for a batch of cells, one grain size.

    w_flat   : [NE*NE, NFREQ] dense heating weights (AF included)
    tdown    : [NE] cooling rates
    ea       : [NFREQ, NE] emission array (Ibeg-masked)
    absorbed : [batch, NFREQ] absorbed photons per cell
    Returns EMIT [batch, NFREQ].
    """
    batch, nfreq = absorbed.shape
    # 1. heating matrices
    a = jnp.maximum(
        jnp.dot(absorbed, w_flat.T,
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST), 0.0)
    a = a.reshape(batch, ne, ne)                    # [b, u, l]

    # 2. fold: reversed cumsum over u, excluding the bottom row for j<=NE-2
    s = jnp.cumsum(a[:, ::-1, :], axis=1)[:, ::-1, :]   # s[j] = sum_{u>=j} a
    b_mat = s - a[:, ne - 1: ne, :]                     # exclude bottom row
    b_mat = b_mat.at[:, ne - 1, :].set(a[:, ne - 1, :])

    # 3. forward substitution with overflow rescale
    tri_mask = (jax.lax.broadcasted_iota(jnp.int32, (ne, ne), 1)
                < jax.lax.broadcasted_iota(jnp.int32, (ne, ne), 0))
    b_mat = b_mat * tri_mask[None, :, :]            # keep i < j only
    x = jnp.zeros((batch, ne), jnp.float32).at[:, 0].set(1.0e-20)

    def row_step(j, x):
        s_j = jnp.einsum("bi,bi->b", b_mat[:, j, :], x,
                         precision=lax.Precision.HIGHEST)
        # clamp below float32 inf so the rescale can always recover
        x_j = jnp.clip(s_j / (tdown[j] + 1.0e-30), 0.0, 3.0e37)
        scale = jnp.where(x_j > 1.0e20, 1.0e-20, 1.0)
        x = x * scale[:, None]
        return x.at[:, j].set(x_j * scale)

    x = lax.fori_loop(1, ne, row_step, x)

    # 4. normalize + emission (sum floored: a fully-underflowed population
    # vector yields zero emission instead of NaN)
    x = x / jnp.maximum(jnp.sum(x, axis=1, keepdims=True), 1e-35)
    emit = jnp.dot(x, ea.T, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)
    return emit


def solve_equilibrium_size(solver, isize, absorbed, gl=None, nip=5000):
    """Large grains above the stochastic cutoff: equilibrium treatment
    (A2E.py NSTOCH split; kernel_A2E.c:110-154 EqTemperature).

    absorbed : [cells, NFREQ]; returns EMIT [cells, NFREQ] for this size
    (already scaled by S_FRAC*GRAIN_DENSITY like the stochastic path).
    """
    from ..constants import EMIT_COEFF, FACTOR, H_K, PLANCK, planck_intensity
    if solver.s_frac[isize] <= 0.0:
        # a size bin with zero number fraction carries no grains: emission
        # is identically zero (dividing by s_frac would poison the Eout
        # integral with inf/NaN under the errstate suppression below)
        return np.zeros_like(np.asarray(absorbed, np.float32))
    freq = np.asarray(solver.freq, np.float64)
    # per-grain cross section
    with np.errstate(divide="ignore", invalid="ignore"):
        kabs = (np.asarray(solver.sk_abs[isize], np.float64)
                / (solver.grain_density * solver.s_frac[isize]))
        af = (np.asarray(solver.sk_abs[isize], np.float64)
              / np.asarray(solver.k_abs, np.float64))
        af = np.nan_to_num(af / (solver.s_frac[isize]
                                 * solver.grain_density), nan=1e-32)
    af = np.clip(af, 1e-32, 1e100)
    # E(T) lookup  (A2E.py equilibrium branch math)
    tgrid = np.logspace(np.log10(1.0), np.log10(2500.0), nip)
    # Eout(T) = FACTOR * 4 pi integral kabs B_nu(T) dnu  (trapezoid)
    bnu = planck_intensity(freq[None, :], tgrid[:, None])
    eout = FACTOR * 4.0 * np.pi * np.trapezoid(kabs[None, :] * bnu,
                                               freq, axis=1)

    absf = np.asarray(absorbed, np.float64) * af[None, :]
    # Ein = trapezoid of  ABS * h nu  (photons -> energy)
    ein = np.trapezoid(absf * (PLANCK * freq)[None, :], freq, axis=1)
    t = np.interp(ein, eout, tgrid)
    # emission per grain, scaled back up by S_FRAC*GRAIN_DENSITY
    coeff = EMIT_COEFF * FACTOR * solver.grain_density * \
        solver.s_frac[isize]
    x = np.clip(H_K * freq[None, :] / np.maximum(t[:, None], 1e-3), 1e-10, 500)
    emit = coeff * kabs[None, :] * freq[None, :] ** 2 / np.expm1(x)
    return emit.astype(np.float32)


def alignment_weights(solver, isize, aalg):
    """Per-cell fraction of this size's emission that is polarized: grains
    with a >= a_alg are aligned; between consecutive size bins a log-size
    interpolation applies (A2E.py:408-425 AALG handling)."""
    a = solver.size_a
    w = np.zeros(len(aalg), np.float32)
    w[a[isize] >= aalg] = 1.0
    if isize < solver.nsize - 1:
        m = (a[isize] < aalg) & (a[isize + 1] > aalg)
        w[m] = ((np.log10(aalg[m]) - np.log10(a[isize]))
                / (np.log10(a[isize + 1]) - np.log10(a[isize])))
    return w


def get_fused_stacks(solver, nstoch=999):
    """Device-resident per-size stacks for the fused Pallas solve:
    (w_stack [S, NFREQ, NE*NE], tdown_stack [S, NE], ea_stack [S, NFREQ, NE])
    with S = min(nstoch, solver.nsize). Builds and caches them if needed --
    the one blessed accessor to the internal prep cache (callers must not
    hand-construct cache keys)."""
    n_stoch = min(nstoch, solver.nsize)
    cache = getattr(solver, "_prep_cache", None)
    if cache is None:
        cache = solver._prep_cache = {}
    skey = ("stack", n_stoch)
    if skey not in cache:
        preps = [prepare_size_arrays_fused(solver, i)
                 for i in range(n_stoch)]
        cache[skey] = (jnp.stack([p[0] for p in preps]),
                       jnp.stack([p[1] for p in preps]),
                       jnp.stack([jnp.asarray(p[2]) for p in preps]))
    return cache[skey]


def fused_weights_nonneg(solver, nstoch=999):
    """True when every stochastic size's heating weights are >= 0 (then
    the pre-folded fused solve equals the clamp-then-fold XLA solve for
    non-negative absorbed inputs)."""
    n_stoch = min(nstoch, solver.nsize)
    cache = getattr(solver, "_prep_cache", None) or {}
    for i in range(n_stoch):
        if ("fused_nonneg", i) not in cache:
            prepare_size_arrays_fused(solver, i)
            cache = solver._prep_cache
    return all(cache[("fused_nonneg", i)] for i in range(n_stoch))


def solve_emission(solver, absorbed, nstoch=999, batch=16384, clip_last=True,
                   aalg=None):
    """Full A2E solve: sum emission over all grain sizes.

    absorbed : [CELLS, NFREQ] (the absorbed.data payload)
    nstoch   : sizes >= nstoch are treated at equilibrium (A2E.py NSTOCH)
    aalg     : optional [CELLS] minimum aligned grain size (RAT alignment);
               when given, also returns the polarized emission PEMITTED
               (sizes >= a_alg per cell, the reference's emitted.data.P)
    Returns EMITTED [CELLS, NFREQ] float32 (, PEMITTED if aalg given).
    """
    cells, nfreq = absorbed.shape
    absorbed = np.asarray(absorbed, np.float32).copy()
    if clip_last and nfreq >= 2:
        # guard against spurious weight on the topmost channel (A2E.py:184)
        absorbed[:, -1] = np.clip(absorbed[:, -1], 0.0,
                                  0.2 * absorbed[:, -2])
    # fused Pallas solve on real TPUs (pallas_a2e): the folded heating
    # matrix stays VMEM-resident, the NE substitution steps run
    # dispatch-free, and all stochastic sizes are scanned on-device per
    # cell chunk -- each chunk crosses the host link exactly once
    a2e_env = os.environ.get("SOC_TPU_A2E")
    # SOC_TPU_A2E: "xla" forces the exact XLA path; "fused" forces the
    # superbatched Pallas dispatch even off-TPU (interpret-mode kernel) so
    # the pipeline bookkeeping is testable on the CPU mesh
    use_fused = ((jax.default_backend() == "tpu" or a2e_env == "fused")
                 and solver.ne % 128 == 0 and batch % 128 == 0
                 and a2e_env != "xla")
    interp = jax.default_backend() != "tpu"
    if use_fused and not (fused_weights_nonneg(solver, nstoch)
                          and absorbed.min() >= 0.0):
        # the pre-folded fused kernel cannot apply the per-entry
        # max(dot, 0) clamp (kernel_A2E.c:50); with negative weights or
        # absorbed values (WITH_REFERENCE delta noise) it would diverge
        # from the XLA path, so fall back to the exact solve
        use_fused = False
    emitted = np.zeros((cells, nfreq), np.float32)
    pemitted = np.zeros((cells, nfreq), np.float32) if aalg is not None         else None
    n_stoch = min(nstoch, solver.nsize)
    if use_fused and n_stoch > 0:
        from .pallas_a2e import solve_all_chunks
        # stacks stay on device across solve calls (cached on the solver)
        w_stack, td_stack, ea_stack = get_fused_stacks(solver, n_stoch)
        if aalg is not None:
            align = np.stack([alignment_weights(solver, i, np.asarray(aalg))
                              for i in range(n_stoch)])
        else:
            align = None    # skips the polarized accumulator + readback
        # superbatched + pipelined dispatch: the host link (a ~10-35 MB/s
        # tunnel here) dominates the solve, so (a) chunks cross the link in
        # superbatch groups rather than one jnp.asarray/np.asarray pair per
        # chunk, and (b) a small pending queue keeps a few superbatches in
        # flight so uploads, device solves and readbacks overlap; the queue
        # depth bounds device HBM held by undrained results.
        # Multi-chip: the chunk axis is sharded over all visible devices
        # (cells are embarrassingly parallel) -- each superbatch carries
        # super_chunks chunks PER DEVICE.
        # local devices only: under multi-host jax.distributed the global
        # device list includes non-addressable devices, and shard_map over
        # those with host-local inputs is invalid in multi-controller JAX
        # (every process runs the full solve on its own chips instead --
        # redundant across hosts but correct; the transport phases are the
        # multi-host-scaled part)
        n_dev = len(jax.local_devices()) \
            if os.environ.get("SOC_TPU_A2E_SHARD", "1") != "0" else 1
        if n_dev > 1:
            from .pallas_a2e import solve_all_chunks_sharded
        super_chunks = 2
        step = super_chunks * n_dev * batch
        # the tunnel is full-duplex (measured: concurrent up+down completes
        # in max(up, down), not up+down), so readbacks run on a dedicated
        # drain thread -- downloads of finished superbatches overlap the
        # main thread's uploads and dispatches, and the end-to-end rate is
        # bounded by the slower link direction instead of their sum.  One
        # worker keeps downloads ordered; result slices are disjoint, so
        # the stores race with nothing.
        import concurrent.futures as _futures
        pool = _futures.ThreadPoolExecutor(max_workers=1)
        pending = []

        def _store(i0, i1, tot, ptot):
            emitted[i0:i1] += np.asarray(tot).reshape(-1, nfreq)[: i1 - i0]
            if pemitted is not None:
                pemitted[i0:i1] += (np.asarray(ptot)
                                    .reshape(-1, nfreq)[: i1 - i0])

        def drain(k):
            while len(pending) > k:
                pending.pop(0).result()

        for s0 in range(0, cells, step):
            s1 = min(s0 + step, cells)
            n = s1 - s0
            nchunk = -(-n // batch)
            if n_dev > 1:       # sharded: every device gets equal chunks
                nchunk = -(-nchunk // n_dev) * n_dev
            pad = nchunk * batch - n
            blk = absorbed[s0:s1]
            if pad:     # pad the tail chunk only (one extra compile max)
                blk = np.pad(blk, ((0, pad), (0, 0)))
            blk = blk.reshape(nchunk, batch, nfreq)
            if align is None:
                al = None
            else:
                al = align[:, s0:s1]
                if pad:
                    al = np.pad(al, ((0, 0), (0, pad)))
                al = jnp.asarray(np.ascontiguousarray(
                    al.reshape(n_stoch, nchunk, batch).swapaxes(0, 1)))
            if n_dev > 1:
                tot, ptot = solve_all_chunks_sharded(
                    w_stack, td_stack, ea_stack, jnp.asarray(blk),
                    al, solver.ne, interpret=interp)
            else:
                tot, ptot = solve_all_chunks(
                    w_stack, td_stack, ea_stack, jnp.asarray(blk),
                    al, solver.ne, interpret=interp)
            pending.append(pool.submit(_store, s0, s1, tot, ptot))
            drain(4)
        drain(0)
        pool.shutdown(wait=True)
    for isize in range(solver.nsize):
        if isize < nstoch:
            if use_fused:
                continue        # handled by the fused chunk scan above
            emit_size = np.zeros((cells, nfreq), np.float32)
            w_flat, tdown, ea = prepare_size_arrays(solver, isize)
            for i0 in range(0, cells, batch):
                i1 = min(i0 + batch, cells)
                n = i1 - i0
                chunk = absorbed[i0:i1]
                if n < batch:   # pad to keep a single compiled shape
                    chunk = np.pad(chunk, ((0, batch - n), (0, 0)))
                emit = solve_batch(w_flat, tdown, ea, jnp.asarray(chunk),
                                   solver.ne)
                emit_size[i0:i1] = np.asarray(emit[:n])
        else:
            emit_size = solve_equilibrium_size(solver, isize, absorbed)
        emitted += emit_size
        if pemitted is not None:
            w = alignment_weights(solver, isize, np.asarray(aalg))
            pemitted += emit_size * w[:, None]
    if pemitted is not None:
        return emitted, pemitted
    return emitted


def solve_emission_streaming(solver, absorbed_path, emitted_path,
                             nstoch=999, batch=None, aalg=None,
                             pemitted_path=None, ifreq=None):
    """Out-of-core A2E solve: stream absorbed.data through the device in
    prefetched chunks and write emitted.data in the background.

    The reference keeps both [CELLS, NFREQ] arrays memory-mapped
    (A2E.py:117-190); here neither file ever has to fit in host memory --
    the native double-buffered reader (soc_tpu.native) overlaps disk IO
    with the TPU solve. Results are identical to the in-memory
    solve_emission on the same chunks.

    ifreq : optional int -- write emission at this single frequency only
        (the reference A2E.py IFREQ argument, A2E.py:96-193: the emitted
        file gets ONE column).
    """
    from ..native import StreamReader, StreamWriter
    ncols = solver.nfreq if ifreq is None else 1
    if batch is None:
        # each solve_emission call flushes its superbatch pipeline at the
        # end (drain(0)), so the flush bubble is amortized by making each
        # stream chunk many superbatches long: target ~64 MB of rows per
        # prefetch buffer, in whole 16384-row solve chunks, >= 64k rows
        batch = max(1 << 16,
                    (64 << 20) // (solver.nfreq * 4) // 16384 * 16384)

    def sel(emit):
        return emit if ifreq is None else \
            np.ascontiguousarray(emit[:, ifreq:ifreq + 1])

    with StreamReader(absorbed_path, batch) as rd:
        # writers open inside the try: a failure opening the second one
        # must still close (flush) the first
        wr = wp = None
        row0 = 0
        try:
            wr = StreamWriter(emitted_path, rd.rows, ncols)
            if aalg is not None and pemitted_path:
                wp = StreamWriter(pemitted_path, rd.rows, ncols)
            for chunk in rd:
                if aalg is not None:
                    a_chunk = np.asarray(aalg)[row0: row0 + len(chunk)]
                    emit, pem = solve_emission(solver, chunk,
                                               nstoch=nstoch, aalg=a_chunk)
                    wr.put(sel(emit))
                    if wp is not None:
                        wp.put(sel(pem))
                else:
                    wr.put(sel(solve_emission(solver, chunk,
                                              nstoch=nstoch)))
                row0 += len(chunk)
        finally:
            if wr is not None:
                wr.close()
            if wp is not None:
                wp.close()
    return row0
