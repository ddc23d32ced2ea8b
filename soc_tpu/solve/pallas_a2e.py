"""Fused Pallas TPU kernel for the A2E stochastic-heating solve.

The XLA formulation in ``stochastic.solve_batch`` is correct but
latency-bound: the forward substitution is NE sequential [batch, NE]
einsums, each a separate HBM-roundtrip dispatch, and the [batch, NE*NE]
heating matrix (1 GB at batch 16384, NE 128) is materialized to HBM
between the matmul, the fold and the substitution.  Measured on v5e the
whole solve runs ~30x above its HBM-traffic floor.

This kernel fuses the solve (heating matmul -> forward substitution ->
emission matmul) over a tile of cells, keeping the tile's heating matrix
and populations resident in VMEM for the entire solve; the
[batch, NE*NE] intermediate never exists in HBM and the NE substitution
steps run back-to-back in the VPU with no dispatch gaps.

Two layout decisions carry the kernel:

* the fold  S[j] = sum_{u>=j} A[u]  (kernel_A2E.c:72-77) is linear in the
  heating weights, so it is pre-applied to the weight matrix on the host
  (``stochastic.prepare_size_arrays_fused``, float64) and the device
  matmul yields the folded matrix directly -- no per-cell cumulative sum;
* everything is computed transposed, cells on the VPU *lane* axis and
  energy bins on sublanes: the per-row dot  B[j] . x  then reduces across
  sublanes (a handful of vector adds) instead of across lanes (a 7-stage
  shuffle tree) -- the substitution is the serial critical path, so this
  is the difference between ~1 us and ~0.2 us per row.

Math (same as kernel_A2E.c:2-104; see stochastic.py for the derivation):

  1. S[c, j*NE+l] = sum_f ABS[c, f] * W'[f, j*NE+l]     (one MXU matmul;
     W'[f, j, l] = sum_{u>=j} W[f, u, l] precomputed in float64)
  2. B[j] = S[j] - S[NE-1] for j < NE-1, B[NE-1] = S[NE-1]
     (the bottom row is its own reverse cumsum)
  3. x_j = clip(B[j] . x / tdown_j, 0, 3e37) with the progressive 1e-20
     overflow rescale of kernel_A2E.c:80-89
  4. EMIT[c, f] = sum_i EA[f, i] * x_i / sum(x)         (one MXU matmul)

The kernel requires NE to be a multiple of 128 (the j-row dynamic slices
then start on hardware tile boundaries); other shapes fall back to the
XLA path in ``stochastic.solve_batch``.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _a2e_kernel(abs_ref, w_ref, td_ref, ea_ref, out_ref, a_ref, *,
                ne, tile):
    f32 = jnp.float32
    # 1.+2. folded heating matrix, transposed: [NE*NE, TB], VMEM-resident
    a_ref[...] = lax.dot_general(
        w_ref[...], abs_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=f32, precision=lax.Precision.HIGHEST)

    # bottom row: S[NE-1] == A[NE-1] (its own reverse cumsum)
    bottom = a_ref[pl.ds((ne - 1) * ne, ne), :]        # [NE, TB]

    # 3. forward substitution with overflow rescale.  The loop is the
    # serial critical path: tdown sits in SMEM (scalar dynamic loads),
    # the special bottom row is hoisted out of the loop, and two rows are
    # retired per trip to amortize the loop overhead.
    iota_s = lax.broadcasted_iota(jnp.int32, (ne, tile), 0)
    x0 = jnp.where(iota_s == 0, f32(1.0e-20), f32(0.0))   # [NE, TB]

    def one_row(j, x, brow):
        # x[i >= j, :] is still zero, so the triangular mask is implicit
        s_j = jnp.sum(brow * x, axis=0)                # [TB] sublane reduce
        td_j = td_ref[0, j] + f32(1.0e-30)
        x_j = jnp.clip(s_j / td_j, 0.0, 3.0e37)
        scale = jnp.where(x_j > 1.0e20, f32(1.0e-20), f32(1.0))
        x = x * scale[None, :]
        return jnp.where(iota_s == j, (x_j * scale)[None, :], x)

    def two_rows(k, x):
        j = 1 + 2 * k
        off = pl.multiple_of(j * ne, 128)
        x = one_row(j, x, a_ref[pl.ds(off, ne), :] - bottom)
        off2 = pl.multiple_of((j + 1) * ne, 128)
        return one_row(j + 1, x, a_ref[pl.ds(off2, ne), :] - bottom)

    x = lax.fori_loop(0, (ne - 2) // 2, two_rows, x0)
    x = one_row(ne - 1, x, bottom)

    # 4. normalize + emission (transposed): [F, NE] @ [NE, TB]
    x = x / jnp.maximum(jnp.sum(x, axis=0, keepdims=True), 1e-35)
    out_ref[...] = jnp.dot(ea_ref[...], x, preferred_element_type=f32,
                           precision=lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("ne", "tile", "interpret"))
def solve_batch_fused(w_t, tdown, ea, absorbed, ne, tile=128,
                      interpret=False):
    """Drop-in fused equivalent of ``stochastic.solve_batch``.

    w_t      : [NFREQ, NE*NE] folded heating weights from
               ``prepare_size_arrays_fused`` (AF and the u-cumsum folded)
    tdown    : [NE] cooling rates
    ea       : [NFREQ, NE] emission array (Ibeg-masked, natural layout)
    absorbed : [batch, NFREQ]; batch must be a multiple of ``tile``
    Returns EMIT [batch, NFREQ].
    """
    batch, nfreq = absorbed.shape
    assert ne % 128 == 0 and batch % tile == 0
    grid = (batch // tile,)
    kernel = partial(_a2e_kernel, ne=ne, tile=tile)
    out_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nfreq, tile), lambda i: (0, i)),
            pl.BlockSpec((nfreq, ne * ne), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nfreq, ne), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nfreq, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((nfreq, batch), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ne * ne, tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(absorbed.T, w_t, tdown.reshape(1, ne), ea)
    return out_t.T


@partial(jax.jit, static_argnames=("ne", "tile", "interpret"))
def solve_chunk_all_sizes(w_stack, td_stack, ea_stack, chunk, align,
                          ne, tile=128, interpret=False):
    """Solve one cell chunk for every stochastic grain size on-device.

    One dispatch per chunk: scans the fused kernel over the size axis and
    accumulates total (and alignment-weighted, for polarized emission)
    emission without any intermediate host transfer -- on a tunneled TPU
    the per-size host round-trips would otherwise dominate the solve.

    w_stack/td_stack/ea_stack : per-size arrays stacked on axis 0
    chunk : [batch, NFREQ] absorbed photons
    align : [NSIZE, batch] per-size aligned fraction (zeros when unused)
    Returns (EMIT [batch, NFREQ], PEMIT [batch, NFREQ]).
    """

    def body(carry, xs):
        tot, ptot = carry
        w_t, td, ea, al = xs
        em = solve_batch_fused(w_t, td, ea, chunk, ne, tile=tile,
                               interpret=interpret)
        return (tot + em, ptot + em * al[:, None]), 0.0

    zero = jnp.zeros_like(chunk)
    (tot, ptot), _ = lax.scan(body, (zero, zero),
                              (w_stack, td_stack, ea_stack, align))
    return tot, ptot


@partial(jax.jit, static_argnames=("ne", "tile", "interpret"))
def solve_all_chunks(w_stack, td_stack, ea_stack, chunks, align, ne,
                     tile=128, interpret=False):
    """Solve a whole superbatch of cell chunks in ONE dispatch.

    On the tunneled TPU the per-chunk jnp.asarray / np.asarray pair of
    ``solve_chunk_all_sizes`` costs more than the solve itself; this runner
    takes [nchunk, batch, NFREQ] absorbed and [nchunk, NSIZE, batch]
    alignment in one transfer, scans the chunks on-device, and returns
    (tot, ptot) with the same leading chunk axis for one readback.
    Pass align=None to skip the polarized accumulator entirely (halves
    the readback volume; the host link is the bottleneck of the solve).
    VMEM/HBM working set stays one chunk (lax.map is a scan).
    """
    if align is None:
        def one(chunk):
            def body(tot, xs):
                w_t, td, ea = xs
                em = solve_batch_fused(w_t, td, ea, chunk, ne, tile=tile,
                                       interpret=interpret)
                return tot + em, 0.0
            tot, _ = lax.scan(body, jnp.zeros_like(chunk),
                              (w_stack, td_stack, ea_stack))
            return tot
        return lax.map(one, chunks), None

    def one(xs):
        chunk, al = xs
        return solve_chunk_all_sizes(w_stack, td_stack, ea_stack, chunk,
                                     al, ne, tile=tile, interpret=interpret)

    return lax.map(one, (chunks, align))


def solve_all_chunks_sharded(w_stack, td_stack, ea_stack, chunks, align,
                             ne, tile=128, interpret=False, devices=None):
    """Multi-chip A2E: the chunk axis sharded over all visible devices.

    The cell solve is embarrassingly parallel (SURVEY 2.4), so the mesh is
    one flat 'cells' axis; the per-size solver arrays are replicated (a
    few MB) and each device scans its own chunks -- zero collectives.
    chunks [nchunk, batch, NFREQ] with nchunk a multiple of the device
    count (callers pad with zero chunks and drop the padded rows).
    Returns (tot, ptot) sharded the same way; per-chunk results are
    bit-identical to the single-device solve_all_chunks.
    """
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    if devices is None:
        # addressable devices only: a multi-controller mesh would need
        # globalized inputs (jax.make_array_from_callback), which the
        # host-local chunk batches here are not
        devices = jax.local_devices()
    mesh = Mesh(np.asarray(devices), ("cells",))
    assert chunks.shape[0] % len(devices) == 0, \
        "pad nchunk to a multiple of the device count"
    if align is None:
        @partial(shard_map, mesh=mesh, in_specs=(P(), P(), P(), P("cells")),
                 out_specs=P("cells"), check_vma=False)
        def run(w, td, ea, ch):
            return solve_all_chunks(w, td, ea, ch, None, ne, tile=tile,
                                    interpret=interpret)[0]
        return run(w_stack, td_stack, ea_stack, chunks), None

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P("cells"), P("cells")),
             out_specs=(P("cells"), P("cells")), check_vma=False)
    def run2(w, td, ea, ch, al):
        return solve_all_chunks(w, td, ea, ch, al, ne, tile=tile,
                                interpret=interpret)

    return run2(w_stack, td_stack, ea_stack, chunks, align)
