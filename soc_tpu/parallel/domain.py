"""Live spatial domain decomposition: grid slabs + ppermute halo exchange.

The reference's only domain coupling is the offline ROI photon file
(kernel_ASOC.c:469-505, 617-660: record boundary-crossing packets, re-inject
them in a second run). Here that becomes a LIVE exchange over the 'dp' mesh
axis: the root grid is split into Z-slabs, every device steps the packets
inside its slab, and packets crossing a slab face are packed into fixed-size
buffers and handed to the neighbor with ``lax.ppermute`` between stepping
super-steps -- communication rides ICI and overlaps with the next block of
local stepping that XLA schedules around it.

Key invariants:
  * RNG streams are the global (hi, lo) packet ids, and a packet carries its
    stream + draw counter across the exchange -- the random sequence each
    packet consumes is IDENTICAL to the single-device run, so domain
    decomposition changes results only through boundary-epsilon geometry.
  * Source ownership: every device evaluates the shared counter-based
    source for every packet id but keeps only the ids whose entry position
    falls in its slab; ids are owned by exactly one device.
  * Fixed shapes everywhere: emigrant buffers hold at most ``nlanes``
    packets per direction per super-step; a pending queue (capacity
    4*nlanes) absorbs arrivals that do not fit into free lanes immediately.
"""

from dataclasses import dataclass, field
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..constants import ADHOC, MAX_SCATTERINGS, PEPS, PHOTON_LIMIT, TAULIM
from ..grid import Grid, decode_link_np, encode_link_np, build_parents
from ..ops import traverse
from ..transport.propagate import _csc_lookup, _deflect
from ..transport.sources import background_entry, stream_hi_base
from .. import rng as socrng


@dataclass
class SlabSet:
    """Host-side container of S stacked slab grids (Z-decomposition)."""

    dens: np.ndarray        # [S, CELLS_PAD]
    lcells: np.ndarray      # [S, LEVELS]
    off: np.ndarray         # [LEVELS] shared (levels padded to max size)
    par: np.ndarray         # [S, CELLS_PAD]
    gidx: np.ndarray        # [S, CELLS_PAD] global cell index, -1 = padding
    nx: int = 0
    ny: int = 0
    nz: int = 0             # GLOBAL z extent
    nz_local: int = 0
    levels: int = 0
    cells_pad: int = 0
    n_slabs: int = 0


def split_grid_slabs(grid, n_slabs):
    """Split an octree grid into Z-slabs of nz/S root planes each.

    Slab boundaries align with root-cell planes, so every sub-octree is
    fully contained in one slab; child links are renumbered per slab.
    """
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    assert nz % n_slabs == 0, "NZ must divide the slab count"
    nzl = nz // n_slabs
    dens = np.asarray(grid.dens)
    off = np.asarray(grid.off)
    lcells = np.asarray(grid.lcells)
    levels = grid.levels

    per_slab = []       # per slab: list of (values, global_level_indices)
    for s in range(n_slabs):
        sel = np.arange(s * nx * ny * nzl, (s + 1) * nx * ny * nzl)
        level_vals = [dens[off[0] + sel].copy()]
        level_gidx = [off[0] + sel]
        for level in range(1, levels):
            vals_prev = level_vals[level - 1]
            parents = np.nonzero(vals_prev <= 0.0)[0]
            if len(parents) == 0:
                level_vals.append(np.zeros(0, np.float32))
                level_gidx.append(np.zeros(0, np.int64))
                continue
            first_old = decode_link_np(vals_prev[parents])
            child_old = (first_old[:, None]
                         + np.arange(8)[None, :]).reshape(-1)
            level_vals.append(dens[off[level] + child_old].copy())
            level_gidx.append(off[level] + child_old)
            # renumber: children of parent j occupy [8j, 8j+8)
            vals_prev[parents] = encode_link_np(8 * np.arange(len(parents)))
        per_slab.append((level_vals, level_gidx))

    # pad every level to the max size over slabs -> shared off[]
    max_l = [max(len(per_slab[s][0][l]) for s in range(n_slabs))
             for l in range(levels)]
    off_new = np.zeros(levels, np.int32)
    off_new[1:] = np.cumsum(max_l)[:-1]
    cells_pad = int(np.sum(max_l))
    dens_s = np.zeros((n_slabs, cells_pad), np.float32)
    lcells_s = np.zeros((n_slabs, levels), np.int32)
    par_s = np.full((n_slabs, cells_pad), -1, np.int32)
    gidx_s = np.full((n_slabs, cells_pad), -1, np.int32)
    max_l = np.asarray(max_l, np.int32)
    for s in range(n_slabs):
        level_vals, level_gidx = per_slab[s]
        lc = np.asarray([len(v) for v in level_vals], np.int32)
        lcells_s[s] = lc
        # padding cells carry a tiny positive density so they read as
        # (unreachable) leaves, never as child links
        flat = np.full(cells_pad, 1e-30, np.float32)
        for l in range(levels):
            flat[off_new[l]:off_new[l] + lc[l]] = level_vals[l]
            gidx_s[s, off_new[l]:off_new[l] + lc[l]] = level_gidx[l]
        dens_s[s] = flat
        par_s[s] = build_parents(flat, max_l, off_new, nx, ny, nzl)
    return SlabSet(dens=dens_s, lcells=lcells_s, off=off_new, par=par_s,
                   gidx=gidx_s, nx=nx, ny=ny, nz=nz, nz_local=nzl,
                   levels=levels, cells_pad=cells_pad, n_slabs=n_slabs)


# packet payload layout for the exchange buffers: 13 float32 words
# [pos3 | dir3 | photons | free_path | tau | stream | hi | counter | scat]
_PK = 13


def _pack(pos, dir, photons, free_path, tau, stream, hi, counter, scat):
    as_f = lambda x: lax.bitcast_convert_type(x, jnp.float32)
    return jnp.concatenate([
        pos, dir,
        photons[:, None], free_path[:, None], tau[:, None],
        as_f(stream)[:, None], as_f(hi)[:, None], as_f(counter)[:, None],
        as_f(scat.astype(jnp.uint32))[:, None]], axis=1)


def _unpack(buf):
    as_u = lambda x: lax.bitcast_convert_type(x, jnp.uint32)
    pos = buf[:, 0:3]
    dir = buf[:, 3:6]
    photons = buf[:, 6]
    free_path = buf[:, 7]
    tau = buf[:, 8]
    stream = as_u(buf[:, 9])
    hi = as_u(buf[:, 10])
    counter = as_u(buf[:, 11])
    scat = as_u(buf[:, 12]).astype(jnp.int32)
    return pos, dir, photons, free_path, tau, stream, hi, counter, scat


def domain_background_run(slabs, physics, bg_photons, total_packets, seed,
                          mesh, nlanes=1 << 10, k_inner=32,
                          max_super=1 << 20, hi_base=None):
    """Isotropic-background transport over Z-slab domains on the dp axis.

    physics : uniform-frequency dict (scalar kabs/ksca/tw, csc [BINS])
    Returns (tabs [GLOBAL CELLS] host order, escaped, lost) -- `lost` is
    the photon weight destroyed by pending-queue overflow (0 in any sane
    configuration; nonzero means nlanes is too small for the flux).

    Per-frequency callers pass hi_base = stream_hi_base("bg") + ifreq so
    every channel gets independent RNG streams; all per-frequency values
    (cross sections, photons, hi) are traced arguments of ONE cached
    jitted executable, so a frequency loop compiles exactly once.
    """
    hi = jnp.uint32(stream_hi_base("bg") if hi_base is None else hi_base)
    return _domain_call(
        slabs, physics, total_packets, seed, mesh, nlanes, k_inner,
        max_super, "bg", statics=(),
        src_values=(jnp.float32(bg_photons), hi))


def domain_cell_emission_run(slabs, physics, emit, per_cell, seed, mesh,
                             nlanes=1 << 10, k_inner=32,
                             max_super=1 << 20, hi_base=None):
    """Cell-emission transport (the iteration hot path, SimRAM_CL) over
    Z-slab domains: each device owns the packets born in its slab's cells
    and boundary crossings ride the same ppermute halo exchange.

    emit : [GLOBAL CELLS] photon weight per packet per cell, already
    divided by per_cell (the single-device simulate_cell_emission
    convention). Packet identity matches gen_cell: id k -> global flat
    cell k // per_cell, uniforms from counter slots 0-2, so tallies match
    the single-device run per packet.
    Returns (tabs [GLOBAL CELLS] host order, escaped, lost).
    """
    S = slabs.n_slabs
    hi = jnp.uint32(stream_hi_base("cell") if hi_base is None else hi_base)
    gcells = int(np.sum(np.asarray(slabs.lcells)))
    total_packets = per_cell * gcells
    # host-side inverse maps: global flat cell -> local flat cell per slab
    # (cached on the SlabSet: rebuilding per frequency is pure waste)
    inv = getattr(slabs, "_inv_cache", None)
    if inv is None:
        inv = np.full((S, gcells), -1, np.int32)
        for s in range(S):
            m = slabs.gidx[s] >= 0
            inv[s, slabs.gidx[s][m]] = np.nonzero(m)[0].astype(np.int32)
        slabs._inv_cache = inv
    return _domain_call(
        slabs, physics, total_packets, seed, mesh, nlanes, k_inner,
        max_super, "cell", statics=(int(per_cell), gcells),
        src_values=(jnp.asarray(np.asarray(emit, np.float32)), hi),
        extra_arrays=(jnp.asarray(inv),), extra_specs=(P("dp"),))


def domain_generator_run(slabs, physics, gen_name, params, total_packets,
                         seed, mesh, nlanes=1 << 10, k_inner=32,
                         max_super=1 << 20, hi_base=None):
    """Z-slab transport for any *surface/point* packet generator
    (point sources incl. all PS_METHODs, healpix background, ROI re-load).

    Entry states are geometry-only: the global generator is evaluated
    against a levels==1 dummy grid of the global dimensions (no density
    reads happen at level 0), each device keeps the ids whose entry
    position falls in its slab, and re-indexes them on its local slab
    octree. RNG identity matches the single-device per-frequency call
    (params gain ifreq=0 / hi_base=hi so hi equals base + channel).
    """
    params = dict(params)
    params["ifreq"] = jnp.int32(0)
    params["hi_base"] = jnp.uint32(stream_hi_base(gen_name)
                                   if hi_base is None else hi_base)
    return _domain_call(
        slabs, physics, total_packets, seed, mesh, nlanes, k_inner,
        max_super, "gen", statics=(gen_name, tuple(sorted(params))),
        src_values=(params, jnp.uint32(0)))


_RUNNER_CACHE = {}


def _domain_call(slabs, physics, total_packets, seed, mesh, nlanes,
                 k_inner, max_super, spawn_kind, statics, src_values,
                 extra_arrays=(), extra_specs=()):
    """Invoke the cached jitted Z-slab runner and assemble host tallies."""
    S = slabs.n_slabs
    assert mesh.shape["dp"] == S, "dp axis must equal the slab count"
    assert mesh.shape.get("freq", 1) == 1, "freq axis unused here"
    bins = physics["csc"].shape[-1]
    key = (spawn_kind, statics, S, slabs.nx, slabs.ny, slabs.nz,
           slabs.nz_local, slabs.levels, slabs.cells_pad,
           tuple(int(x) for x in slabs.off), nlanes, k_inner, max_super,
           bins, len(extra_specs), mesh)
    runner = _RUNNER_CACHE.get(key)
    if runner is None:
        runner = _build_domain_runner(slabs, mesh, nlanes, k_inner,
                                      max_super, spawn_kind, statics,
                                      tuple(extra_specs))
        _RUNNER_CACHE[key] = runner
    phys = (physics["kabs"], physics["ksca"], physics["tw"],
            physics["csc"])
    tabs_s, esc, lost = runner(
        jnp.asarray(slabs.dens), jnp.asarray(slabs.lcells),
        jnp.asarray(slabs.par), phys, tuple(src_values),
        jnp.int32(total_packets), jnp.uint32(seed), *extra_arrays)
    # assemble global tallies from per-slab local cells
    tabs_s = np.asarray(tabs_s).reshape(S, slabs.cells_pad)
    total_cells = int(np.sum(np.asarray(slabs.lcells)))
    tabs = np.zeros(total_cells, np.float32)
    for s in range(S):
        m = slabs.gidx[s] >= 0
        tabs[slabs.gidx[s][m]] = tabs_s[s][m]
    return tabs, float(np.asarray(esc)), float(np.asarray(lost))


def _build_domain_runner(slabs, mesh, nlanes, k_inner, max_super,
                         spawn_kind, statics, extra_specs):
    """Build the jitted shard_map superstep loop for one static config:
    lane pool + k_inner local steps + ppermute exchange, parameterized by
    the packet source (spawn_kind: "bg" | "cell"). Everything that varies
    per frequency (cross sections, photon weights, hi, seed, budget) is a
    traced argument."""
    from ..transport.sources import _isotropic_dir, _uniforms
    S = slabs.n_slabs
    nx, ny, nz, nzl = slabs.nx, slabs.ny, slabs.nz, slabs.nz_local
    levels, cells_pad = slabs.levels, slabs.cells_pad
    PCAP = 4 * nlanes
    fwd = [(i, (i + 1) % S) for i in range(S)]       # to upper neighbor
    bwd = [(i, (i - 1) % S) for i in range(S)]       # to lower neighbor
    off_l = np.asarray(slabs.off)
    off_c = jnp.asarray(slabs.off)

    def local_grid(dens_l, lcells_l, par_l):
        return Grid(dens=dens_l, lcells=lcells_l, off=off_c, par=par_l,
                    nx=nx, ny=ny, nz=nzl, levels=levels, cells=cells_pad)

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P("dp"), P("dp"), P("dp"),
                       (P(), P(), P(), P()), (P(), P()), P(), P())
                      + tuple(extra_specs),
             out_specs=(P("dp"), P(), P()), check_vma=False)
    def run(dens_s, lcells_s, par_s, phys, srcv, total_packets, seed,
            *extras):
        kabs, ksca, tw, csc = phys
        bins = csc.shape[-1]
        rank = lax.axis_index("dp")
        grid = local_grid(dens_s[0], lcells_s[0], par_s[0])

        if spawn_kind == "bg":
            bg_photons, hi = srcv

            def spawn_from_ids(ids, can):
                """Global source eval + slab-ownership filter."""
                stream = ids.astype(jnp.uint32)
                pos_g, dir = background_entry(nx, ny, nz, stream,
                                              jnp.full_like(stream, hi),
                                              seed)
                own = (jnp.floor(pos_g[:, 2] / nzl).astype(jnp.int32)
                       == rank)
                ok = can & own
                pos_l = pos_g.at[:, 2].add(-(rank * nzl)
                                           .astype(jnp.float32))
                pos_l = pos_l.at[:, 2].set(
                    jnp.clip(pos_l[:, 2], PEPS, nzl - PEPS))
                p, lev, ind = traverse.index_global(grid, pos_l)
                ind = jnp.where(ok, ind, -1)
                fp_u = socrng.uniform1(seed, stream,
                                       jnp.full_like(stream, 2),
                                       jnp.full_like(stream, hi))
                return (p, dir, lev, ind,
                        jnp.full(ids.shape, bg_photons, jnp.float32),
                        stream, jnp.full_like(stream, hi),
                        jnp.full_like(stream, 3),          # counter
                        jnp.zeros(ids.shape, jnp.int32),   # scatterings
                        -jnp.log(fp_u))
        elif spawn_kind == "gen":
            # generic geometry-only source: evaluate the global generator
            # on a levels==1 dummy grid (entry positions never read the
            # density at level 0), keep the slab's own ids, re-index on
            # the local octree
            from ..transport.sources import GENERATORS
            gen_name = statics[0]
            gen = GENERATORS[gen_name]
            params_t, _ = srcv
            dummy = Grid(dens=jnp.zeros(1, jnp.float32),
                         lcells=jnp.asarray([nx * ny * nz], jnp.int32),
                         off=jnp.zeros(1, jnp.int32),
                         par=jnp.zeros(1, jnp.int32),
                         nx=nx, ny=ny, nz=nz, levels=1, cells=nx * ny * nz)

            def spawn_from_ids(ids, can):
                nb = gen(dummy, ids, seed, params_t)
                own = (jnp.floor(nb.pos[:, 2] / nzl).astype(jnp.int32)
                       == rank)
                ok = can & own & (nb.ind >= 0)
                pos_l = nb.pos.at[:, 2].add(-(rank * nzl)
                                            .astype(jnp.float32))
                pos_l = pos_l.at[:, 2].set(
                    jnp.clip(pos_l[:, 2], PEPS, nzl - PEPS))
                p, lev, ind = traverse.index_global(grid, pos_l)
                ind = jnp.where(ok, ind, -1)
                fp_u = socrng.uniform1(seed, nb.stream,
                                       jnp.full_like(nb.stream, 2), nb.hi)
                return (p, nb.dir, lev, ind, nb.photons, nb.stream, nb.hi,
                        nb.counter, jnp.zeros(ids.shape, jnp.int32),
                        -jnp.log(fp_u))
        else:
            per_cell, gcells = statics
            emit_g, hi = srcv
            inv_l = extras[0][0]

            def spawn_from_ids(ids, can):
                stream = ids.astype(jnp.uint32)
                gcell = jnp.clip(ids // per_cell, 0, gcells - 1)
                lflat = inv_l[gcell]
                own = lflat >= 0
                ok = can & own
                lflat = jnp.maximum(lflat, 0)
                lev = jnp.zeros_like(lflat)
                for l in range(1, levels):
                    lev = jnp.where(lflat >= off_l[l], l, lev)
                loc = lflat - off_c[lev]
                u1, u2, u3, u4, u5, _ = _uniforms(
                    seed, stream, jnp.full_like(stream, hi))
                if levels == 1:
                    x0 = (loc % nx).astype(jnp.float32)
                    y0 = ((loc // nx) % ny).astype(jnp.float32)
                    z0 = (loc // (nx * ny)).astype(jnp.float32)
                else:
                    sid = loc % 8
                    rx = (loc % nx).astype(jnp.float32)
                    ry = ((loc // nx) % ny).astype(jnp.float32)
                    rz = (loc // (nx * ny)).astype(jnp.float32)
                    x0 = jnp.where(lev == 0, rx,
                                   (sid % 2).astype(jnp.float32))
                    y0 = jnp.where(lev == 0, ry,
                                   ((sid // 2) % 2).astype(jnp.float32))
                    z0 = jnp.where(lev == 0, rz,
                                   (sid // 4).astype(jnp.float32))
                pos = jnp.stack([x0 + u1, y0 + u2, z0 + u3], -1)
                dir = _isotropic_dir(u4, u5).astype(jnp.float32)
                photons = emit_g[gcell]
                ind = jnp.where(ok, loc.astype(jnp.int32), -1)
                fp_u = socrng.uniform1(seed, stream,
                                       jnp.full_like(stream, 2),
                                       jnp.full_like(stream, hi))
                return (pos, dir, lev.astype(jnp.int32), ind, photons,
                        stream, jnp.full_like(stream, hi),
                        jnp.full_like(stream, 3),
                        jnp.zeros(ids.shape, jnp.int32),
                        -jnp.log(fp_u))

        def step_once(st):
            (pos, dir, lev, ind, photons, stream, hi, counter, scat,
             free_path, tau, emig, tabs, esc, anc) = st
            alive = (ind >= 0) & (emig == 0)
            ci = jnp.clip(off_c[jnp.clip(lev, 0, levels - 1)]
                          + jnp.maximum(ind, 0), 0, cells_pad - 1)
            dens = grid.dens[ci]
            # deferred descent (see transport.propagate): a lane on a link
            # cell spends this step descending one level, ALU-only; it
            # consumes no RNG draw, so packet sequences are unchanged
            if levels > 1:
                is_link = alive & (dens <= 0.0)
                alive = alive & ~is_link
            else:
                is_link = jnp.zeros_like(alive)
            ds_local, pos_boundary = traverse.boundary_step(pos, dir)
            ds_gl = ds_local * jnp.exp2(-lev.astype(jnp.float32))
            tau_abs_full = ds_gl * dens * kabs
            dtau_sca = ds_gl * dens * ksca
            scatter_now = alive & (free_path < tau + dtau_sca)
            dx_gl = (free_path - tau) / jnp.maximum(ksca * dens, 1e-30)
            tau_abs_part = dx_gl * dens * kabs
            dx_local = jnp.maximum(
                0.0, dx_gl * jnp.exp2(lev.astype(jnp.float32))
                - 2.0 * PEPS)
            pos_scatter = pos + dx_local[:, None] * dir
            tau_abs = jnp.where(scatter_now, tau_abs_part, tau_abs_full)
            att = jnp.exp(-tau_abs)
            delta = jnp.where(tau_abs > TAULIM,
                              photons * (1.0 - att),
                              photons * tau_abs * (1.0 - 0.5 * tau_abs))
            didx = jnp.where(alive, ci, cells_pad)
            tabs = tabs.at[didx].add(delta * tw * ADHOC, mode="drop")
            photons = jnp.where(alive, photons * att, photons)

            u_fp, u_bin, u_phi = socrng.step_uniforms(seed, stream, counter,
                                                      hi)
            cos_theta = _csc_lookup(csc, jnp.zeros_like(ind), u_bin, bins)
            new_dir = _deflect(dir, cos_theta, (2.0 * jnp.pi) * u_phi)

            posx = jnp.where(alive[:, None], pos_boundary, pos)
            cross = alive & ~scatter_now
            npos, nlev, nind, anc = traverse.index_update_stack(
                grid, posx, lev, ind, anc, cross, descend=False)
            failed = cross & (nlev == lev) & (nind == ind)
            npos = jnp.where(failed[:, None], npos + PEPS * dir, npos)

            # slab-boundary crossing: exits via the Z faces with a live
            # neighbor become emigrants instead of escapes; exits via the
            # global X/Y faces always escape
            exited = cross & (nind < 0)
            out_xy = ((npos[:, 0] <= 0.0) | (npos[:, 0] >= nx)
                      | (npos[:, 1] <= 0.0) | (npos[:, 1] >= ny))
            z = npos[:, 2]
            go_up = exited & ~out_xy & (z >= 0.5 * nzl) & (rank < S - 1)
            go_dn = exited & ~out_xy & (z < 0.5 * nzl) & (rank > 0)
            new_emig = jnp.where(go_up, 1, jnp.where(go_dn, -1, 0))
            escaped_now = exited & (new_emig == 0)

            posm = jnp.where(scatter_now[:, None], pos_scatter, npos)
            levm = jnp.where(scatter_now, lev, nlev)
            indm = jnp.where(scatter_now, ind, nind)
            dirm = jnp.where(scatter_now[:, None], new_dir, dir)
            if levels > 1:
                posm, levm, indm, anc = traverse.descend_one(
                    grid, posm, levm, indm, anc, dens, is_link)
            scatm = scat + scatter_now.astype(jnp.int32)
            over = scatter_now & (scatm > MAX_SCATTERINGS)
            faint = alive & (jnp.abs(photons) < PHOTON_LIMIT)
            esc = esc + jnp.sum(jnp.where((escaped_now | over) & alive,
                                          photons, 0.0))
            indm = jnp.where(over | faint, -1, indm)
            free_path = jnp.where(scatter_now, -jnp.log(u_fp), free_path)
            tau = jnp.where(scatter_now, 0.0,
                            jnp.where(cross, tau + dtau_sca, tau))
            # advance the draw counter only when draws are CONSUMED (one
            # evaluation per scattering event) -- the same scheme as
            # transport_run's march/service split -- so a packet's random
            # sequence is identical to the single-device run even while
            # its lane idles before/after the exchange
            counter = counter + scatter_now.astype(jnp.uint32)
            emig = jnp.where(alive, new_emig, emig)
            # emigrant lanes freeze at the boundary position
            return (posm, dirm, levm, indm, photons, stream, hi, counter,
                    scatm, free_path, tau, emig, tabs, esc, anc)

        def superstep(carry):
            (it, pos, dir, lev, ind, photons, stream, hi, counter, scat,
             free_path, tau, emig, pend, pend_n, next_id, tabs, esc,
             lost, g_active) = carry

            # ---- drain pending queue into free lanes
            free = (ind < 0) & (emig == 0)
            fi = free.astype(jnp.int32)
            rankf = jnp.cumsum(fi) - fi
            take = free & (rankf < pend_n)
            slot = jnp.where(take, pend_n - 1 - rankf, 0)
            (ppos, pdir, pph, pfp, ptau, pstream, phi, pctr,
             pscat) = _unpack(pend[slot])
            p2, plev, pind = traverse.index_global(grid, ppos)
            pos = jnp.where(take[:, None], p2, pos)
            dir = jnp.where(take[:, None], pdir, dir)
            lev = jnp.where(take, plev, lev)
            ind = jnp.where(take, jnp.where(pind >= 0, pind, -1), ind)
            photons = jnp.where(take, pph, photons)
            free_path = jnp.where(take, pfp, free_path)
            tau = jnp.where(take, ptau, tau)
            stream = jnp.where(take, pstream, stream)
            hi = jnp.where(take, phi, hi)
            counter = jnp.where(take, pctr, counter)
            scat = jnp.where(take, pscat, scat)
            pend_n = pend_n - jnp.sum(take.astype(jnp.int32))

            # ---- refill remaining free lanes from the shared id budget
            free = (ind < 0) & (emig == 0)
            fi = free.astype(jnp.int32)
            rankf = jnp.cumsum(fi) - fi
            ids = next_id + rankf
            can = free & (ids < total_packets)
            (spos, sdir, slev, sind, sph, sstream, shi, sctr, sscat,
             sfp) = spawn_from_ids(jnp.where(can, ids, 0), can)
            pos = jnp.where(can[:, None], spos, pos)
            dir = jnp.where(can[:, None], sdir, dir)
            lev = jnp.where(can, slev, lev)
            ind = jnp.where(can, sind, ind)
            photons = jnp.where(can, sph, photons)
            stream = jnp.where(can, sstream, stream)
            hi = jnp.where(can, shi, hi)
            counter = jnp.where(can, sctr, counter)
            scat = jnp.where(can, sscat, scat)
            free_path = jnp.where(can, sfp, free_path)
            tau = jnp.where(can, 0.0, tau)
            next_id = next_id + jnp.sum(can.astype(jnp.int32))

            # ---- k_inner local steps (ancestor stack rebuilt once per
            # superstep: drained arrivals and refills just changed lanes)
            st = (pos, dir, lev, ind, photons, stream, hi, counter, scat,
                  free_path, tau, emig, tabs, esc,
                  traverse.stack_from_par(grid, lev, ind))
            st = lax.fori_loop(0, k_inner, lambda _, s: step_once(s), st)
            (pos, dir, lev, ind, photons, stream, hi, counter, scat,
             free_path, tau, emig, tabs, esc, _) = st

            # ---- pack + exchange emigrants (z shifted to neighbor frame)
            def pack_dirn(sign):
                sel = emig == sign
                si = sel.astype(jnp.int32)
                ranks = jnp.cumsum(si) - si
                slot = jnp.where(sel, ranks, nlanes)
                zshift = jnp.where(sign > 0, -float(nzl), float(nzl))
                posz = pos.at[:, 2].add(zshift)
                posz = posz.at[:, 2].set(
                    jnp.clip(posz[:, 2], PEPS, nzl - PEPS))
                payload = _pack(posz, dir, photons, free_path, tau,
                                stream, hi, counter, scat)
                buf = jnp.zeros((nlanes + 1, _PK), jnp.float32)
                buf = buf.at[slot].set(payload, mode="drop")
                return buf[:nlanes], jnp.sum(si)

            up_buf, n_up = pack_dirn(1)
            dn_buf, n_dn = pack_dirn(-1)
            ind = jnp.where(emig != 0, -1, ind)
            emig = jnp.zeros_like(emig)
            # ring permute; the wrap-around entries carry count 0
            r_up = lax.ppermute(up_buf, "dp", fwd)
            c_up = lax.ppermute(jnp.where(rank == S - 1, 0, n_up), "dp",
                                fwd)
            r_dn = lax.ppermute(dn_buf, "dp", bwd)
            c_dn = lax.ppermute(jnp.where(rank == 0, 0, n_dn), "dp", bwd)

            # ---- append arrivals to the pending queue; arrivals past the
            # queue capacity go to the OOB drop slot (index PCAP) rather
            # than clobbering slot PCAP-1 with a stale payload, and their
            # photon weight is charged to the `lost` counter so energy
            # non-conservation is VISIBLE to the caller (lost stays 0
            # unless a slab receives > 4*nlanes undrained arrivals)
            idx = pend_n + jnp.arange(nlanes)
            arr = jnp.arange(nlanes) < c_up
            okl = arr & (idx < PCAP)
            lost = lost + jnp.sum(jnp.where(arr & ~okl, r_up[:, 6], 0.0))
            pend = pend.at[jnp.where(okl, idx, PCAP)].set(r_up, mode="drop")
            pend_n = jnp.minimum(pend_n + c_up, PCAP)
            idx = pend_n + jnp.arange(nlanes)
            arr = jnp.arange(nlanes) < c_dn
            okl = arr & (idx < PCAP)
            lost = lost + jnp.sum(jnp.where(arr & ~okl, r_dn[:, 6], 0.0))
            pend = pend.at[jnp.where(okl, idx, PCAP)].set(r_dn, mode="drop")
            pend_n = jnp.minimum(pend_n + c_dn, PCAP)

            active = (jnp.any(ind >= 0) | (next_id < total_packets)
                      | (pend_n > 0))
            g_active = lax.psum(active.astype(jnp.int32), "dp")
            return (it + 1, pos, dir, lev, ind, photons, stream, hi,
                    counter, scat, free_path, tau, emig, pend, pend_n,
                    next_id, tabs, esc, lost, g_active)

        def cond(carry):
            return (carry[0] < max_super) & (carry[-1] > 0)

        n = nlanes
        carry = (jnp.int32(0),
                 jnp.zeros((n, 3), jnp.float32),                  # pos
                 jnp.full((n, 3), 1.0 / np.sqrt(3.0), jnp.float32),
                 jnp.zeros(n, jnp.int32),                         # lev
                 jnp.full(n, -1, jnp.int32),                      # ind
                 jnp.zeros(n, jnp.float32),                       # photons
                 jnp.zeros(n, jnp.uint32),                        # stream
                 jnp.zeros(n, jnp.uint32),                        # hi
                 jnp.zeros(n, jnp.uint32),                        # counter
                 jnp.zeros(n, jnp.int32),                         # scat
                 jnp.zeros(n, jnp.float32),                       # free_path
                 jnp.zeros(n, jnp.float32),                       # tau
                 jnp.zeros(n, jnp.int32),                         # emig
                 jnp.zeros((PCAP, _PK), jnp.float32),             # pend
                 jnp.int32(0),                                    # pend_n
                 jnp.int32(0),                                    # next_id
                 jnp.zeros(cells_pad, jnp.float32),               # tabs
                 jnp.float32(0.0),                                # esc
                 jnp.float32(0.0),                                # lost
                 jnp.int32(1))                                    # g_active
        carry = lax.while_loop(cond, superstep, carry)
        tabs = carry[16]
        esc = lax.psum(carry[17], "dp")
        lost = lax.psum(carry[18], "dp")
        return tabs[None, :], esc, lost

    return run
