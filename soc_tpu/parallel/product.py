"""Ini-driven multi-chip execution: the product path (`devices N`).

The round-2 sharded pipeline (parallel/mesh.py) could shard every phase but
was only reachable through a bespoke API. This module makes multi-chip the
PRODUCT path: one ini keyword (`devices N`) runs an ordinary ini -- every
source type, the re-emission iterations, and the per-frequency absorption
tallies -- sharded over a (dp, freq) device mesh with **no feature
exclusions**: ALI, emission weighting, packet splitting, mirror boundaries,
per-cell abundances (WITH_ABU/MSF), step/direction weighting, ROI save,
frequency masks and mid-run checkpoints all run sharded, because the
transport inside the shard is the *same* `transport_run` the single-device
driver uses -- sharding wraps it, it does not fork it.

Sharding layout
  * 'freq': frequency channels are blocked over this axis; each block owns
    NFREQ/F channels and their [CELLS, NFREQ/F] per-frequency tally shard,
    so absorbed.data never has to fit on one chip (reference mmap role,
    ASOC.py:623-638).
  * 'dp': each channel's packet budget is split over this axis by global
    id range. Every packet keeps the exact RNG stream of the single-device
    run (streams are keyed by (phase|iter|freq, in-freq index)), so the
    per-cell tallies match the single-device run allclose -- only the
    summation order differs.

The per-frequency tally is carried as a global [n_dp, CELLS, NFREQ] array
sharded P('dp', None, 'freq'): each device accumulates its partial rows
locally with zero communication per call; one reduction over the dp axis
at the end of the simulation phases produces the absorbed array. The
integrated tally (tabs) is psum'ed per call (it is [CELLS] -- cheap) so the
iteration logic on the host sees globally consistent heating.

Multi-host: the mesh is built over jax.devices() (ALL processes' devices
when jax.distributed is initialized -- see parallel/dist.py), dp-major so
the per-channel packet split rides DCN only once per call while the
frequency axis stays intra-host.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..transport.propagate import transport_run
from ..transport.sources import stream_hi_base


def _pool_lanes(nlanes, per_freq):
    n = min(nlanes, max(1024, per_freq))
    return 1 << (n - 1).bit_length() if n & (n - 1) else n


class ProductMesh:
    """(dp, freq) mesh for the ini-driven sharded pipeline.

    The freq axis gets the largest divisor of the device count that also
    divides NFREQ (tally memory scales 1/F and the per-group frequency loop
    shrinks by F); the rest becomes packet data-parallelism.
    """

    def __init__(self, n, nfreq, devices=None):
        if devices is None:
            devices = jax.devices()
        if n > len(devices):
            raise ValueError("devices %d: only %d visible"
                             % (n, len(devices)))
        devices = devices[:n]
        f = max(d for d in range(1, n + 1)
                if n % d == 0 and nfreq % d == 0)
        self.n_dp = n // f
        self.n_freq = f
        self.nfreq = nfreq
        self.nf_local = nfreq // f
        self.mesh = Mesh(np.asarray(devices).reshape(self.n_dp, f),
                         ("dp", "freq"))

    def globalize(self, x, spec=P()):
        """Host/process-local value -> global jax.Array under `spec`.

        Single-process: pass-through (XLA handles placement). Multi-host:
        every process holds the same full host value and materializes only
        its addressable shards (make_array_from_callback), which is what a
        multi-controller shard_map requires of its inputs. Python scalars
        and tuples pass through (identical jit constants everywhere)."""
        if x is None or jax.process_count() == 1 \
                or not isinstance(x, (np.ndarray, jax.Array, np.generic)):
            return x
        if isinstance(x, jax.Array) \
                and len(x.sharding.device_set) == self.mesh.devices.size:
            return x              # already a global array on this mesh
        arr = np.asarray(x)
        sh = NamedSharding(self.mesh, spec)
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    def globalize_tree(self, tree, spec=P()):
        import jax.tree_util as jtu
        return jtu.tree_map(lambda v: self.globalize(v, spec), tree)

    # ---- per-frequency tally representation ------------------------------
    def zeros_intf(self, cells, comps=0):
        """Global [n_dp, CELLS, NFREQ(, comps)] zeros, sharded so each
        (dp, freq) device owns its partial [CELLS, NFREQ/F] slab."""
        shape = (self.n_dp, cells, self.nfreq)
        spec = ("dp", None, "freq")
        if comps:
            shape += (comps,)
            spec += (None,)
        sharding = NamedSharding(self.mesh, P(*spec))
        return jnp.zeros(shape, jnp.float32, device=sharding)

    def reduce_intf(self, intf):
        """dp-partial tallies -> one [CELLS, NFREQ(, comps)] array.
        Multi-host: replicated output so every process can read it."""
        if jax.process_count() > 1:
            spec = P()
        else:
            spec = (P(None, "freq") if intf.ndim == 3
                    else P(None, "freq", None))
        out = NamedSharding(self.mesh, spec)
        return jax.jit(lambda x: jnp.sum(x, axis=0),
                       out_shardings=out)(intf)

    def scatter_intf(self, intf_np):
        """Host [CELLS, NFREQ(, comps)] -> dp slab 0 (partial sums stay
        correct: the other slabs are zero). Used by checkpoint resume."""
        intf_np = np.asarray(intf_np, np.float32)
        full = np.zeros((self.n_dp,) + intf_np.shape, np.float32)
        full[0] = intf_np
        spec = P(*(("dp", None, "freq") + (None,) * (intf_np.ndim - 2)))
        sh = NamedSharding(self.mesh, spec)
        if jax.process_count() > 1:
            return jax.make_array_from_callback(full.shape, sh,
                                                lambda idx: full[idx])
        return jax.device_put(full, sh)


def _split_stack(dicts):
    """Per-channel param/physics dicts -> (replicated, stacked-[F]) split.

    A leaf that is the SAME object for every channel (e.g. the abundance
    table, point-source positions) or an equal plain Python value (tuples
    like roi_box/roi_dim that generators unpack statically) is passed
    replicated; per-channel leaves are stacked on a leading [F] axis and
    sharded over 'freq'."""
    rep, stk = {}, {}
    for k in dicts[0].keys():
        vals = [d[k] for d in dicts]
        if all(v is None for v in vals):
            rep[k] = None
        elif all(v is vals[0] for v in vals[1:]):
            rep[k] = vals[0]
        elif (not isinstance(vals[0], (np.ndarray, jax.Array))
              and all(v == vals[0] for v in vals[1:])):
            rep[k] = vals[0]
        else:
            stk[k] = jnp.stack([jnp.asarray(v) for v in vals])
    return rep, stk


def solve_temperature(pm, grid, table, emit_total, gl_cm, beta=1.0,
                      cr_heating=0.0):
    """Equilibrium T solve with cells sharded over the whole mesh
    (ALI beta supported). Returns temperature [CELLS] (replicated)."""
    from ..solve.equilibrium import cell_levels, temperature_lookup
    mesh = pm.mesh
    ndev = mesh.devices.size
    cells = grid.cells
    pad = (-cells) % ndev
    lev = jnp.pad(cell_levels(grid), (0, pad))
    dens = jnp.pad(grid.dens, (0, pad))
    tabs = jnp.pad(jnp.asarray(emit_total), (0, pad))
    beta_arr = jnp.pad(jnp.broadcast_to(
        jnp.asarray(beta, jnp.float32), (cells,)), (0, pad),
        constant_values=1.0)

    @partial(shard_map, mesh=mesh, in_specs=P(("dp", "freq")),
             out_specs=P(("dp", "freq")), check_vma=False)
    def solve(tabs_l, dens_l, lev_l, beta_l):
        return temperature_lookup(table, tabs_l, dens_l, lev_l, gl_cm,
                                  beta=beta_l, cr_heating=cr_heating)

    spec = P(("dp", "freq"))
    t = solve(pm.globalize(tabs, spec), pm.globalize(dens, spec),
              pm.globalize(lev, spec), pm.globalize(beta_arr, spec))
    if jax.process_count() > 1:
        t = jax.jit(lambda x: x,
                    out_shardings=NamedSharding(mesh, P()))(t)
    return t[:cells]


def emission(pm, freq, abs_gl, temperature, gl_cm):
    """Thermal emission [CELLS, NFREQ] with cells sharded over the mesh."""
    from ..solve.equilibrium import emission as emission_1dev
    mesh = pm.mesh
    ndev = mesh.devices.size
    cells = temperature.shape[0]
    pad = (-cells) % ndev
    t = jnp.pad(jnp.asarray(temperature), (0, pad))
    freq = jnp.asarray(freq, jnp.float32)
    abs_gl = jnp.asarray(abs_gl, jnp.float32)

    @partial(shard_map, mesh=mesh, in_specs=P(("dp", "freq")),
             out_specs=P(("dp", "freq"), None), check_vma=False)
    def emit(t_l):
        return emission_1dev(freq, abs_gl, t_l, gl_cm)

    e = emit(pm.globalize(t, P(("dp", "freq"))))
    if jax.process_count() > 1:
        e = jax.jit(lambda x: x,
                    out_shardings=NamedSharding(mesh, P()))(e)
    return e[:cells]


def _make_group_fn(pm, grid, kind, nlanes, per_freq_tally, mirror_mask,
                   split_max, with_ali, roi_nside, intf_rank):
    """One traced (dp x freq)-sharded transport call over a channel group:
    device column fq runs channel fq*nf_local + fl with its packet-budget
    slice over dp. Reused for every group of a source (fl and all params
    are traced values), so one compile covers the whole frequency loop."""
    mesh = pm.mesh
    n_dp = pm.n_dp

    if per_freq_tally:
        intf_spec = P(*(("dp", None, "freq") + (None,) * (intf_rank - 3)))
    else:
        intf_spec = P()        # (1, 1) dummy: replicated pass-through
    in_specs = (P(), intf_spec, P(),          # tabs, intf slab, xab
                P(), P("freq"),               # rep/stacked physics
                P(), P("freq"),               # rep/stacked params
                P("freq"), P(), P(),          # totals, fl, seed
                P("freq"))                    # roi rows
    out_specs = (P(), intf_spec, P(),         # tabs, intf, xab
                 P(), P(),                    # esc [F], absd [F] replicated
                 P())                         # roi rows [F, M] replicated

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
             check_vma=False)
    def fn(tabs, intf_slab, xab, phys_rep, phys_stk, par_rep, par_stk,
           totals, fl, seed, roi_rows):
        dp = lax.axis_index("dp")
        total = totals[0]
        q, r = total // n_dp, total % n_dp
        my = q + (dp < r).astype(total.dtype)
        k0 = (dp * q + jnp.minimum(dp, r)).astype(jnp.uint32)
        physics = dict(phys_rep)
        physics.update({k: v[0] for k, v in phys_stk.items()})
        params = dict(par_rep)
        params.update({k: v[0] for k, v in par_stk.items()})
        params["ifreq"] = fl.astype(jnp.int32)   # local tally column
        params["k0"] = params.get("k0", jnp.uint32(0)) + k0
        kwargs = {}
        if with_ali:
            kwargs = dict(with_ali=True, xab=jnp.zeros_like(xab))
        if roi_nside:
            kwargs.update(roi_nside=roi_nside,
                          roi_tally=jnp.zeros_like(roi_rows[0]))
        intf_local = intf_slab[0] if per_freq_tally else intf_slab
        out = transport_run(
            grid, physics, params, my.astype(jnp.int32),
            jnp.zeros_like(tabs), intf_local, seed,
            source_kind=kind, nlanes=nlanes,
            per_freq_tally=per_freq_tally, mirror_mask=mirror_mask,
            split_max=split_max, **kwargs)
        dtabs, intf_new, esc, absd = out[:4]
        rest = list(out[4:])
        tabs = tabs + lax.psum(dtabs, ("dp", "freq"))
        if with_ali:
            xab = xab + lax.psum(rest.pop(0), ("dp", "freq"))
        if roi_nside:
            roi_rows = (roi_rows
                        + lax.psum(rest.pop(0), "dp")[None, :])
        # small per-channel outputs come back replicated (all_gather over
        # freq after the dp psum) so every process can read them directly
        esc = lax.all_gather(lax.psum(esc, "dp"), "freq", axis=0,
                             tiled=True)                  # [F]
        absd = lax.all_gather(lax.psum(absd.reshape(1), "dp"), "freq",
                              axis=0, tiled=True)         # [F]
        roi_rows = lax.all_gather(roi_rows, "freq", axis=0, tiled=True)
        intf_out = intf_new[None] if per_freq_tally else intf_new
        return (tabs, intf_out, xab, esc, absd, roi_rows)

    return fn


def run_freqs(pm, grid, medium, kind, make_params, per_freq_of, tabs, intf,
              seed, lanes, per_freq_tally, phase=None, iteration=0,
              mirror_mask=0, split_max=0, freq_mask=None, roi=None,
              physics_extra=None, with_ali=False, xab=None,
              ckpt=None, ckpt_key=""):
    """Sharded mirror of driver._run_over_freqs: channel groups of size F
    run concurrently over the freq axis, each dp-split by global id.

    per_freq_of : int, or callable(ifreq) -> int for per-channel budgets
        (emission weighting); masked channels get budget 0.
    Returns (tabs, intf, escaped[NFREQ], absorbed[NFREQ], xab|None).
    """
    import os
    import sys
    import time
    nfreq = medium.nfreq
    F, L = pm.n_freq, pm.nf_local
    hi0 = int(stream_hi_base(phase or kind, iteration))
    budget = (per_freq_of if callable(per_freq_of)
              else (lambda _i: per_freq_of))
    esc_list = np.zeros(nfreq)
    abs_list = np.zeros(nfreq)
    mask = (np.ones(nfreq, bool) if freq_mask is None
            else np.asarray(freq_mask, bool))
    budgets = np.asarray([budget(i) if mask[i] else 0
                          for i in range(nfreq)], np.int64)
    if budgets.max() <= 0:
        return tabs, intf, esc_list, abs_list, xab
    nlanes = _pool_lanes(lanes, int(-(-budgets.max() // pm.n_dp)))
    roi_nside = 0 if roi is None else int(roi["nside"])
    if xab is None and with_ali:
        xab = jnp.zeros(grid.cells, jnp.float32)
    xab_c = xab if with_ali else jnp.zeros(1, jnp.float32)
    fn = _make_group_fn(pm, grid, kind, nlanes, per_freq_tally,
                        mirror_mask, split_max, with_ali, roi_nside,
                        intf.ndim)
    progress = os.environ.get("SOC_TPU_PROGRESS", "0") != "0"
    t_loop = time.time()
    for fl in range(L):
        gfreqs = [fq * L + fl for fq in range(F)]
        live = [g for g in gfreqs if mask[g] and budgets[g] > 0]
        if not live:
            continue
        keys = ["%s/f%d" % (ckpt_key, g) for g in live]
        if ckpt is not None and all(ckpt.completed(k) for k in keys):
            for g, k in zip(live, keys):
                esc_list[g] = ckpt.esc_of(k)
            continue
        if progress:
            print("  [%s x%d dev] group %d/%d  t=%.1fs"
                  % (kind, pm.mesh.devices.size, fl + 1, L,
                     time.time() - t_loop), file=sys.stderr, flush=True)
        donor = live[0]
        plist, phys_list = [], []
        for g in gfreqs:
            src = g if (mask[g] and budgets[g] > 0) else donor
            p = dict(make_params(src))
            p["per_freq"] = jnp.int32(max(1, budgets[src]))
            # hi = hi_base + local column fl must equal hi0 + global g
            p["hi_base"] = jnp.uint32(hi0 + src - fl)
            plist.append(p)
            ph = dict(kabs=medium.abs_gl[src], ksca=medium.sca_gl[src],
                      csc=medium.csc[src], tw=medium.tw[src])
            if physics_extra is not None:
                ph.update(physics_extra(src))
            if roi is not None:
                ph.update(roi_mask=roi["mask"], roi_box=roi["box"],
                          roi_dim=roi["dim"])
            phys_list.append(ph)
        par_rep, par_stk = _split_stack(plist)
        phys_rep, phys_stk = _split_stack(phys_list)
        totals = jnp.asarray([budgets[g] if mask[g] else 0
                              for g in gfreqs], jnp.int32)
        if roi is not None:
            roi_rows = jnp.asarray(
                np.stack([roi["tally"][g] for g in gfreqs]))
        else:
            roi_rows = jnp.zeros((F, 1), jnp.float32)
        tabs, intf, xab_c, esc_g, absd_g, roi_out = fn(
            pm.globalize(tabs), intf, pm.globalize(xab_c),
            pm.globalize_tree(phys_rep), pm.globalize_tree(phys_stk,
                                                           P("freq")),
            pm.globalize_tree(par_rep), pm.globalize_tree(par_stk,
                                                          P("freq")),
            pm.globalize(totals, P("freq")), pm.globalize(jnp.int32(fl)),
            pm.globalize(jnp.uint32(seed)),
            pm.globalize(roi_rows, P("freq")))
        esc_np = np.asarray(esc_g)
        absd_np = np.asarray(absd_g)
        if roi is not None:
            roi_np = np.asarray(roi_out)
        for i, g in enumerate(gfreqs):
            if mask[g] and budgets[g] > 0:
                esc_list[g] = float(esc_np[i])
                abs_list[g] = float(absd_np[i])
                if roi is not None:
                    roi["tally"][g] = roi_np[i]
        if ckpt is not None:
            # ONE atomic record for the whole group: the snapshot holds
            # every live channel's deposits, so the persisted done-list
            # must gain all the group's keys together or none (a per-key
            # loop would double-count the group on a mid-loop preemption)
            intf_red = pm.reduce_intf(intf) if per_freq_tally else intf
            ckpt.record_many(keys, [esc_list[g] for g in live],
                             tabs, intf_red,
                             roi=None if roi is None else roi["tally"])
    return tabs, intf, esc_list, abs_list, (xab_c if with_ali else xab)
