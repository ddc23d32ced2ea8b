"""Dissect per-iteration cost of the transport loop on TPU."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from jax import lax
from soc_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from soc_tpu.grid import uniform_grid
from soc_tpu.io.dust import hg_scattering_function
from soc_tpu.ops import traverse
from soc_tpu import rng as socrng
from soc_tpu.transport.propagate import _deflect, _csc_lookup, PacketBatch
from soc_tpu.transport.sources import gen_background
from soc_tpu.constants import PEPS, TAULIM, MAX_SCATTERINGS, PHOTON_LIMIT

N = 16384
K = 200
grid = uniform_grid(64, 64, 64, density=1000.0)
_, csc = hg_scattering_function([0.5], 2500)
csc = jnp.asarray(csc[0])
params = dict(photons=jnp.float32(1.0), ifreq=jnp.int32(0),
              per_freq=jnp.int32(1 << 30), id_offset=jnp.int32(0))


@partial(jax.jit, static_argnames=("flags",))
def seg(tabs, b, free_path, tau, next_id, seed, flags):
    (do_refill, do_scatter, do_rng, do_idx, do_gen) = flags
    seed = jnp.uint32(seed)
    kabs = jnp.float32(1.3e-5)
    ksca = jnp.float32(1.2e-5)
    cells = grid.cells

    def body(_, st):
        b, free_path, tau, next_id, tabs = st
        if do_refill:
            dead = b.ind < 0
            deadi = dead.astype(jnp.int32)
            rank = jnp.cumsum(deadi) - deadi
            new_id = next_id + rank
            can = dead
            ids_local = jnp.where(can, new_id, 0)
            if do_gen:
                nb = gen_background(grid, ids_local, seed, params)
            else:
                nb = b
            canl = can[..., None]
            b = PacketBatch(
                pos=jnp.where(canl, nb.pos, b.pos),
                dir=jnp.where(canl, nb.dir, b.dir),
                level=jnp.where(can, nb.level, b.level),
                ind=jnp.where(can, nb.ind, b.ind),
                photons=jnp.where(can, nb.photons, b.photons),
                ifreq=b.ifreq, stream=jnp.where(can, nb.stream, b.stream),
                counter=jnp.where(can, nb.counter, b.counter),
                scatterings=jnp.where(can, 0, b.scatterings))
            free_path = jnp.where(can, 1.0, free_path)
            tau = jnp.where(can, 0.0, tau)
            next_id = next_id + jnp.sum(can.astype(jnp.int32))
        alive = b.ind >= 0
        gidx = jnp.clip(jnp.maximum(b.ind, 0), 0, cells - 1)
        dens = grid.dens[gidx]
        ds_local, pos_boundary = traverse.boundary_step(b.pos, b.dir)
        ds_gl = ds_local
        tau_abs_full = ds_gl * dens * kabs
        dtau_sca = ds_gl * dens * ksca
        scatter_now = alive & (free_path < tau + dtau_sca)
        dx_gl = (free_path - tau) / jnp.maximum(ksca * dens, 1e-30)
        tau_abs_part = dx_gl * dens * kabs
        dx_local = jnp.maximum(0.0, dx_gl - 2.0 * PEPS)
        pos_scatter = b.pos + dx_local[..., None] * b.dir
        tau_abs = jnp.where(scatter_now, tau_abs_part, tau_abs_full)
        att = jnp.exp(-tau_abs)
        delta = jnp.where(tau_abs > TAULIM, b.photons * (1.0 - att),
                          b.photons * tau_abs * (1.0 - 0.5 * tau_abs))
        if do_scatter:
            didx = jnp.where(alive, gidx, cells)
            tabs = tabs.at[didx].add(delta, mode="drop")
        photons = jnp.where(alive, b.photons * att, b.photons)
        if do_rng:
            u_bin, u_phi, u_fp, _ = socrng.uniform4(seed, b.stream, b.counter)
        else:
            u_bin = u_phi = u_fp = jnp.full(N, 0.5, jnp.float32)
        cos_theta = _csc_lookup(csc, b.ifreq, u_bin, 2500)
        new_dir = _deflect(b.dir, cos_theta, (2.0 * jnp.pi) * u_phi)
        posx = jnp.where(alive[..., None], pos_boundary, b.pos)
        cross = alive & ~scatter_now
        if do_idx:
            npos, nlevel, nind = traverse.index_update(
                grid, posx, b.level, b.ind, cross)
        else:
            npos, nlevel, nind = posx, b.level, b.ind
        pos = jnp.where(scatter_now[..., None], pos_scatter, npos)
        ind = jnp.where(scatter_now, b.ind, nind)
        dir = jnp.where(scatter_now[..., None], new_dir, b.dir)
        scat = b.scatterings + scatter_now.astype(jnp.int32)
        ind = jnp.where(scatter_now & (scat > MAX_SCATTERINGS), -1, ind)
        free_path = jnp.where(scatter_now, -jnp.log(u_fp), free_path)
        tau = jnp.where(scatter_now, 0.0,
                        jnp.where(cross, tau + dtau_sca, tau))
        nb = PacketBatch(pos=pos, dir=dir, level=nlevel, ind=ind,
                         photons=photons, ifreq=b.ifreq, stream=b.stream,
                         counter=b.counter + jnp.uint32(1),
                         scatterings=scat)
        return nb, free_path, tau, next_id, tabs

    st = lax.fori_loop(0, K, body, (b, free_path, tau, next_id, tabs))
    return st


def bench(flags, label):
    ids = jnp.arange(N, dtype=jnp.uint32)
    b = gen_background(grid, ids, jnp.uint32(1), params)
    fp = jnp.ones(N, jnp.float32)
    tau = jnp.zeros(N, jnp.float32)
    tabs = jnp.zeros(grid.cells, jnp.float32)
    st = seg(tabs, b, fp, tau, jnp.int32(N), 1, flags)
    jax.block_until_ready(st[0].pos)
    t0 = time.time()
    for _ in range(5):
        st = seg(st[4], st[0], st[1], st[2], st[3], 1, flags)
    jax.block_until_ready(st[0].pos)
    dt = (time.time() - t0) / (5 * K) * 1e6
    print("%-28s %8.1f us/iter" % (label, dt), flush=True)


bench((True, True, True, True, True), "full")
bench((False, True, True, True, True), "no refill")
bench((True, False, True, True, True), "no scatter")
bench((True, True, False, True, True), "no rng")
bench((True, True, True, False, True), "no index_update")
bench((True, True, True, True, False), "no source gen")
bench((False, False, False, False, False), "bare")
