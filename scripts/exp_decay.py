"""Experiment: alive-lane decay and per-iteration cost of the transport loop."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
from functools import partial
from soc_tpu.grid import uniform_grid
from soc_tpu.io.dust import hg_scattering_function
from soc_tpu.transport.medium import Medium, trapezoid_weights
from soc_tpu.transport import sources
from soc_tpu.ops import traverse
from soc_tpu import rng as socrng
from soc_tpu.transport.propagate import sample_scatter_dir, PacketBatch

grid = uniform_grid(64, 64, 64, density=1000.0)
nf = 44
freq = np.logspace(11, 15, nf)
dsc, csc = hg_scattering_function(np.linspace(0, 0.6, nf), 2500)
medium = Medium(abs_gl=jnp.asarray(np.full(nf, 1.3e-5, np.float32)),
                sca_gl=jnp.asarray(np.full(nf, 1.2e-5, np.float32)),
                csc=jnp.asarray(csc), dsc=jnp.asarray(dsc),
                tw=jnp.asarray(trapezoid_weights(freq)), nfreq=nf, bins=2500)
n = 1 << 17
ids = jnp.arange(n, dtype=jnp.uint32)
ifreq = (ids % nf).astype(jnp.int32)
bg = jnp.ones(nf, jnp.float32)
batch = sources.background_packets(grid, ids, ifreq, bg, 1)


@partial(jax.jit, static_argnames=('k', 'do_scatter'))
def segment(grid, medium, b, fp, tau, tabs, seed, k=100, do_scatter=True):
    seed = jnp.uint32(seed)

    def body(i, st):
        b, free_path, tau, tabs = st
        alive = b.ind >= 0
        gidx = jnp.clip(grid.off[jnp.clip(b.level, 0, grid.levels - 1)]
                        + jnp.maximum(b.ind, 0), 0, grid.cells - 1)
        dens = grid.dens[gidx]
        kabs = medium.abs_gl[b.ifreq]
        ksca = medium.sca_gl[b.ifreq]
        ds_local, pos_b = traverse.boundary_step(b.pos, b.dir)
        ds_gl = ds_local * jnp.exp2(-b.level.astype(jnp.float32))
        tauA = ds_gl * dens * kabs
        dtau = ds_gl * dens * ksca
        scatter_now = alive & (free_path < tau + dtau)
        dx_gl = (free_path - tau) / jnp.maximum(ksca * dens, 1e-30)
        tauAp = dx_gl * dens * kabs
        dxl = jnp.maximum(0.0, dx_gl * jnp.exp2(b.level.astype(jnp.float32)) - 2e-4)
        pos_s = b.pos + dxl[..., None] * b.dir
        ta = jnp.where(scatter_now, tauAp, tauA)
        att = jnp.exp(-ta)
        delta = jnp.where(ta > 5e-4, b.photons * (1 - att),
                          b.photons * ta * (1 - 0.5 * ta))
        delta = jnp.where(alive, delta, 0.0)
        if do_scatter:
            tabs = tabs.at[gidx].add(delta * medium.tw[b.ifreq])
        photons = jnp.where(alive, b.photons * att, b.photons)
        u1, u2, u3, _ = socrng.uniform4(seed, b.stream, b.counter)
        ndir = sample_scatter_dir(medium, b.dir, b.ifreq, u1, u2)
        posx = jnp.where(alive[..., None], pos_b, b.pos)
        cross = alive & ~scatter_now
        npos, nlev, nind = traverse.index_update(grid, posx, b.level, b.ind, cross)
        pos = jnp.where(scatter_now[..., None], pos_s, npos)
        level = jnp.where(scatter_now, b.level, nlev)
        ind = jnp.where(scatter_now, b.ind, nind)
        dir = jnp.where(scatter_now[..., None], ndir, b.dir)
        scat = b.scatterings + scatter_now.astype(jnp.int32)
        ind = jnp.where(scatter_now & (scat > 20), -1, ind)
        free_path = jnp.where(scatter_now, -jnp.log(u3), free_path)
        tau = jnp.where(scatter_now, 0.0, jnp.where(cross, tau + dtau, tau))
        nb = PacketBatch(pos=pos, dir=dir, level=level, ind=ind,
                         photons=photons, ifreq=b.ifreq, stream=b.stream,
                         counter=b.counter + jnp.uint32(1), scatterings=scat)
        return nb, free_path, tau, tabs
    return jax.lax.fori_loop(0, k, body, (b, fp, tau, tabs))


u0, _ = socrng.uniform2(jnp.uint32(1), batch.stream, batch.counter)
fp = -jnp.log(u0)
tau = jnp.zeros(n, jnp.float32)
tabs = jnp.zeros(grid.cells, jnp.float32)
st = (batch, fp, tau, tabs)
t0 = time.time()
st = segment(grid, medium, *st, 1, k=100)
jax.block_until_ready(st[0].pos)
print('compile+first100: %.1fs' % (time.time() - t0), flush=True)
alive_hist = []
t0 = time.time()
for r in range(10):
    st = segment(grid, medium, *st, 1, k=100)
    alive_hist.append(int((st[0].ind >= 0).sum()))
jax.block_until_ready(st[0].pos)
dt = time.time() - t0
print('10x100 iters: %.2fs  -> %.3f ms/iter' % (dt, dt), flush=True)
print('alive after each 100:', alive_hist, flush=True)

st2 = (batch, fp, tau, tabs)
t0 = time.time()
st2 = segment(grid, medium, *st2, 1, k=100, do_scatter=False)
jax.block_until_ready(st2[0].pos)
print('compile noscatter: %.1fs' % (time.time() - t0), flush=True)
t0 = time.time()
for r in range(5):
    st2 = segment(grid, medium, *st2, 1, k=100, do_scatter=False)
jax.block_until_ready(st2[0].pos)
print('no-scatter: %.3f ms/iter' % ((time.time() - t0) / 500 * 1000), flush=True)
