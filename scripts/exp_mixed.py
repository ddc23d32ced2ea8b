"""Compare per-frequency loop vs mixed-frequency pool on the real workload."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from soc_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from soc_tpu.grid import uniform_grid
from soc_tpu.io.dust import read_simple_dust, read_scattering_function
from soc_tpu.transport.medium import medium_from_optics
from soc_tpu.transport.propagate import transport_run

grid = uniform_grid(64, 64, 64, density=1000.0)
opt = read_simple_dust('/tmp/soc_bench/tmp.dust', 0.01)
dsc, csc = read_scattering_function('/tmp/soc_bench/tmp.dsc', 44, 2500)
medium = medium_from_optics([opt], dsc, csc, opt.freq)
nf = 44
per_freq = 983040
nl = 16384

mode = sys.argv[1] if len(sys.argv) > 1 else 'mixed'

if mode == 'perfreq':
    tabs = jnp.zeros(grid.cells, jnp.float32)
    intf = jnp.zeros((1, 1), jnp.float32)
    # warm: compile once
    t0 = time.time()
    escs = []
    for f in range(nf):
        physics = dict(kabs=medium.abs_gl[f], ksca=medium.sca_gl[f],
                       csc=medium.csc[f], tw=medium.tw[f])
        params = dict(photons=jnp.float32(1.0), ifreq=jnp.int32(f),
                      per_freq=jnp.int32(per_freq),
                      id_offset=jnp.int32(f * per_freq))
        tabs, intf, esc, absd = transport_run(
            grid, physics, params, jnp.int32(per_freq), tabs, intf, 1,
            source_kind='bg', nlanes=nl)
        escs.append(esc)
        if f == 0:
            jax.block_until_ready(tabs)
            t0 = time.time()   # exclude compile
    jax.block_until_ready(tabs)
    dt = time.time() - t0
    tot = (nf - 1) * per_freq
    print('perfreq: %.1fs for %d packets -> %.0f pkt/s' % (dt, tot, tot / dt))
else:
    physics = dict(kabs=medium.abs_gl, ksca=medium.sca_gl,
                   csc=medium.csc, tw=medium.tw)
    bg = jnp.ones(nf, jnp.float32)
    params = dict(photons=bg, ifreq=None,
                  per_freq=jnp.int32(per_freq), id_offset=jnp.int32(0))
    tabs = jnp.zeros(grid.cells, jnp.float32)
    intf = jnp.zeros((1, 1), jnp.float32)
    total = per_freq * nf
    CH = 2 * 1024 * 1024
    t0 = time.time()
    esct = 0.0
    for off in range(0, total, CH):
        n = min(CH, total - off)
        params = dict(photons=bg, ifreq=None,
                      per_freq=jnp.int32(per_freq), id_offset=jnp.int32(off))
        # NOTE: ids_local are 0..n-1 within the call; element & freq decode
        # must use the GLOBAL id => pass global decode via id_offset-aware
        # params (per_freq decode uses ids_local + offset) -- see sources.
        tabs, intf, esc, absd = transport_run(
            grid, physics, params, jnp.int32(n), tabs, intf, 1,
            source_kind='bg', nlanes=nl)
        esct += float(esc)
        if off == 0:
            jax.block_until_ready(tabs)
            t0 = time.time()
    jax.block_until_ready(tabs)
    dt = time.time() - t0
    print('mixed chunked run: %.1fs for %d packets -> %.0f pkt/s'
          % (dt, total - CH, (total - CH) / dt))
