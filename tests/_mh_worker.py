"""Multi-host worker: a tiny sharded bg transport over the GLOBAL mesh.

Run as `python _mh_worker.py <coordinator> <num_processes> <process_id>`
with 4 local CPU devices per process; prints one MH_RESULT line. The test
(test_multihost.py) starts two of these and compares against the same
run() executed single-process on 8 devices -- the RNG-stream identity
makes the results agree to summation order.
"""

import sys


def build():
    import numpy as np
    import jax.numpy as jnp
    from soc_tpu.grid import uniform_grid
    from soc_tpu.io.dust import hg_scattering_function
    from soc_tpu.transport.medium import Medium, trapezoid_weights
    nf = 4
    grid = uniform_grid(8, 8, 8, density=1.0)
    freq = np.logspace(11, 13, nf)
    dsc, csc = hg_scattering_function([0.3] * nf, 128)
    medium = Medium(abs_gl=jnp.asarray(np.full(nf, 0.1, np.float32)),
                    sca_gl=jnp.asarray(np.full(nf, 0.1, np.float32)),
                    csc=jnp.asarray(csc), dsc=jnp.asarray(dsc),
                    tw=jnp.asarray(trapezoid_weights(freq)),
                    nfreq=nf, bins=128)
    return grid, medium


def run(n_devices):
    import numpy as np
    import jax.numpy as jnp
    from soc_tpu.parallel.product import ProductMesh, run_freqs
    grid, medium = build()
    pm = ProductMesh(n_devices, medium.nfreq)
    tabs = jnp.zeros(grid.cells, jnp.float32)
    intf = pm.zeros_intf(grid.cells)

    def make_params(_i):
        return dict(photons=jnp.float32(1.0))

    tabs, intf, esc, absd, _ = run_freqs(
        pm, grid, medium, "bg", make_params, 512, tabs, intf, 7,
        256, True)
    intf_r = np.asarray(pm.reduce_intf(intf))
    return np.asarray(tabs), np.asarray(esc), intf_r


if __name__ == "__main__":
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from soc_tpu.parallel.dist import initialize
    initialize(coordinator=coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == nproc * 4, jax.device_count()
    tabs, esc, intf = run(jax.device_count())
    print("MH_RESULT %.9e %s %.9e"
          % (float(np.float64(tabs).sum()),
             ",".join("%.9e" % v for v in esc),
             float(np.float64(intf).sum())), flush=True)
