"""Multi-chip execution: packet data-parallelism x frequency parallelism.

The reference is strictly single-device (SURVEY.md section 2.4); its implicit
parallel axes are packets (work items) and the serial frequency loop. Here
both become mesh axes:

  * 'dp'   -- packet data-parallel: every device simulates an id-disjoint
              slice of the packet budget (RNG streams are keyed by global
              packet id, so results are device-count invariant);
              per-cell tallies are reduced with psum over ICI.
  * 'freq' -- frequency-parallel: frequency channels are blocked over the
              second axis; each block runs its channels' transport locally
              and the integrated tally is psum'ed (the trapezoid sum over
              frequency is a linear reduction, so it commutes with psum).

This mirrors the plan in SURVEY.md section 7.2 step 7; spatial domain
decomposition of the grid itself (halo exchange of boundary-crossing packets
over ICI) is the next stage on top of this.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..transport.propagate import transport_run
from ..transport.sources import stream_hi_base


def make_mesh(devices=None, freq_axis=1):
    """Build a (dp, freq) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % freq_axis != 0:
        freq_axis = 1
    dp = n // freq_axis
    dev = np.asarray(devices).reshape(dp, freq_axis)
    return Mesh(dev, ("dp", "freq"))


def sharded_background_run(grid, medium, bg_photons, per_freq, seed, mesh,
                           nlanes=1 << 14, max_iters=1 << 30):
    """Distributed phase-1 background simulation.

    bg_photons : [NFREQ] photons per packet per frequency (host array)
    per_freq   : packets per frequency (split over the dp axis)
    Returns (tabs [CELLS] fully reduced, escaped [NFREQ]).
    """
    nf = medium.nfreq
    n_freq_ax = mesh.shape["freq"]
    n_dp = mesh.shape["dp"]
    assert nf % n_freq_ax == 0, "NFREQ must divide the freq mesh axis"
    assert per_freq % n_dp == 0, "per_freq must divide the dp mesh axis"
    nf_local = nf // n_freq_ax
    per_dev = per_freq // n_dp

    bg_photons = jnp.asarray(bg_photons, jnp.float32)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("freq"), P("freq"), P("freq"), P("freq", None),
                       P("freq")),
             out_specs=(P(), P("freq")), check_vma=False)
    def run(bgp_l, kabs_l, ksca_l, csc_l, tw_l):
        fq = lax.axis_index("freq")
        dp = lax.axis_index("dp")
        tabs = jnp.zeros(grid.cells, jnp.float32)
        intf = jnp.zeros((1, 1), jnp.float32)
        esc_l = []
        for fl in range(nf_local):
            gfreq = fq * nf_local + fl
            physics = dict(kabs=kabs_l[fl], ksca=ksca_l[fl],
                           csc=csc_l[fl], tw=tw_l[fl])
            params = dict(photons=bgp_l[fl],
                          ifreq=gfreq.astype(jnp.int32),
                          per_freq=jnp.int32(per_freq),
                          k0=(dp * per_dev).astype(jnp.uint32),
                          hi_base=jnp.uint32(stream_hi_base("bg")))
            tabs, intf, esc, absd = transport_run(
                grid, physics, params, jnp.int32(per_dev), tabs, intf, seed,
                source_kind="bg", nlanes=nlanes, max_iters=max_iters)
            esc_l.append(esc[0])
        tabs = lax.psum(tabs, ("dp", "freq"))
        esc = lax.psum(jnp.stack(esc_l), "dp")
        return tabs, esc

    tabs, esc = run(bg_photons, medium.abs_gl, medium.sca_gl, medium.csc,
                    medium.tw)
    return tabs, esc
