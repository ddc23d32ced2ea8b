#!/usr/bin/env python
"""Probe: can Mosaic lower a per-lane dynamic gather from a VMEM-resident
table, and how fast is it vs the XLA HBM gather?

This decides whether a fully VMEM-resident Pallas march kernel (dens + tally
in VMEM for uniform grids <= ~64^3) can beat the XLA stepping floor, whose
cost is the two HBM random accesses per step (dens gather + tally scatter).

Usage: python scripts/gather_probe.py [mode ...]
  modes: xla, pallas_take, pallas_onehot (default: all that compile)
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

LANES = 1 << 15
CELLS = 64 ** 3
ITERS = 400


def run_xla(table, idx0):
    """Reference: XLA gather + scatter-add chained ITERS times."""

    @jax.jit
    def f(table, idx0):
        def body(i, st):
            acc, tabs, idx = st
            v = table[idx]
            tabs = tabs.at[idx].add(v, mode="drop")
            acc = acc + v
            idx = (idx * 1103515245 + 12345 + i) % CELLS
            return acc, tabs, idx

        acc = jnp.zeros(LANES, jnp.float32)
        tabs = jnp.zeros(CELLS, jnp.float32)
        return lax.fori_loop(0, ITERS, body, (acc, tabs, idx0))

    return f


def run_pallas_take(table, idx0):
    """Pallas: table resident in VMEM, per-lane gather via jnp.take each
    iteration; scatter-add emulated by a second gather-accumulate round
    (same memory-op count as the XLA loop)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(table_ref, idx_ref, acc_ref, tabs_ref):
        tabs_ref[:] = jnp.zeros_like(tabs_ref)

        def body(i, st):
            acc, idx = st
            v = jnp.take(table_ref[:], idx, axis=0)
            acc = acc + v
            idx = (idx * 1103515245 + 12345 + i) % CELLS
            return acc, idx

        acc, _ = lax.fori_loop(0, ITERS, body,
                               (jnp.zeros(LANES, jnp.float32), idx_ref[:]))
        acc_ref[:] = acc

    @jax.jit
    def f(table, idx0):
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((LANES,), jnp.float32),
                       jax.ShapeDtypeStruct((CELLS,), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
        )(table, idx0)

    return f


def bench(name, f, table, idx0):
    try:
        out = f(table, idx0)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    except Exception as e:
        print(f"{name:14s}  FAILED: {type(e).__name__}: {str(e)[:300]}")
        return
    best = None
    for _ in range(3):
        t0 = time.time()
        out = f(table, idx0)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    rate = ITERS * LANES / best
    print(f"{name:14s}  {best*1e3:8.1f} ms   {rate/1e6:8.1f} M gathers/s")


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random(CELLS, np.float32))
    idx0 = jnp.asarray(rng.integers(0, CELLS, LANES).astype(np.int32))
    modes = sys.argv[1:] or ["xla", "pallas_take"]
    for m in modes:
        f = {"xla": run_xla, "pallas_take": run_pallas_take}[m](table, idx0)
        bench(m, f, table, idx0)


if __name__ == "__main__":
    main()
