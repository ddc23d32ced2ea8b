"""Probe gather/scatter throughput on the real TPU: XLA lowering vs what
Mosaic/Pallas will accept. Decides whether a VMEM-resident Pallas march
kernel can beat the transport stepping floor (BENCH stepping_bound).

Run: python scripts/probe_gather.py
Each experiment prints  name: ok/FAIL  and Melem/s where timed.
"""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CELLS = 64 * 64 * 64            # 262144, the bench model
N = 1 << 17                     # 131072 lanes
REPS = 64                       # chained op reps inside one jit


def timeit(fn, *args, reps=3):
    fn_c = jax.jit(fn)
    out = fn_c(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    # force a real readback (tunnel can lie on block_until_ready)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn_c(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, seconds, elems):
    print(f"{name}: {seconds*1e3:.3f} ms -> {elems/seconds/1e6:.1f} Melem/s")


def main():
    key = jax.random.PRNGKey(0)
    tbl = jax.random.uniform(key, (CELLS,), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, CELLS,
                             jnp.int32)
    vals = jax.random.uniform(jax.random.PRNGKey(2), (N,), jnp.float32)

    t0 = time.perf_counter()
    _ = np.asarray(jnp.zeros(4))       # warm the tunnel link
    print(f"# link warm-up: {time.perf_counter()-t0:.1f} s")

    # ---------------- XLA baselines ----------------
    def xla_gather(tbl, idx):
        def body(i, acc):
            g = tbl[idx]
            acc = acc + g
            idx2 = idx  # keep idx constant; chain through acc only
            return acc
        acc = jnp.zeros(N, jnp.float32)
        for _ in range(REPS):
            acc = acc + tbl[(idx + acc.astype(jnp.int32) // 10**9) % CELLS]
        return acc

    s = timeit(xla_gather, tbl, idx)
    report("xla gather [N]<-?[CELLS]", s, N * REPS)

    def xla_scatter(tbl, idx, vals):
        out = jnp.zeros(CELLS, jnp.float32)
        for i in range(REPS):
            out = out.at[(idx + i) % CELLS].add(vals)
        return out

    s = timeit(xla_scatter, tbl, idx, vals)
    report("xla scatter-add [CELLS]<-[N]", s, N * REPS)

    def xla_both(tbl, idx, vals):
        out = jnp.zeros(CELLS, jnp.float32)
        acc = jnp.zeros(N, jnp.float32)
        for i in range(REPS):
            g = tbl[(idx + i) % CELLS]
            acc = acc + g
            out = out.at[(idx + i) % CELLS].add(vals + acc * 1e-30)
        return out, acc
    s = timeit(xla_both, tbl, idx, vals)
    report("xla gather+scatter", s, N * REPS)

    # ---------------- Pallas attempts ----------------
    tbl2 = tbl.reshape(2048, 128)
    idx2 = idx.reshape(1024, 128)
    vals2 = vals.reshape(1024, 128)

    def try_pallas(name, build):
        try:
            fn, args, elems = build()
            s = timeit(fn, *args)
            report(f"pallas {name}", s, elems)
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"pallas {name}: FAIL {type(e).__name__}: {msg}")

    # A1: 1-D fancy index gather, repeated in-kernel
    def build_a1():
        def kern(tbl_ref, idx_ref, out_ref):
            t = tbl_ref[:]
            ix = idx_ref[:]
            acc = jnp.zeros_like(out_ref)
            def body(i, acc):
                return acc + t[(ix + i) % CELLS]
            acc = jax.lax.fori_loop(0, REPS, body, acc)
            out_ref[:] = acc
        fn = lambda t, ix: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, ix)
        return fn, (tbl, idx), N * REPS
    try_pallas("A1 1-D fancy gather", build_a1)

    # A2: 2-D table, (row, col) elementwise fancy gather
    def build_a2():
        def kern(tbl_ref, idx_ref, out_ref):
            t = tbl_ref[:]
            ix = idx_ref[:]
            def body(i, acc):
                jx = (ix + i) % CELLS
                return acc + t[jx // 128, jx % 128]
            out_ref[:] = jax.lax.fori_loop(
                0, REPS, body, jnp.zeros_like(out_ref))
        fn = lambda t, ix: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, ix)
        return fn, (tbl2, idx2), N * REPS
    try_pallas("A2 2-D (row,col) gather", build_a2)

    # A3: jnp.take flat
    def build_a3():
        def kern(tbl_ref, idx_ref, out_ref):
            t = tbl_ref[:]
            ix = idx_ref[:]
            def body(i, acc):
                return acc + jnp.take(t, (ix + i) % CELLS, axis=0)
            out_ref[:] = jax.lax.fori_loop(
                0, REPS, body, jnp.zeros_like(out_ref))
        fn = lambda t, ix: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, ix)
        return fn, (tbl, idx2), N * REPS
    try_pallas("A3 jnp.take flat", build_a3)

    # A4: take_along_axis within lanes (the dynamic_gather form):
    # table row r broadcast: out[s, l] = t[s, c[s, l]] where t is [1024,128]
    def build_a4():
        def kern(tbl_ref, idx_ref, out_ref):
            t = tbl_ref[:]           # [1024, 128]
            c = idx_ref[:] % 128     # [1024, 128]
            def body(i, acc):
                return acc + jnp.take_along_axis(t, (c + i) % 128, axis=1)
            out_ref[:] = jax.lax.fori_loop(
                0, REPS, body, jnp.zeros_like(out_ref))
        fn = lambda t, ix: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, ix)
        return fn, (tbl.reshape(2048, 128)[:1024], idx2), N * REPS
    try_pallas("A4 take_along_axis lanes", build_a4)

    # A5: take_along_axis along sublanes (axis 0): out[s,l] = t[r[s,l], l]
    def build_a5():
        def kern(tbl_ref, idx_ref, out_ref):
            t = tbl_ref[:]           # [2048, 128]
            r = idx_ref[:] % 2048    # [1024, 128]
            def body(i, acc):
                return acc + jnp.take_along_axis(t, (r + i) % 2048, axis=0)
            out_ref[:] = jax.lax.fori_loop(
                0, REPS, body,
                jnp.zeros((1024, 128), jnp.float32))
        fn = lambda t, ix: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, ix)
        return fn, (tbl2, idx2), N * REPS
    try_pallas("A5 take_along_axis sublanes", build_a5)

    # S1: Pallas scatter-add, full-vector .at[].add form
    def build_s1():
        def kern(idx_ref, val_ref, out_ref):
            out_ref[:] = jnp.zeros_like(out_ref)
            ix = idx_ref[:]
            v = val_ref[:]
            def body(i, carry):
                o = carry
                o = o.at[(ix + i) % CELLS].add(v)
                return o
            out_ref[:] = jax.lax.fori_loop(
                0, 4, body, jnp.zeros((CELLS,), jnp.float32))
        fn = lambda ix, v: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((CELLS,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(ix, v)
        return fn, (idx, vals), N * 4
    try_pallas("S1 vector scatter-add", build_s1)


if __name__ == "__main__":
    main()
