"""Probe 2: wide-row take_along_axis gathers, row gathers, lane-local
scatter, and the two-level one-hot MXU tally deposit -- the building blocks
of a Pallas march kernel. Compares against the XLA gather/scatter floor.

Run: python scripts/probe_gather2.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CELLS = 64 * 64 * 64            # 262144
N = 1 << 17                     # 131072
REPS = 32


def timeit(fn, *args, reps=3):
    fn_c = jax.jit(fn)
    out = fn_c(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn_c(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, seconds, elems):
    print(f"{name}: {seconds*1e3:.3f} ms -> {elems/seconds/1e6:.1f} Melem/s",
          flush=True)


def try_case(name, build):
    try:
        fn, args, elems = build()
        s = timeit(fn, *args)
        report(name, s, elems)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


LCG_A = np.uint32(1103515245)
LCG_C = np.uint32(12345)


def main():
    tbl = jax.random.uniform(jax.random.PRNGKey(0), (CELLS,), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, CELLS, jnp.int32)
    vals = jax.random.uniform(jax.random.PRNGKey(2), (N,), jnp.float32)

    t0 = time.perf_counter()
    _ = np.asarray(jnp.zeros(4))
    print(f"# link warm-up: {time.perf_counter()-t0:.1f} s", flush=True)

    def perm(ix, i):
        # cheap in-kernel index reshuffle, stays uniform over CELLS
        return ((ix * jnp.int32(1103515245) + jnp.int32(12345) + i)
                % CELLS + CELLS) % CELLS

    # ---- XLA reference on the same distribution
    def xla_gather(tbl, ix):
        acc = jnp.zeros_like(ix, dtype=jnp.float32)
        j = ix
        for i in range(REPS):
            j = perm(j, i)
            acc = acc + tbl[j]
        return acc
    s = timeit(xla_gather, tbl, idx)
    report("xla gather", s, N * REPS)

    def xla_scatter(ix, v):
        out = jnp.zeros(CELLS, jnp.float32)
        j = ix
        for i in range(REPS):
            j = perm(j, i)
            out = out.at[j].add(v)
        return out
    s = timeit(xla_scatter, idx, vals)
    report("xla scatter-add", s, N * REPS)

    # ---- W1: take_along_axis, full table replicated across 8 sublane rows
    def build_w1():
        t8 = jnp.broadcast_to(tbl[None, :], (8, CELLS))
        c8 = idx.reshape(8, N // 8)

        def kern(t_ref, c_ref, out_ref):
            t = t_ref[:]
            c = c_ref[:]
            def body(i, st):
                acc, j = st
                j = perm(j, i)
                return acc + jnp.take_along_axis(t, j, axis=1), j
            acc, _ = jax.lax.fori_loop(
                0, REPS, body, (jnp.zeros_like(out_ref), c))
            out_ref[:] = acc
        fn = lambda t, c: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, N // 8), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, c)
        return fn, (t8, c8), N * REPS
    try_case("W1 take_along rows8 x 262144", build_w1)

    # ---- W2: one row holding the whole table
    def build_w2():
        t1 = tbl.reshape(1, CELLS)
        c1 = idx.reshape(1, N)

        def kern(t_ref, c_ref, out_ref):
            t = t_ref[:]
            c = c_ref[:]
            def body(i, st):
                acc, j = st
                j = perm(j, i)
                return acc + jnp.take_along_axis(t, j, axis=1), j
            acc, _ = jax.lax.fori_loop(
                0, REPS, body, (jnp.zeros_like(out_ref), c))
            out_ref[:] = acc
        fn = lambda t, c: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, c)
        return fn, (t1, c1), N * REPS
    try_case("W2 take_along rows1 x 262144", build_w2)

    # ---- W3: width scaling, 8 x 32768 (indices wrapped into the row)
    def build_w3():
        t8 = tbl.reshape(8, CELLS // 8)
        c8 = (idx % (CELLS // 8)).reshape(8, N // 8)

        def kern(t_ref, c_ref, out_ref):
            t = t_ref[:]
            c = c_ref[:]
            W = CELLS // 8
            def body(i, st):
                acc, j = st
                j = (j * jnp.int32(1103515245) + jnp.int32(12345) + i) % W
                j = (j + W) % W
                return acc + jnp.take_along_axis(t, j, axis=1), j
            acc, _ = jax.lax.fori_loop(
                0, REPS, body, (jnp.zeros_like(out_ref), c))
            out_ref[:] = acc
        fn = lambda t, c: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, N // 8), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, c)
        return fn, (t8, c8), N * REPS
    try_case("W3 take_along rows8 x 32768", build_w3)

    # ---- W4: 1024 x 2500-ish width (the CSC table shape)
    def build_w4():
        t = jnp.broadcast_to(tbl[None, :2560], (1024, 2560))
        c = (idx % 2560).reshape(1024, 128)

        def kern(t_ref, c_ref, out_ref):
            tt = t_ref[:]
            c = c_ref[:]
            def body(i, st):
                acc, j = st
                j = (j * jnp.int32(1103515245) + jnp.int32(12345) + i) % 2560
                j = (j + 2560) % 2560
                return acc + jnp.take_along_axis(tt, j, axis=1), j
            acc, _ = jax.lax.fori_loop(
                0, REPS, body, (jnp.zeros_like(out_ref), c))
            out_ref[:] = acc
        fn = lambda t, c: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, c)
        return fn, (t, c), N * REPS
    try_case("W4 take_along rows1024 x 2560", build_w4)

    # ---- RG: row gather t2d[r] (2-D gather of whole rows)
    def build_rg():
        t2 = tbl.reshape(2048, 128)
        r = (idx % 2048).reshape(8, N // 8)

        def kern(t_ref, r_ref, out_ref):
            t = t_ref[:]
            rr = r_ref[:]
            def body(i, st):
                acc, j = st
                j = (j * jnp.int32(1103515245) + jnp.int32(12345) + i) % 2048
                j = (j + 2048) % 2048
                # gather rows for the first 128 indices only (cost probe)
                rows = t[j[0, :128]]          # [128, 128]
                return acc + jnp.sum(rows, axis=1)[None, :], j
            acc, _ = jax.lax.fori_loop(
                0, REPS, body, (jnp.zeros((1, 128), jnp.float32), rr))
            out_ref[:] = acc
        fn = lambda t, r: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, r)
        return fn, (t2, r), 128 * REPS
    try_case("RG row gather t[r] 128 rows", build_rg)

    # ---- S2: lane-local value scatter-add inside kernel
    def build_s2():
        c = (idx % 128).reshape(1024, 128)
        v = vals.reshape(1024, 128)

        def kern(c_ref, v_ref, out_ref):
            c = c_ref[:]
            v = v_ref[:]
            rows = jax.lax.broadcasted_iota(jnp.int32, (1024, 128), 0)
            a = jnp.zeros((1024, 128), jnp.float32)
            def body(i, st):
                a, j = st
                j = (j * jnp.int32(1103515245) + jnp.int32(12345) + i) % 128
                j = (j + 128) % 128
                return a.at[rows, j].add(v), j
            a, _ = jax.lax.fori_loop(0, 4, body, (a, c))
            out_ref[:] = a
        fn = lambda c, v: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(c, v)
        return fn, (c, v), N * 4
    try_case("S2 lane-local scatter-add", build_s2)

    # ---- MX: two-level one-hot MXU deposit in Pallas
    # out[hi, lo] += sum_n delta_n [gidx_n == hi*512+lo], blocked over lanes
    THI, TLO = 512, 512
    BLK = 512

    def build_mx(split):
        def kern(idx_ref, val_ref, out_ref):
            out_ref[:] = jnp.zeros_like(out_ref)
            ix = idx_ref[:]                     # [N//BLK, BLK] int32
            v = val_ref[:]
            hi_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, THI), 1)
            lo_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, TLO), 1)

            def rep_body(r, carry):
                acc, jall = carry
                jall = ((jall * jnp.int32(1103515245) + jnp.int32(12345)
                         + r) % CELLS + CELLS) % CELLS

                def blk_body(b, acc):
                    j = jall[b]                  # [BLK]
                    dv = v[b]                    # [BLK]
                    hi = j // TLO
                    lo = j % TLO
                    oh_lo = (lo[:, None] == lo_iota).astype(jnp.bfloat16)
                    if split == 1:
                        a1 = jnp.where(hi[:, None] == hi_iota,
                                       dv[:, None], 0.0).astype(jnp.bfloat16)
                        part = jax.lax.dot_general(
                            a1, oh_lo, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    else:
                        d1 = dv.astype(jnp.bfloat16).astype(jnp.float32)
                        d2 = dv - d1
                        a1 = jnp.where(hi[:, None] == hi_iota,
                                       d1[:, None], 0.0).astype(jnp.bfloat16)
                        a2 = jnp.where(hi[:, None] == hi_iota,
                                       d2[:, None], 0.0).astype(jnp.bfloat16)
                        part = jax.lax.dot_general(
                            a1, oh_lo, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        part = part + jax.lax.dot_general(
                            a2, oh_lo, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    return acc + part

                acc = jax.lax.fori_loop(0, N // BLK, blk_body, acc)
                return acc, jall

            acc, _ = jax.lax.fori_loop(
                0, REPS, rep_body,
                (jnp.zeros((THI, TLO), jnp.float32), ix))
            out_ref[:] = acc

        fn = lambda ix, v: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((THI, TLO), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(ix, v)
        return fn, (idx.reshape(N // BLK, BLK),
                    vals.reshape(N // BLK, BLK)), N * REPS

    try_case("MX one-hot MXU deposit bf16x1", lambda: build_mx(1))
    try_case("MX one-hot MXU deposit bf16x2", lambda: build_mx(2))

    # correctness check of the MXU deposit (1 rep, vs XLA scatter)
    try:
        def kern(idx_ref, val_ref, out_ref):
            ix = idx_ref[:]
            v = val_ref[:]
            hi_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, THI), 1)
            lo_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, TLO), 1)
            def blk_body(b, acc):
                j = ix[b]
                dv = v[b]
                hi = j // TLO
                lo = j % TLO
                oh_lo = (lo[:, None] == lo_iota).astype(jnp.bfloat16)
                d1 = dv.astype(jnp.bfloat16).astype(jnp.float32)
                d2 = dv - d1
                a1 = jnp.where(hi[:, None] == hi_iota,
                               d1[:, None], 0.0).astype(jnp.bfloat16)
                a2 = jnp.where(hi[:, None] == hi_iota,
                               d2[:, None], 0.0).astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    a1, oh_lo, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                part = part + jax.lax.dot_general(
                    a2, oh_lo, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc + part
            out_ref[:] = jax.lax.fori_loop(
                0, N // BLK, blk_body, jnp.zeros((THI, TLO), jnp.float32))
        mx1 = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((THI, TLO), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx.reshape(N // BLK, BLK), vals.reshape(N // BLK, BLK))
        ref = jnp.zeros(CELLS, jnp.float32).at[idx].add(vals)
        err = jnp.max(jnp.abs(mx1.reshape(-1) - ref))
        rel = err / jnp.maximum(jnp.max(ref), 1e-30)
        print(f"MX bf16x2 correctness: max abs err {float(err):.3e} "
              f"rel {float(rel):.3e}", flush=True)
    except Exception as e:
        print(f"MX correctness: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
