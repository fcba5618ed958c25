#!/usr/bin/env python
"""Probe Mosaic/XLA gather formulations for the ray-marching hot path.

Baseline (micro_bench, forced timing, v5e): XLA flat 1-D gather of 5.76M
f32 from a 6.3M table = ~39 ms/view; cumsum+scatter compaction of 5.76M =
~70 ms/view.  Candidates measured here:

  xla_flat        jnp.take on flat table (baseline)
  xla_row128      table [R,128]: row gather (full lane row per query)
  xla_row_sel     row gather + lane select (arbitrary flat gather, XLA)
  pl_row          pallas kernel: row gather from VMEM-resident table
  pl_lane_bcast   pallas: take_along_axis(T, hi broadcast, 0) + lane select
  pl_lane_true    pallas: per-lane idx (upper bound; pre-partitioned)
  topk20          XLA per-ray top_k(300 -> 20) on [19200, 300]
  compact384k     cumsum+scatter index compaction on 384k elements

Usage: python tools/pallas_gather_probe.py [name ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

HW = 120 * 160
NS = 300
NQ = HW * NS                      # 5.76M queries / view
TABLE = 192 * 192 * 80           # train-scale TSDF elements


def main():
    from cnrma_tpu.utils.comp_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    names = sys.argv[1:] or ["xla_flat", "xla_row128", "xla_row_sel",
                             "pl_row", "pl_lane_bcast", "pl_lane_true",
                             "topk20", "compact384k"]

    def force(r):
        for leaf in jax.tree_util.tree_leaves(r):
            jax.device_get(leaf.reshape(-1)[:1])

    def timeit(f, *a, iters=5):
        r = f(*a)
        force(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*a)
        force(r)
        return (time.perf_counter() - t0) / iters

    rng = np.random.RandomState(0)
    rows = TABLE // 128
    table_flat = jnp.asarray(rng.rand(TABLE).astype(np.float32))
    table2d = table_flat.reshape(rows, 128)
    idx_flat = jnp.asarray(
        rng.randint(0, TABLE, size=NQ).astype(np.int32))
    hi = idx_flat // 128
    lo = idx_flat % 128

    def report(name, dt, note=""):
        print(f"{name:14s} {dt * 1000:9.2f} ms  "
              f"{NQ / dt / 1e9:6.2f} Gelem/s  {note}", flush=True)

    def attempt(name, build):
        if name not in names:
            return
        try:
            f, args = build()
            dt = timeit(f, *args)
            report(name, dt)
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    attempt("xla_flat", lambda: (
        jax.jit(lambda t, i: jnp.take(t, i)), (table_flat, idx_flat)))

    attempt("xla_row128", lambda: (
        jax.jit(lambda t, i: jnp.take(t, i, axis=0)), (table2d, hi)))

    def xla_row_sel():
        def f(t, h, l):
            g = jnp.take(t, h, axis=0)                     # [NQ, 128]
            return jnp.take_along_axis(g, l[:, None], axis=1)[:, 0]
        return jax.jit(f), (table2d, hi, lo)
    attempt("xla_row_sel", xla_row_sel)

    # Mosaic dynamic_gather contract (jax 0.9 lowering.py:2464-2524):
    # take_along_axis(x, idx, axis) 2D ONLY, with idx.shape == x.shape.
    # axis=0: out[i,j] = x[idx[i,j], j]  (per-lane row gather)
    # axis=1: out[i,j] = x[i, idx[i,j]]  (within-row lane shuffle)

    def pl_lane_true():
        # pure dynamic_gather throughput: one call gathers table-shaped
        # [rows, 128] = 6.3M elements
        idx2d = jnp.asarray(rng.randint(
            0, rows, size=(rows, 128)).astype(np.int32))

        def kernel(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )

        def f(t, i):
            return call(t, i)
        g = jax.jit(f)
        dt = timeit(g, table2d, idx2d)
        print(f"{'pl_lane_true':14s} {dt * 1000:9.2f} ms  "
              f"{rows * 128 / dt / 1e9:6.2f} Gelem/s  (one call, 6.3M)",
              flush=True)
        # correctness
        a = np.asarray(g(table2d, idx2d))
        t_np = np.asarray(table2d)
        i_np = np.asarray(idx2d)
        ref = t_np[i_np, np.arange(128)[None, :]]
        print("  match:", bool(np.allclose(a, ref)), flush=True)
        return None

    if "pl_lane_true" in names:
        try:
            pl_lane_true()
        except Exception as e:
            print(f"pl_lane_true FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    def pl_lane_bcast():
        # arbitrary flat gather via broadcast-hi: each out row serves ONE
        # query (gathers its full 128-lane row, then replicates lane lo via
        # an axis=1 dynamic_gather).  hi/lo are stored transposed
        # [rows, n_blocks] so each block is a sublane column.
        n_blocks = (NQ + rows - 1) // rows
        nq_pad = n_blocks * rows
        hi_p = jnp.pad(hi, (0, nq_pad - NQ)).reshape(n_blocks, rows).T
        lo_p = jnp.pad(lo, (0, nq_pad - NQ)).reshape(n_blocks, rows).T

        def kernel(t_ref, hi_ref, lo_ref, o_ref):
            h = hi_ref[:, 0]                                  # [rows]
            idx2d = jnp.broadcast_to(h[:, None], (rows, 128))
            g = jnp.take_along_axis(t_ref[:], idx2d, axis=0)  # [rows,128]
            lsel = jnp.broadcast_to(lo_ref[:, 0][:, None], (rows, 128))
            o_ref[:] = jnp.take_along_axis(g, lsel, axis=1)   # replicated

        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_blocks * rows, 128),
                                           jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(n_blocks,),
                in_specs=[pl.BlockSpec((rows, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((rows, 1), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((rows, 1), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )

        def f(t, h, l):
            return call(t, h, l)[:, 0]
        g = jax.jit(f)
        dt = timeit(g, table2d, hi_p, lo_p)
        print(f"{'pl_lane_bcast':14s} {dt * 1000:9.2f} ms  "
              f"{NQ / dt / 1e9:6.2f} Gelem/s  (5.76M queries)", flush=True)
        # out rows are ordered block-major: query q -> row q//rows*rows+q%rows
        ref = np.asarray(table_flat)[np.asarray(idx_flat)]
        got = np.asarray(g(table2d, hi_p, lo_p)).reshape(-1)[:NQ]
        print("  match:", bool(np.allclose(got, ref)), flush=True)

    if "pl_lane_bcast" in names:
        try:
            pl_lane_bcast()
        except Exception as e:
            print(f"pl_lane_bcast FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    def topk20():
        w = jnp.asarray(rng.rand(HW, NS).astype(np.float32))
        return jax.jit(lambda w: jax.lax.top_k(w, 20)), (w,)
    attempt("topk20", topk20)

    def compact384k():
        n, cap = HW * 20, 32768
        m = jnp.asarray(rng.rand(n) > 0.9)

        def f(mask):
            pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
            slot = jnp.where(mask & (pos < cap), pos, cap)
            buf = jnp.full((cap,), -1, jnp.int32)
            return buf.at[slot].set(
                jnp.arange(n, dtype=jnp.int32), mode="drop")
        return jax.jit(f), (m,)
    attempt("compact384k", compact384k)


if __name__ == "__main__":
    main()
