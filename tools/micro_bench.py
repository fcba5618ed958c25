#!/usr/bin/env python
"""Micro-benchmarks of the framework's hot primitives on the attached
accelerator.  Small, fast-compiling programs — used to decide where custom
(Pallas) kernels pay off before touching the full pipeline.

  scalar_gather   TSDF sampling pattern: N scalar gathers from an [M] table
  row_gather      back-projection pattern: N row gathers from [T, C]
  compact         cumsum + scatter fixed-capacity compaction
  topk            lax.top_k used by pruning / point subsample
  segsum          sort + segment_sum used by voxelize
  conv3d          one dense 3D conv layer (U-Net hot op)
  matmul          MXU reference point

Usage: python tools/micro_bench.py [name ...]
"""

import os
import sys
import time

import numpy as np


def _force(r):
    """Force completion: block_until_ready is unreliable through the remote
    (axon) relay, so fetch one dependent element to the host (a [:1] slice
    keeps the transfer tiny while forcing the producer to finish)."""
    import jax
    leaves = jax.tree_util.tree_leaves(r)
    for leaf in leaves:
        jax.device_get(leaf.reshape(-1)[:1])


def timeit(fn, *args, iters=5):
    r = fn(*args)
    _force(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _force(r)
    return (time.perf_counter() - t0) / iters


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from cnrma_tpu.utils.comp_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    names = sys.argv[1:] or ["scalar_gather", "row_gather", "compact",
                             "topk", "segsum", "conv3d", "matmul"]
    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    results = {}

    # dispatch + host-fetch overhead floor (subtract mentally from tiny ops)
    null = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8, 128), jnp.float32)
    results["null_overhead"] = (timeit(null, x0), "dispatch+fetch floor")

    if "scalar_gather" in names:
        # ray marching: 5.76M samples x 50 views gather from 256*256*96 TSDF
        M = 256 * 256 * 96
        N = 120 * 160 * 300
        table = jnp.asarray(rng.rand(M).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, M, size=N).astype(np.int32))
        f = jax.jit(lambda t, i: jnp.take(t, i))
        dt = timeit(f, table, idx)
        results["scalar_gather"] = (dt, f"{N / dt / 1e9:.2f} Gelem/s")

    if "row_gather" in names:
        # backproject: 6.3M voxels gather [?, 32] rows from [19200, 32]
        T, C = 120 * 160, 32
        N = 256 * 256 * 96
        table = jnp.asarray(rng.rand(T, C).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, T, size=N).astype(np.int32))
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt = timeit(f, table, idx)
        results["row_gather"] = (
            dt, f"{N * C * 4 / dt / 1e9:.1f} GB/s out")

    if "compact" in names:
        N, K = 120 * 160 * 300, 32768
        w = jnp.asarray(rng.rand(N).astype(np.float32))
        x = jnp.asarray(rng.rand(N, 3).astype(np.float32))

        def f(w, x):
            mask = w > 0.95
            pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
            slot = jnp.where(mask & (pos < K), pos, K)
            buf = jnp.zeros((K, 3), x.dtype)
            return buf.at[slot].set(x, mode="drop")
        fj = jax.jit(f)
        dt = timeit(fj, w, x)
        results["compact"] = (dt, f"{N / dt / 1e9:.2f} Gelem/s in")

    if "topk" in names:
        N, K = 50 * 32768, 500000 // 4
        s = jnp.asarray(rng.rand(N).astype(np.float32))
        f = jax.jit(lambda s: jax.lax.top_k(s, min(K, N)))
        dt = timeit(f, s)
        results["topk"] = (dt, f"N={N} K={min(K, N)}")

    if "segsum" in names:
        N, K = 500000, 262144
        keys = jnp.asarray(
            np.sort(rng.randint(0, K, size=N)).astype(np.int32))
        vals = jnp.asarray(rng.rand(N, 32).astype(np.float32))
        f = jax.jit(lambda k, v: jax.ops.segment_sum(
            v, k, num_segments=K))
        dt = timeit(f, keys, vals)
        results["segsum"] = (dt, f"N={N} C=32")

    if "sort" in names or "segsum" in names:
        N = 500000
        keys = jnp.asarray(rng.randint(0, 1 << 30, N).astype(np.int32))
        vals = jnp.asarray(rng.rand(N, 35).astype(np.float32))
        f = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v.T))
        # sort with payload columns: transpose trick keeps rows together
        f2 = jax.jit(lambda k, v: (jnp.sort(k),))
        dt = timeit(f2, keys, vals)
        results["sort_keys"] = (dt, f"N={N}")

    if "conv3d" in names:
        x = jnp.asarray(rng.rand(1, 256, 256, 96, 32).astype(np.float32))
        w = jnp.asarray(rng.rand(3, 3, 3, 32, 32).astype(np.float32) * .01)
        f = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC")))
        dt = timeit(f, x, w)
        flops = 2 * 256 * 256 * 96 * 27 * 32 * 32
        results["conv3d"] = (dt, f"{flops / dt / 1e12:.1f} TFLOP/s")

    if "matmul" in names:
        a = jnp.asarray(rng.rand(8192, 8192).astype(np.float32))
        f = jax.jit(lambda a: a @ a)
        dt = timeit(f, a)
        results["matmul"] = (
            dt, f"{2 * 8192 ** 3 / dt / 1e12:.1f} TFLOP/s f32")
        ab = a.astype(jnp.bfloat16)
        fb = jax.jit(lambda a: a @ a)
        dt = timeit(fb, ab)
        results["matmul_bf16"] = (
            dt, f"{2 * 8192 ** 3 / dt / 1e12:.1f} TFLOP/s bf16")

    for k, (dt, note) in results.items():
        print(f"{k:16s} {dt * 1000:9.2f} ms   {note}", flush=True)


if __name__ == "__main__":
    main()
