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
  gathervar       TSDF-gather formulations (flat/bf16/int8/row+one-hot)
  topkvar         exact top_k vs approx_max_k at ray-march shapes
  lookup          kernel-map searchsorted, scan vs sort method
  spconv          sparse conv: 27-matmul scan vs gather-once
  gentrans        generative transpose + child sort
  rect            rect-footprint volume-gather candidates (span gather,
                  one-hot matmul orientations, fused)   [MICRO_SMALL=1]
  lutmap          dense rank-LUT kernel maps vs sort    [MICRO_SMALL=1]
  conv3dvar       conv3d layouts/dtypes for the U-Net wall [MICRO_SMALL=1]

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

    # sitecustomize pins jax_platforms via jax.config (wins over the env
    # var) — re-apply the env so JAX_PLATFORMS=cpu smoke runs work
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

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

    if "gathervar" in names:
        # TSDF-sampling gather variants: the ray-march wall is 5.76M scalar
        # gathers per view.  Compare formulations.
        M = 192 * 192 * 80
        N = 120 * 160 * 300
        table32 = jnp.asarray(rng.rand(M).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, M, size=N).astype(np.int32))
        cases = {}
        cases["flat_f32"] = (jax.jit(lambda t, i: jnp.take(t, i)),
                             table32, idx)
        cases["flat_bf16"] = (jax.jit(lambda t, i: jnp.take(t, i)),
                              table32.astype(jnp.bfloat16), idx)
        cases["flat_i8"] = (jax.jit(lambda t, i: jnp.take(t, i)),
                            (table32 * 127).astype(jnp.int8), idx)
        # row gather of the 128-lane row + one-hot lane select via VPU
        Mr = (M + 127) // 128
        t2 = jnp.asarray(rng.rand(Mr, 128).astype(np.float32))

        def row_onehot(t2, i):
            row = i >> 7
            lane = i & 127
            g = jnp.take(t2, row, axis=0)                       # [N,128]
            oh = (jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
                  == lane[:, None])
            return jnp.sum(jnp.where(oh, g, 0.0), axis=1)
        cases["row_onehot"] = (jax.jit(row_onehot), t2, idx)

        def row_onehot16(t2, i):
            row = i >> 7
            lane = i & 127
            g = jnp.take(t2, row, axis=0)                       # [N,128]
            oh = (jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
                  == lane[:, None])
            return jnp.sum(jnp.where(oh, g, jnp.bfloat16(0)), axis=1)
        cases["row_onehot_bf16"] = (jax.jit(row_onehot16),
                                    t2.astype(jnp.bfloat16), idx)
        # sorted gather: sort indices, gather coherently, unsort
        def sorted_take(t, i):
            order = jnp.argsort(i)
            si = jnp.take(i, order)
            g = jnp.take(t, si)
            return jnp.zeros_like(g).at[order].set(g)
        cases["sorted_f32"] = (jax.jit(sorted_take), table32, idx)
        for nm, (f, *a) in cases.items():
            dt = timeit(f, *a)
            results[f"gather_{nm}"] = (dt, f"{N / dt / 1e9:.3f} Gelem/s")

    if "topkvar" in names:
        # per-ray top-k (ray march): exact top_k vs TPU approx_max_k
        s = jnp.asarray(rng.rand(19200, 300).astype(np.float32))
        f = jax.jit(lambda s: jax.lax.top_k(s, 20))
        results["topk_rows_exact"] = (timeit(f, s), "[19200,300]->20")
        for rt in (0.95, 0.99):
            fa = jax.jit(lambda s, rt=rt: jax.lax.approx_max_k(
                s, 20, recall_target=rt))
            results[f"topk_rows_approx{rt}"] = (
                timeit(fa, s), "[19200,300]->20")
        big = jnp.asarray(rng.rand(19200 * 20).astype(np.float32))
        f = jax.jit(lambda s: jax.lax.top_k(s, 8192))
        results["topk_flat_exact"] = (timeit(f, big), "[384k]->8192")
        fa = jax.jit(lambda s: jax.lax.approx_max_k(
            s, 8192, recall_target=0.99))
        results["topk_flat_approx"] = (timeit(fa, big), "[384k]->8192")

    if "lookup" in names:
        # sparse kernel-map: search 27*N neighbor keys in N sorted keys,
        # bisection ('scan') vs sort-based method, at detection-stack sizes
        for N in (8192, 32768, 131072, 262144):
            keys = jnp.asarray(np.sort(
                rng.choice(1 << 28, N, replace=False)).astype(np.int32))
            q = jnp.asarray(rng.randint(0, 1 << 28,
                                        27 * N).astype(np.int32))
            for method in ("scan", "sort"):
                f = jax.jit(lambda k, q, m=method: jnp.searchsorted(
                    k, q, method=m))
                dt = timeit(f, keys, q)
                results[f"lookup_{method}_{N}"] = (
                    dt, f"27N={27 * N} queries")

    if "spconv" in names:
        # one sparse conv: 27x ([N,Cin] row-gather + matmul) scan vs
        # gather-once [N,27*Cin] @ [27*Cin,Cout] single matmul
        import functools
        for N, Cin, Cout in ((8192, 64, 64), (32768, 64, 64),
                             (98304, 64, 128), (32768, 256, 256)):
            feats = jnp.asarray(rng.rand(N, Cin).astype(np.float32))
            w = jnp.asarray(
                (rng.rand(27, Cin, Cout) * .01).astype(np.float32))
            idx = jnp.asarray(rng.randint(0, N, (27, N)).astype(np.int32))
            fnd = jnp.asarray(rng.rand(27, N) < 0.6)

            def scan_conv(feats, w, idx, fnd):
                def body(acc, inp):
                    wk, ik, fk = inp
                    g = jnp.take(feats, ik, axis=0)
                    g = jnp.where(fk[:, None], g, 0.0)
                    return acc + jnp.dot(
                        g, wk, preferred_element_type=jnp.float32), None
                acc, _ = jax.lax.scan(
                    body, jnp.zeros((N, Cout), jnp.float32),
                    (w, idx, fnd))
                return acc

            def big_conv(feats, w, idx, fnd):
                g = jnp.take(feats, idx.reshape(-1), axis=0)       # [27N,C]
                g = jnp.where(fnd.reshape(-1)[:, None], g, 0.0)
                g = g.reshape(27, N, Cin).transpose(1, 0, 2).reshape(
                    N, 27 * Cin)
                return jnp.dot(g, w.reshape(27 * Cin, Cout),
                               preferred_element_type=jnp.float32)

            for nm, fn in (("scan", scan_conv), ("big", big_conv)):
                for dt_ in ("f32", "bf16"):
                    ff = feats if dt_ == "f32" else feats.astype(
                        jnp.bfloat16)
                    ww = w if dt_ == "f32" else w.astype(jnp.bfloat16)
                    fj = jax.jit(fn)
                    t = timeit(fj, ff, ww, idx, fnd)
                    flops = 2 * 27 * N * Cin * Cout
                    results[f"spconv_{nm}_{dt_}_{N}x{Cin}x{Cout}"] = (
                        t, f"{flops / t / 1e12:.1f} TFLOP/s")

    if "gentrans" in names:
        # generative transpose: [N,Cin]@[Cin,8Cout] + sort of 8N keys with
        # [8N,Cout] payload rows
        from cnrma_tpu.ops.voxelize import sort_by_key
        for N, Cin, Cout in ((2048, 512, 256), (16384, 128, 64)):
            feats = jnp.asarray(rng.rand(N, Cin).astype(np.float32))
            w = jnp.asarray(
                (rng.rand(Cin, 8 * Cout) * .01).astype(np.float32))
            keys = jnp.asarray(
                rng.randint(0, 1 << 28, 8 * N).astype(np.int32))

            def f(feats, w, keys):
                out = jnp.dot(feats, w).reshape(8 * N, Cout)
                ks, fs = sort_by_key(keys, out)
                return ks, fs
            fj = jax.jit(f)
            t = timeit(fj, feats, w, keys)
            results[f"gentrans_{N}x{Cin}x{Cout}"] = (t, f"8N={8 * N}")

    if "rect" in names:
        # Candidate reformulation of the volume-accumulation gather
        # (doc/performance.md: 982 ms stage, ~110M row gathers/scene at
        # the 0.21 G rows/s XLA gather ceiling).  Instead of one row
        # gather per in-frustum voxel, load each kept tile's pixel
        # FOOTPRINT RECT (few long contiguous spans) and pick every
        # voxel's pixel out of the rect with a one-hot matmul on the MXU.
        # Index count drops ~20x (K*Rh span starts vs K*512 rows); the
        # selection moves to compute.  Shapes = one full-scale view:
        # K=4096 kept 8^3 tiles, rect 24x32, feature 120x160x34.
        # MICRO_SMALL=1 shrinks everything for a CPU smoke run.
        small = bool(os.environ.get("MICRO_SMALL"))
        H, W, C = 120, 160, 34
        K, Rh, Rw, t3 = (64, 8, 16, 64) if small else (4096, 24, 32, 512)
        Rp = Rh * Rw
        feat = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
        ry0 = jnp.asarray(rng.randint(0, H - Rh, K).astype(np.int32))
        rx0 = jnp.asarray(rng.randint(0, W - Rw, K).astype(np.int32))
        # per-voxel pixel inside its tile's rect (local coords)
        ply = jnp.asarray(rng.randint(0, Rh, (K, t3)).astype(np.int32))
        plx = jnp.asarray(rng.randint(0, Rw, (K, t3)).astype(np.int32))
        p_local = ply * Rw + plx                              # [K, t3]

        # baseline: the current per-voxel row gather at the same volume
        gidx = jnp.asarray(
            rng.randint(0, H * W, K * t3).astype(np.int32))
        fb = jax.jit(lambda f, i: jnp.take(f.reshape(H * W, C), i,
                                           axis=0))
        dt = timeit(fb, feat, gidx)
        results["rect_base_rowgather"] = (
            dt, f"{K * t3 / dt / 1e9:.3f} G rows/s")

        # 1. span gather alone: [K*Rh] (y, x0) starts, slices (1, Rw, C)
        starts = jnp.stack(
            [jnp.repeat(ry0, Rh) + jnp.tile(jnp.arange(Rh), K),
             jnp.repeat(rx0, Rh)], axis=-1).astype(jnp.int32)  # [K*Rh,2]
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))

        def span_gather(f, s):
            out = jax.lax.gather(
                f, s, dn, slice_sizes=(1, Rw, C),
                mode=jax.lax.GatherScatterMode.CLIP)
            return out.reshape(K, Rp, C)
        fj = jax.jit(span_gather)
        dt = timeit(fj, feat, starts)
        results["rect_span_gather"] = (
            dt, f"{K * Rh / dt / 1e6:.2f} M spans/s, "
                f"{K * Rp * C * 4 / dt / 1e9:.1f} GB/s")
        fj16 = jax.jit(span_gather)
        dt = timeit(fj16, feat.astype(jnp.bfloat16), starts)
        results["rect_span_gather_bf16"] = (
            dt, f"{K * Rh / dt / 1e6:.2f} M spans/s")

        # 2. one-hot select out of the rect, scan-chunked (the [chunk,
        # t3, Rp] one-hot operand must stay ~100 MB).  Two matmul
        # orientations: vpc (output minor dim C=34, lane-padded 4x) and
        # cpv (output minor dim t3=512, only sublane padding on C).
        CH = min(512, K)
        n_ch = K // CH

        def onehot_vpc(rect, pl):
            # rect [K,Rp,C] bf16, pl [K,t3] -> [K,t3,C]
            rect = rect.reshape(n_ch, CH, Rp, -1)
            pl = pl.reshape(n_ch, CH, t3)

            def body(_, inp):
                r, p = inp
                oh = (jax.lax.broadcasted_iota(
                    jnp.int32, (CH, t3, Rp), 2) == p[:, :, None]
                ).astype(r.dtype)
                return None, jnp.einsum(
                    "kvp,kpc->kvc", oh, r,
                    preferred_element_type=jnp.float32)
            _, out = jax.lax.scan(body, None, (rect, pl))
            return out

        def onehot_cpv(rect, pl):
            # rect [K,Rp,C] -> transposed matmul, output [K,C,t3]
            rect = rect.reshape(n_ch, CH, Rp, -1)
            pl = pl.reshape(n_ch, CH, t3)

            def body(_, inp):
                r, p = inp
                oh = (jax.lax.broadcasted_iota(
                    jnp.int32, (CH, Rp, t3), 1) == p[:, None, :]
                ).astype(r.dtype)
                return None, jnp.einsum(
                    "kpc,kpv->kcv", r, oh,
                    preferred_element_type=jnp.float32)
            _, out = jax.lax.scan(body, None, (rect, pl))
            return out

        rect16 = jnp.asarray(
            rng.rand(K, Rp, C).astype(np.float32)).astype(jnp.bfloat16)
        for nm, fn in (("vpc", onehot_vpc), ("cpv", onehot_cpv)):
            fj = jax.jit(fn)
            dt = timeit(fj, rect16, p_local)
            flops = 2 * K * t3 * Rp * C
            results[f"rect_onehot_{nm}"] = (
                dt, f"{flops / dt / 1e12:.1f} TFLOP/s useful")

        # 3. fused end-to-end candidate vs baseline, per view
        def rect_full(f, s, pl):
            rect = span_gather(f, s).astype(jnp.bfloat16)
            return onehot_cpv(rect, pl)
        fj = jax.jit(rect_full)
        dt = timeit(fj, feat, starts, p_local)
        results["rect_full_cpv"] = (
            dt, f"vs base {K * t3} row gathers")

    if "lutmap" in names:
        # Kernel-map lookup via a dense rank LUT on the stride lattice
        # (scatter N ranks once, then 27N direct gathers) vs the
        # sort-based searchsorted.  Viable for stride>=4 coordinate sets
        # (lattice fits memory: s4 -> 512*512*128 cells = 134 MB int32).
        small = bool(os.environ.get("MICRO_SMALL"))
        gx, gy, gz = (64, 64, 16) if small else (512, 512, 128)
        cells = gx * gy * gz
        for N in (512,) if small else (32768, 131072):
            lin = rng.choice(cells, N, replace=False).astype(np.int32)
            lin.sort()
            keys = jnp.asarray(lin)
            q = jnp.asarray(rng.randint(0, cells, 27 * N).astype(np.int32))
            f_sort = jax.jit(lambda k, q: jnp.searchsorted(
                k, q, method="sort"))
            results[f"lutmap_sort_{N}"] = (
                timeit(f_sort, keys, q), f"27N={27 * N}")

            def f_lut(k, q):
                tbl = jnp.zeros((cells,), jnp.int32).at[k].set(
                    jnp.arange(1, N + 1, dtype=jnp.int32),
                    mode="drop", unique_indices=True)
                idx = jnp.take(tbl, q)
                return idx - 1, idx > 0
            results[f"lutmap_lut_{N}"] = (
                timeit(jax.jit(f_lut), keys, q),
                f"{cells / 1e6:.0f}M-cell table")

            def f_lut_cached(tbl, q):
                idx = jnp.take(tbl, q)
                return idx - 1, idx > 0
            tbl = jnp.zeros((cells,), jnp.int32).at[keys].set(
                jnp.arange(1, N + 1, dtype=jnp.int32))
            results[f"lutmap_gatheronly_{N}"] = (
                timeit(jax.jit(f_lut_cached), tbl, q),
                f"27N={27 * N} direct gathers")

    if "conv3d" in names:
        x = jnp.asarray(rng.rand(1, 256, 256, 96, 32).astype(np.float32))
        w = jnp.asarray(rng.rand(3, 3, 3, 32, 32).astype(np.float32) * .01)
        f = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC")))
        dt = timeit(f, x, w)
        flops = 2 * 256 * 256 * 96 * 27 * 32 * 32
        results["conv3d"] = (dt, f"{flops / dt / 1e12:.1f} TFLOP/s")

    if "conv3dvar" in names:
        # U-Net wall diagnosis: the finest level's k3 conv3d at C=32
        # channels-last runs far below the MXU roofline.  Compare dtypes,
        # layouts, and channel widths to find where the padding/layout
        # tax is paid (doc/performance.md: stage 290 ms vs ~30 ms
        # roofline).
        small = bool(os.environ.get("MICRO_SMALL"))
        X, Y, Z = (32, 32, 16) if small else (256, 256, 96)
        flops27 = 2 * X * Y * Z * 27
        for C, dt_ in ((32, "f32"), (32, "bf16"), (64, "bf16")):
            dd = jnp.float32 if dt_ == "f32" else jnp.bfloat16
            x = jnp.asarray(rng.rand(1, X, Y, Z, C).astype(np.float32)
                            ).astype(dd)
            w = jnp.asarray((rng.rand(3, 3, 3, C, C) * .01
                             ).astype(np.float32)).astype(dd)
            f = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
                preferred_element_type=jnp.float32))
            t = timeit(f, x, w)
            results[f"conv3d_nxyzc_{dt_}_c{C}"] = (
                t, f"{flops27 * C * C / t / 1e12:.1f} TFLOP/s")
        # channels-FIRST: minor dim is Z (96 -> 128 pad) instead of C
        for C in (32,):
            x = jnp.asarray(rng.rand(1, C, X, Y, Z).astype(np.float32)
                            ).astype(jnp.bfloat16)
            w = jnp.asarray((rng.rand(3, 3, 3, C, C) * .01
                             ).astype(np.float32)).astype(jnp.bfloat16)
            f = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NCXYZ", "XYZIO", "NCXYZ"),
                preferred_element_type=jnp.float32))
            t = timeit(f, x, w)
            results[f"conv3d_ncxyz_bf16_c{C}"] = (
                t, f"{flops27 * C * C / t / 1e12:.1f} TFLOP/s")
        # im2col-free matmul equivalent: fold (X,Y,Z) to rows, shift-sum
        # 27 [M,C]@[C,C] matmuls (what ops/sparse.py does for sparse) as
        # a dense-roofline reference point
        C = 32
        x = jnp.asarray(rng.rand(X * Y * Z, C).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray((rng.rand(27, C, C) * .01).astype(np.float32)
                        ).astype(jnp.bfloat16)

        def shiftsum(x, w):
            def body(acc, wk):
                return acc + jnp.dot(x, wk,
                                     preferred_element_type=jnp.float32), None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((x.shape[0], C), jnp.float32), w)
            return acc
        t = timeit(jax.jit(shiftsum), x, w)
        results["conv3d_27matmul_bf16_c32"] = (
            t, f"{flops27 * C * C / t / 1e12:.1f} TFLOP/s (no shifts)")

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
