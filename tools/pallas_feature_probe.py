#!/usr/bin/env python
"""Probe which Pallas/Mosaic features the remote TPU compile helper accepts.

Round-3 finding (doc/performance.md): `tpu.dynamic_gather` (from
`jnp.take`/`take_along_axis` inside a kernel) is rejected with HTTP 500
by the tunnel's AOT compile helper.  The rect one-hot accumulation
kernel planned for the volume stage needs NONE of that — only the
features probed here:

  basic        whole-block VPU add
  dot          MXU matmul with preferred_element_type
  dyn_slice    pl.ds dynamic row slice from a VMEM block (runtime start)
  prefetch     PrefetchScalarGridSpec driving an out BlockSpec index_map
  alias        input_output_aliases accumulate-in-place
  onehot       iota==idx one-hot [128,256] @ [256,32] gather-by-matmul
  dma          explicit make_async_copy HBM->VMEM scratch

Usage: python tools/pallas_feature_probe.py [name ...]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    from cnrma_tpu.utils.comp_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    names = sys.argv[1:] or ["basic", "dot", "dyn_slice", "prefetch",
                             "alias", "onehot", "dma"]
    print("devices:", jax.devices())

    def run(name, fn, *args, want=None):
        try:
            out = np.asarray(jax.jit(fn)(*args))
            ok = True if want is None else np.allclose(out, want, atol=1e-2)
            print(f"{name:10s} OK match={ok}")
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"{name:10s} FAIL {type(e).__name__}: {msg}")

    if "basic" in names:
        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:] + 1.0
        x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
        run("basic", lambda v: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(v),
            x, want=np.asarray(x) + 1)

    if "dot" in names:
        def k(a_ref, b_ref, o_ref):
            o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                               preferred_element_type=jnp.float32)
        a = jnp.ones((128, 256), jnp.bfloat16)
        b = jnp.ones((256, 128), jnp.bfloat16)
        run("dot", lambda u, v: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))(
            u, v), a, b, want=np.full((128, 128), 256.0))

    if "dyn_slice" in names:
        def k(s_ref, x_ref, o_ref):
            start = s_ref[0]
            o_ref[:] = x_ref[pl.ds(start, 8), :]
        x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
        s = jnp.array([16], jnp.int32)
        run("dyn_slice", lambda sv, xv: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))(sv, xv),
            s, x, want=np.asarray(x)[16:24])

    if "prefetch" in names:
        # out block index driven by a prefetched scalar map (the
        # tile-scatter pattern: grid step k writes block tids[k])
        def k(tid_ref, x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0
        x = jnp.arange(4 * 8 * 128, dtype=jnp.float32).reshape(4, 8, 128)
        tids = jnp.array([2, 0, 3, 1], jnp.int32)
        want = np.zeros((4, 8, 128), np.float32)
        for kk in range(4):
            want[int(tids[kk])] = np.asarray(x)[kk] * 2
        run("prefetch", lambda tv, xv: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(4,),
                in_specs=[pl.BlockSpec(
                    (1, 8, 128), lambda i, tid: (i, 0, 0))],
                out_specs=pl.BlockSpec(
                    (1, 8, 128), lambda i, tid: (tid[i], 0, 0))))(tv, xv),
            tids, x, want=want)

    if "alias" in names:
        def k(acc_ref, x_ref, o_ref):
            o_ref[:] = acc_ref[:] + x_ref[:]
        acc = jnp.ones((8, 128), jnp.float32)
        x = jnp.full((8, 128), 3.0)
        run("alias", lambda a, v: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            input_output_aliases={0: 0})(a, v),
            acc, x, want=np.full((8, 128), 4.0))

    if "onehot" in names:
        # gather-by-matmul: rows[i] = table[idx[i]] via (iota==idx) @ table
        def k(idx_ref, tab_ref, o_ref):
            lanes = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 1)
            oh = (lanes == idx_ref[:]).astype(jnp.bfloat16)
            o_ref[:] = jnp.dot(oh, tab_ref[:],
                               preferred_element_type=jnp.float32)
        rng = np.random.RandomState(0)
        idx = rng.randint(0, 256, (128, 1)).astype(np.int32)
        tab = rng.randn(256, 128).astype(np.float32)
        want = tab[idx[:, 0]]
        run("onehot", lambda iv, tv: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))(
            iv, tv.astype(jnp.bfloat16)),
            jnp.asarray(np.broadcast_to(idx, (128, 256)).copy()),
            jnp.asarray(tab), want=want.astype(np.float32))

    if "dma" in names:
        def k(hbm_ref, o_ref):
            def inner(scratch, sem):
                dma = pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(8, 8), :], scratch, sem)
                dma.start()
                dma.wait()
                o_ref[:] = scratch[:] * 2.0
            pl.run_scoped(inner, pltpu.VMEM((8, 128), jnp.float32),
                          pltpu.SemaphoreType.DMA(()))
        x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
        run("dma", lambda v: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)])(v),
            x, want=np.asarray(x)[8:16] * 2)


if __name__ == "__main__":
    main()
