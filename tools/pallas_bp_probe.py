#!/usr/bin/env python
"""Prototype + bench the Pallas rect-tile volume gather (VERDICT r4 item 2).

The volume-accumulation wall is the per-voxel feature gather: XLA row
gathers run at ~0.21 G rows/s regardless of hints (doc/performance.md),
so the tiled path's K*t3 rows/view = ~15 ms/view = ~750 ms/scene at the
full rung.  The round-3 XLA rect formulation (span gather + one-hot
einsum) lost at full scale because the [chunk, rect, t3] one-hot operand
materializes in HBM.  This kernel keeps everything on-chip:

  - the view's feature map is repacked [H/4, W, 4*C=128] (4 adjacent
    image ROWS share the 128 lanes) and stays VMEM-RESIDENT across the
    whole grid (~1.2 MB at full scale) — the per-tile "rect" is a plain
    VMEM slice, zero HBM traffic;
  - the rect x-start is aligned to 16 so Mosaic can prove the sublane
    slice legal (pl.multiple_of), y-start (dim 0) is unconstrained;
  - the one-hot is built TRANSPOSED from a [1, t3] code row (lane-
    natural broadcast, no relayout) and contracted on the MXU as
    A^T @ B -> [4C, t3] in one dot;
  - the row-phase select (y % 4) is 4 static sublane slices + a lane
    mask (VPU), emitting [C, t3] channel-major exactly as the XLA rect
    consumer wants.

Codes are precomputed by the XLA caller from the SAME px/py the scoring
uses, so kernel and selection can never disagree on a pixel.

Usage:
  python tools/pallas_bp_probe.py check   # interpret-mode + device parity
  python tools/pallas_bp_probe.py bench   # full-scale per-view timing
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

PACK = 4          # image rows sharing the 128 lanes
XALIGN = 16       # rect x-start alignment (bf16 sublane tile)


def make_kernel(Hq, W, Rhq, Rw, C, t3, K1, feat_dtype, out_dtype,
                interpret=False, tb=1):
    """featq [Hq, W, PACK*C] -> rows [K1, C, t3] rect one-hot gather.

    ``tb`` tiles are processed per grid step: the 1-tile/step variant is
    step-overhead-bound (measured ~0.95 us/step fixed cost = ~6 ms/view
    at K1=6144 regardless of rect size), so batching tiles amortizes the
    per-step code DMA + loop overhead.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rp = Rhq * Rw
    assert K1 % tb == 0

    def kernel(ryq0_ref, rx0_ref, code_ref, featq_hbm, out_ref,
               featq_vmem, sem):
        k = pl.program_id(0)

        # Load the whole feature map into VMEM ONCE (step 0) and keep it
        # resident: a grid-invariant in_spec block still re-DMAs per step
        # (measured 9.85 ms/view = exactly 1.2 MB x K1 of HBM traffic).
        @pl.when(k == 0)
        def _():
            cp = pltpu.make_async_copy(featq_hbm, featq_vmem, sem)
            cp.start()
            cp.wait()

        for i in range(tb):
            ryq0 = ryq0_ref[k * tb + i]
            rx0 = pl.multiple_of(rx0_ref[k * tb + i], XALIGN)
            rect = featq_vmem[pl.ds(ryq0, Rhq), pl.ds(rx0, Rw), :]
            rect = rect.reshape(rp, PACK * C)                # [rp, 128]
            pc = code_ref[i, 0, :]                           # [t3] lanes
            p = pc >> 2
            iota_p = jax.lax.broadcasted_iota(jnp.int32, (rp, t3), 0)
            ohT = (iota_p == p[None, :]).astype(rect.dtype)  # [rp, t3]
            out4T = jax.lax.dot_general(
                rect, ohT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [4C, t3]
            ym = pc & 3
            acc = jnp.zeros((C, t3), jnp.float32)
            for g in range(PACK):
                acc = acc + jnp.where((ym == g)[None, :],
                                      out4T[g * C:(g + 1) * C, :], 0.0)
            out_ref[i] = acc.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(K1 // tb,),
        in_specs=[
            pl.BlockSpec((tb, 1, t3),
                         lambda k, ryq0, rx0: (k, 0, 0)),    # code
            pl.BlockSpec(memory_space=pltpu.ANY),            # featq HBM
        ],
        out_specs=pl.BlockSpec((tb, C, t3),
                               lambda k, ryq0, rx0: (k, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hq, W, PACK * C), feat_dtype),
            pltpu.SemaphoreType.DMA(()),
        ])

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K1, C, t3), out_dtype),
        grid_spec=grid_spec, interpret=interpret)

    def run(ryq0, rx0, code, featq):
        return call(ryq0, rx0, code[:, None, :], featq)

    return run


def ref_gather(featq, ryq0, rx0, code, Rhq, Rw, C, t3):
    """Numpy oracle: exactly what the kernel must produce."""
    K1 = ryq0.shape[0]
    out = np.zeros((K1, C, t3), np.float32)
    rp = Rhq * Rw
    for k in range(K1):
        rect = featq[ryq0[k]:ryq0[k] + Rhq, rx0[k]:rx0[k] + Rw, :]
        rect = rect.reshape(rp, PACK * C).astype(np.float32)
        for v in range(t3):
            pcv = code[k, v]
            p, ym = pcv >> 2, pcv & 3
            if 0 <= p < rp:
                out[k, :, v] = rect[p, ym * C:(ym + 1) * C]
    return out


def synth(rng, Hq, W, Rhq, Rw, C, t3, K1, dtype):
    import jax.numpy as jnp
    featq = rng.randn(Hq, W, PACK * C).astype(np.float32)
    ryq0 = rng.randint(0, Hq - Rhq + 1, K1).astype(np.int32)
    rx0 = (rng.randint(0, (W - Rw) // XALIGN + 1, K1)
           * XALIGN).astype(np.int32)
    rp = Rhq * Rw
    code = rng.randint(0, rp * PACK, (K1, t3)).astype(np.int32)
    inv = rng.rand(K1, t3) < 0.3       # invalid -> zero columns
    code[inv] = rp * PACK
    return (jnp.asarray(featq, dtype), jnp.asarray(ryq0),
            jnp.asarray(rx0), jnp.asarray(code))


def main():
    from cnrma_tpu.utils.comp_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    rng = np.random.RandomState(0)

    if mode == "check":
        on_tpu = jax.default_backend() == "tpu"
        Hq, W, Rhq, Rw, C, t3, K1 = 16, 48, 8, 16, 32, 64, 8
        featq, ryq0, rx0, code = synth(rng, Hq, W, Rhq, Rw, C, t3, K1,
                                       jnp.bfloat16)
        want = ref_gather(np.asarray(featq, np.float32),
                          np.asarray(ryq0), np.asarray(rx0),
                          np.asarray(code), Rhq, Rw, C, t3)
        for interp in ([True] if not on_tpu else [True, False]):
            for tb in (1, 4):
                run = make_kernel(Hq, W, Rhq, Rw, C, t3, K1,
                                  jnp.bfloat16, jnp.bfloat16,
                                  interpret=interp, tb=tb)
                got = np.asarray(jax.jit(run)(ryq0, rx0, code, featq),
                                 dtype=np.float32)
                err = np.max(np.abs(got - want.astype(jnp.bfloat16)
                                    .astype(np.float32)))
                print(f"interpret={interp} tb={tb}: max err {err}")
                assert err == 0.0, err
        print("CHECK OK")
        return

    # bench: full-scale shapes (256x256x96 grid, 120x160x32 stride-4 feats)
    Hq, W, C, t3 = 30, 160, 32, 512
    Rhq = int(os.environ.get("RHQ", "16"))
    Rw = int(os.environ.get("RW", "64"))
    K1 = int(os.environ.get("K1", "6144"))
    TB = int(os.environ.get("TB", "1"))
    print(f"devices: {jax.devices()}  Rhq={Rhq} Rw={Rw} K1={K1} TB={TB}")
    featq, ryq0, rx0, code = synth(rng, Hq, W, Rhq, Rw, C, t3, K1,
                                   jnp.bfloat16)
    run = jax.jit(make_kernel(Hq, W, Rhq, Rw, C, t3, K1,
                              jnp.bfloat16, jnp.bfloat16, tb=TB))

    def force(r):
        jax.device_get(r.reshape(-1)[:1])

    t0 = time.perf_counter()
    out = run(ryq0, rx0, code, featq)
    force(out)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(ryq0, rx0, code, featq)
    force(out)
    dt = (time.perf_counter() - t0) / iters
    rows = K1 * t3
    print(f"pallas rect gather: {dt * 1e3:.2f} ms/view  "
          f"({rows / dt / 1e9:.2f} G rows/s equiv; XLA ceiling ~0.21)")

    # XLA baseline at the same shapes: K1*t3 row gathers
    feat_rows = jnp.asarray(rng.randn(Hq * PACK * W, C), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, Hq * PACK * W, (K1 * t3,)),
                      jnp.int32)

    @jax.jit
    def xla_gather(f, i):
        return jnp.take(f, i, axis=0)

    force(xla_gather(feat_rows, idx))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = xla_gather(feat_rows, idx)
    force(r)
    dt2 = (time.perf_counter() - t0) / iters
    print(f"xla row gather:     {dt2 * 1e3:.2f} ms/view "
          f"({rows / dt2 / 1e9:.2f} G rows/s)")


if __name__ == "__main__":
    main()
