"""Pallas TPU kernel for the rect-footprint volume feature gather.

The volume-accumulation wall is the per-voxel pixel-feature fetch: XLA
row gathers run at the measured ~0.21 G rows/s index-rate ceiling
regardless of layout/dtype hints (doc/performance.md), and the pure-XLA
rect reformulation (span gather + one-hot einsum, ``_rect_gather_rows``)
loses at full scale because the [chunk, rect, t3] one-hot operand
round-trips through HBM.  This kernel keeps the whole rect select
on-chip (measured 5.4 ms/view vs 12.7 ms XLA at the full ScanNet rung):

- the view's feature map is repacked ``[H/4, W, 4*C = 128]`` — PACK=4
  adjacent image ROWS share the 128-lane minor dim — and stays
  VMEM-resident across the whole grid (~1.2 MB at the full rung), so a
  per-tile "rect" is a plain VMEM slice with zero HBM traffic;
- the rect x-start is aligned to 16 so Mosaic can prove the
  second-minor slice legal (``pl.multiple_of``); the y-start (dim 0,
  untiled) is unconstrained, but must be a multiple of PACK in image
  rows so the packed row phase stays ``py & 3``;
- the voxel->pixel one-hot is built transposed from a ``[1, t3]`` code
  row (lane-natural broadcast, no relayout) and contracted on the MXU
  as ``rect^T @ onehot -> [4C, t3]`` in one dot;
- the row-phase select (``y % 4``) is 4 static sublane slices + a lane
  mask on the VPU, emitting ``[C, t3]`` channel-major exactly as the
  accumulator consumer wants;
- ``tb`` tiles are processed per grid step: the 1-tile/step variant is
  step-overhead-bound (~0.95 us/step fixed cost — tiny code-block DMAs
  are latency-bound), so batching tiles amortizes it (measured
  6.1 -> 5.4 ms/view from tb=8 -> 16 at the full rung).

Codes are precomputed by the XLA caller from the SAME px/py the
selection/backward use, so kernel and selection can never disagree on a
pixel.  Reference semantics being replaced: the per-voxel
``feats[:, py, px]`` fetch of ``ray_marching.py:backproject`` (:52-60).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

PACK = 4      # adjacent image rows sharing the 128-lane minor dim
XALIGN = 16   # rect x-start alignment (second-minor tile, bf16)
YALIGN = 4    # rect y-start alignment in image rows (= PACK)

_TB_CANDIDATES = (16, 8, 4, 2, 1)


def pick_tb(k1: int) -> int:
    """Largest tiles-per-step batch that divides the rect capacity."""
    for tb in _TB_CANDIDATES:
        if k1 % tb == 0:
            return tb
    return 1


def rect_gather_eligible(H: int, W: int, C: int, rh: int, rw: int,
                         k1: int, t3: int) -> bool:
    """Static-shape conditions under which the kernel applies.

    C == 32 packs exactly 128 lanes; H/rh multiples of PACK keep the
    row phase static; W/rw multiples of XALIGN keep the clipped x-start
    aligned ((W - rw) % 16 == 0 so clip lands on the lattice); t3 a
    lane multiple avoids padded one-hot columns.  The feature map must
    fit comfortably in VMEM alongside the per-step buffers.
    """
    return (C == 32 and PACK * C == 128
            and H % YALIGN == 0 and rh % YALIGN == 0 and rh <= H
            and W % XALIGN == 0 and rw % XALIGN == 0 and rw <= W
            and t3 % 128 == 0 and k1 >= 1
            and H * W * C * 4 <= 8 * 1024 * 1024)


@functools.lru_cache(maxsize=None)
def _make_kernel(Hq, W, Rhq, Rw, C, t3, K1, feat_dtype_name,
                 out_dtype_name, interpret, tb):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    feat_dtype = jnp.dtype(feat_dtype_name)
    out_dtype = jnp.dtype(out_dtype_name)
    rp = Rhq * Rw
    assert K1 % tb == 0
    any_space = getattr(pl, "ANY", None) or pltpu.ANY

    def kernel(ryq0_ref, rx0_ref, code_ref, featq_hbm, out_ref,
               featq_vmem, sem):
        k = pl.program_id(0)

        # Load the whole feature map into VMEM ONCE (step 0) and keep
        # it resident: a grid-invariant in_spec block still re-DMAs per
        # step (measured 9.85 ms/view = exactly featq_bytes x K1 of
        # HBM traffic).
        @pl.when(k == 0)
        def _():
            cp = pltpu.make_async_copy(featq_hbm, featq_vmem, sem)
            cp.start()
            cp.wait()

        for i in range(tb):
            ryq0 = ryq0_ref[k * tb + i]
            rx0 = pl.multiple_of(rx0_ref[k * tb + i], XALIGN)
            rect = featq_vmem[pl.ds(ryq0, Rhq), pl.ds(rx0, Rw), :]
            rect = rect.reshape(rp, PACK * C)                 # [rp, 128]
            pc = code_ref[i, 0, :]                            # [t3] lanes
            p = pc >> 2
            iota_p = jax.lax.broadcasted_iota(jnp.int32, (rp, t3), 0)
            ohT = (iota_p == p[None, :]).astype(rect.dtype)   # [rp, t3]
            out4T = jax.lax.dot_general(
                rect, ohT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [4C, t3]
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
                         lambda k, ryq0, rx0: (k, 0, 0)),     # code
            pl.BlockSpec(memory_space=any_space),             # featq HBM
        ],
        out_specs=pl.BlockSpec((tb, C, t3),
                               lambda k, ryq0, rx0: (k, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hq, W, PACK * C), feat_dtype),
            pltpu.SemaphoreType.DMA(()),
        ])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K1, C, t3), out_dtype),
        grid_spec=grid_spec, interpret=bool(interpret))


def rect_gather(feat: jnp.ndarray, ry0: jnp.ndarray, rx0: jnp.ndarray,
                code: jnp.ndarray, rh: int, rw: int, out_dtype,
                interpret: bool = False) -> jnp.ndarray:
    """Gather ``[K1, C, t3]`` per-tile voxel features from pixel rects.

    Args:
        feat: [H, W, C] feature map (bf16 or fp32), C == 32.
        ry0: [K1] int32 rect top pixel row, multiple of YALIGN (after
            clipping to [0, H - rh] — eligibility guarantees the clip
            bound stays on the lattice).
        rx0: [K1] int32 rect left pixel col, multiple of XALIGN.
        code: [K1, t3] int32 packed local pixel per voxel:
            ``(((py - ry0) >> 2) * rw + (px - rx0)) << 2 | (py & 3)``
            for voxels to fetch, ``rh // 4 * rw * 4`` (one past the
            last position) for voxels that must come back zero.
        rh, rw: static rect size in pixels (rh % 4 == 0, rw % 16 == 0).
        out_dtype: output dtype (the accumulator dtype).

    Returns:
        [K1, C, t3] rows, zero where code marked invalid.
    """
    H, W, C = feat.shape
    K1, t3 = code.shape
    tb = pick_tb(K1)
    featq = (feat.reshape(H // PACK, PACK, W, C)
             .transpose(0, 2, 1, 3).reshape(H // PACK, W, PACK * C))
    call = _make_kernel(H // PACK, W, rh // PACK, rw, C, t3, K1,
                        jnp.dtype(feat.dtype).name,
                        jnp.dtype(out_dtype).name, bool(interpret), tb)
    return call((ry0 // PACK).astype(jnp.int32), rx0.astype(jnp.int32),
                code[:, None, :].astype(jnp.int32), featq)
