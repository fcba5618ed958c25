"""Pallas TPU kernel: one-hot MXU lookup into a small VMEM table.

The ray-march coarse pre-march (empty-space skipping,
``ops/ray_marching.py:ray_march_neus``) samples the occupancy grid at
``HW x n_coarse`` positions per view (~730k at the full ScanNet rung).
XLA lowers that to a row gather running at the measured ~0.21 G rows/s
index-rate ceiling (doc/performance.md "Why MFU is the wrong lens") —
~3.5 ms/view for a table that is only 48 KB.  ``tpu.dynamic_gather`` is
rejected by this toolchain's compiler, so this kernel applies the
one-hot MXU contraction pattern proven by ``ops/pallas_bp.py``:

- the table (occupancy grid, [R, 128] rows x lanes, R <= 184) is copied
  to VMEM once and stays resident across the grid;
- each step processes ``SB`` groups of ``S`` sample codes; a group
  builds the row one-hot TRANSPOSED from its code row ([R, S] — lane-
  natural broadcast) and contracts it on the MXU:
  ``table^T @ onehot -> [128, S]`` (exact in bf16: the operands are
  one-hot / 0-1 values, accumulation is fp32);
- the lane select is an elementwise sublane one-hot multiply + cross-
  sublane reduce on the VPU, emitting the [S] values.

Codes encode ``row * 128 + lane``; any code >= R * 128 (out-of-volume
sample) returns exactly 0.0 — the caller's ``where(valid, v, 0)``
semantics, baked in.

Reference semantics replaced: the per-sample occupancy fetch feeding
``hit`` in the skipped ray march — itself an optimization of the dense
TSDF march of ``ray_marching.py:739-745``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

S_LANES = 512          # samples per inner one-hot contraction
_SB_CANDIDATES = (8, 4, 2, 1)
MAX_ROWS = 184         # table rows cap (~92 KB VMEM fp32)


def lookup_eligible(n_rows: int, n_codes: int) -> bool:
    """Kernel applies when the table is small enough that the one-hot
    contraction (R * 128 MACs per sample) beats the gather ceiling, and
    the code count keeps the grid non-trivial."""
    return 1 <= n_rows <= MAX_ROWS and n_codes >= S_LANES


def _pick_sb(n_groups: int) -> int:
    for sb in _SB_CANDIDATES:
        if n_groups % sb == 0:
            return sb
    return 1


@functools.lru_cache(maxsize=None)
def _make_kernel(R, n_groups, sb, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    any_space = getattr(pl, "ANY", None) or pltpu.ANY

    def kernel(code_ref, table_hbm, out_ref, table_vmem, sem):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            cp = pltpu.make_async_copy(table_hbm, table_vmem, sem)
            cp.start()
            cp.wait()

        tab = table_vmem[...]                               # [R, 128]
        for i in range(sb):
            pc = code_ref[i, 0, :]                          # [S] lanes
            row = pc >> 7
            lane = pc & 127
            ohT = (jax.lax.broadcasted_iota(
                jnp.int32, (R, S_LANES), 0) == row[None, :])
            valsT = jax.lax.dot_general(
                tab.astype(jnp.bfloat16), ohT.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [128, S]
            sel = (jax.lax.broadcasted_iota(
                jnp.int32, (128, S_LANES), 0) == lane[None, :])
            out_ref[i, 0, :] = jnp.sum(
                jnp.where(sel, valsT, 0.0), axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(n_groups // sb,),
        in_specs=[
            pl.BlockSpec((sb, 1, S_LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec(memory_space=any_space),           # table HBM
        ],
        out_specs=pl.BlockSpec((sb, 1, S_LANES), lambda g: (g, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_groups, 1, S_LANES),
                                       jnp.float32),
        grid_spec=grid_spec, interpret=bool(interpret))


def onehot_lookup(table: jnp.ndarray, codes: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """``values[i] = table.ravel()[codes[i]]`` for a small table.

    Args:
        table: [R, 128] fp32 (R <= MAX_ROWS).  Values must be exactly
            representable in bf16 (occupancy grids are 0/1) — the MXU
            contraction is then exact.
        codes: [N] int32 flat indices; >= R * 128 (or < 0 mapped there
            by the caller) returns 0.0.

    Returns:
        [N] fp32 values.
    """
    R = table.shape[0]
    n = codes.shape[0]
    pad = (-n) % S_LANES
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.full((pad,), R * 128, jnp.int32)])
    n_groups = codes.shape[0] // S_LANES
    sb = _pick_sb(n_groups)
    # out-of-range codes -> a row the iota can never match
    codes = jnp.where((codes < 0) | (codes >= R * 128),
                      jnp.int32(R * 128), codes)
    call = _make_kernel(R, n_groups, sb, bool(interpret))
    out = call(codes.reshape(n_groups, 1, S_LANES), table)
    return out.reshape(-1)[:n]
