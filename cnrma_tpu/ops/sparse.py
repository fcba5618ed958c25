"""Fixed-capacity sparse voxel tensors and sparse convolution on TPU.

Replaces MinkowskiEngine (C++/CUDA coordinate maps + gather-scatter conv,
reference ``fcaf3d_backbone.py``, ``fcaf3d_head.py``) with an XLA-friendly
design:

* A ``SparseTensor`` holds sorted packed keys + coords + features at a fixed
  capacity; empty slots carry SENTINEL keys that sort to the end.
* Kernel maps are binary searches (``searchsorted``) of neighbor keys in the
  sorted key array — computed once per (coordinate set, offset pattern) and
  reused by every conv in a stage, like ME's kernel-map cache.
* The conv itself is K offset-wise ``[N, Cin] @ [Cin, Cout]`` matmuls — large,
  dense, MXU-shaped — accumulated in fp32.
* Downsampling/pooling derive output coordinates by quantize+dedup (sort +
  run-collapse); the generative transposed conv (``up_block``) emits the 8
  deterministic stride-children of each voxel.
* Everything is per-scene; batching is ``utils.batching.batch_map``
  (sequential over scenes — vmapped gathers lower 3-4x slower on TPU).

Weight layout: [K_offsets, Cin, Cout] (same as ME kernels, which eases
checkpoint conversion).
"""

from __future__ import annotations

import itertools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cnrma_tpu.utils.capacity_debug import report as _cap_report
from cnrma_tpu.ops.voxelize import (
    SENTINEL_KEY, VoxelGrid, lattice_cells, lattice_index, lookup,
    lookup_lut, sort_by_key, unique_sorted)

# Kernel maps whose stride lattice has at most this many cells use the
# dense rank-LUT lookup (one scatter + direct gathers) instead of the
# sort-based searchsorted; 0 disables.  On the default VoxelGrid the
# lattice is 134 MB int32 at stride 4 and <= 17 MB at stride 8+.
# Baked into traced programs at trace time.
# DEFAULT ON at 64 Mi cells since the round-4 TPU A/B (detection stage
# 780 -> 654 ms at full scale, doc/performance.md); bit-identical to the
# sort path by test.  A 300M budget (stride-2 lattice eligible, 1.07 GB
# table) measured SLOWER (710 ms) — the giant scatter eats the win.
LUT_CELL_BUDGET = int(os.environ.get("CNRMA_SPARSE_LUT_BUDGET",
                                     str(64 * 1024 * 1024)))


# Derive strided-op kernel maps from the downsample's parent relation
# instead of searching: max_pool needs NO searches (each input serves
# exactly one (offset, output) pair), and a k3-s2 strided conv needs only
# an 8-offset neighbor map over the OUTPUT set (vs 27 query offsets over
# the input set).  0 disables.  Baked into traced programs at trace time.
# DEFAULT ON since the round-4 TPU A/B (detection 780 -> 748 ms alone,
# additive with the LUT: 628 ms combined); bit-identical by test.
DERIVED_KMAPS = int(os.environ.get("CNRMA_DERIVED_KMAPS", "1"))


def lut_eligible(grid: VoxelGrid, stride: int) -> bool:
    """True when lookups over this stride lattice take the LUT path.

    LUT lookups are scatter+gather on coordinates and do NOT require the
    key array to be sorted — code paths that skip re-sorts (e.g. the
    decoder's ``prune_topk(sort=False)``) must gate on this exact
    predicate, because the sort-based fallback would silently search an
    unsorted array.
    """
    return bool(LUT_CELL_BUDGET
                and lattice_cells(grid, stride) <= LUT_CELL_BUDGET)


@struct.dataclass
class SparseTensor:
    """Per-scene sparse voxel tensor with fixed capacity.

    coords are in *base voxel units* (multiples of ``stride``); keys are the
    packed/sorted coords.  Row i is valid iff ``keys[i] != SENTINEL_KEY``.
    """
    keys: jnp.ndarray                     # [N] int32 sorted
    coords: jnp.ndarray                   # [N, 3] int32
    feats: jnp.ndarray                    # [N, C]
    stride: int = struct.field(pytree_node=False)
    grid: VoxelGrid = struct.field(pytree_node=False, default=VoxelGrid())

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]

    @property
    def valid(self) -> jnp.ndarray:
        return self.keys != SENTINEL_KEY

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))

    def with_feats(self, feats: jnp.ndarray) -> "SparseTensor":
        return self.replace(feats=feats)


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def voxelize_points(points: jnp.ndarray, feats: jnp.ndarray,
                    point_valid: jnp.ndarray, voxel_size: float,
                    capacity: int, grid: VoxelGrid = VoxelGrid(),
                    reduce: str = "mean") -> SparseTensor:
    """Quantize a point cloud into a stride-1 SparseTensor.

    Matches the reference's ``coords / voxel_size_fcaf3d`` + ME collate
    (``ray_marching.py:328-330``): coordinates are floored to ints.  Duplicate
    voxels reduce features by 'mean' (ME default is an arbitrary subsample;
    'first' reproduces that determinism if wanted).
    """
    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    keys = grid.pack(coords)
    keys = jnp.where(point_valid, keys, SENTINEL_KEY)
    keys_sorted, feats_s = sort_by_key(keys, feats)
    out_keys, run_id, n_uniq = unique_sorted(keys_sorted, capacity)
    _cap_report("voxelize(stride 1)", n_uniq, capacity)
    c = feats.shape[-1]
    if reduce == "mean":
        # accumulate in fp32 regardless of the feature dtype (bf16 features
        # lose mantissa over long duplicate runs)
        sums = jax.ops.segment_sum(feats_s.astype(jnp.float32), run_id,
                                   num_segments=capacity + 1)
        cnts = jax.ops.segment_sum(
            jnp.ones((keys.shape[0],), jnp.float32), run_id,
            num_segments=capacity + 1)
        out_feats = (sums[:capacity]
                     / jnp.maximum(cnts[:capacity, None], 1.0))
    elif reduce == "first":
        prev = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), keys_sorted[:-1]])
        firsts = (keys_sorted != prev) & (keys_sorted != SENTINEL_KEY)
        slot = jnp.where(firsts, run_id, capacity)
        out_feats = jnp.zeros((capacity, c), feats.dtype).at[slot].set(
            feats_s, mode="drop")
    else:
        raise ValueError(reduce)
    out_coords = grid.unpack(out_keys)
    return SparseTensor(keys=out_keys, coords=out_coords,
                        feats=out_feats.astype(feats.dtype), stride=1,
                        grid=grid)


# ---------------------------------------------------------------------------
# kernel maps
# ---------------------------------------------------------------------------

def kernel_offsets(kernel_size: int, dilation: int = 1) -> np.ndarray:
    """Static [K,3] offsets; x fastest (first-axis-major, ME ordering)."""
    if kernel_size % 2 == 1:
        r = range(-(kernel_size // 2), kernel_size // 2 + 1)
    else:
        r = range(0, kernel_size)
    offs = [(x, y, z) for z in r for y in r for x in r]  # x varies fastest
    return np.array(offs, dtype=np.int32) * dilation


def kernel_map(st: SparseTensor, offsets: np.ndarray,
               query_coords: Optional[jnp.ndarray] = None,
               query_keys: Optional[jnp.ndarray] = None,
               offset_stride: Optional[int] = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """idx/found of shape [K, M]: input slot for (query m, offset k).

    query defaults to the tensor's own coordinates (submanifold conv).
    ``offset_stride`` scales the integer offsets (defaults to st.stride).
    ``offsets`` must be a CONCRETE host ``np.ndarray`` (as produced by
    ``kernel_offsets``) — it is consumed by numpy at trace time, so a
    traced/jnp array raises immediately rather than miscompiling.
    """
    if query_coords is None:
        query_coords = st.coords
        query_keys = st.keys
    s = st.stride if offset_stride is None else offset_stride
    # offsets are STATIC (np.ndarray from kernel_offsets); do the scale and
    # the LUT-eligibility divisibility check in numpy BEFORE any jnp
    # conversion — under a remat/checkpoint trace even jnp ops on
    # constants yield tracers, and np.asarray on one raises
    # TracerArrayConversionError (seen tracing the rematted detector).
    offs_np = np.asarray(offsets, np.int32) * s                  # [K,3]
    offs = jnp.asarray(offs_np)
    q = query_coords[None, :, :] + offs[:, None, :]              # [K,M,3]
    k, m = offs_np.shape[0], query_coords.shape[0]
    q_valid = jnp.ones((k, m), bool) if query_keys is None else \
        jnp.broadcast_to((query_keys != SENTINEL_KEY)[None, :], (k, m))
    # LUT path: every coord in a kernel map is a multiple of st.stride
    # (SparseTensor invariant + offsets scaled by stride), the
    # lookup_lut exactness contract
    if (lut_eligible(st.grid, st.stride)
            and all(int(o) % st.stride == 0
                    for o in offs_np.reshape(-1))):
        idx, found = lookup_lut(st.keys, st.coords, st.grid, st.stride,
                                q.reshape(-1, 3), q_valid.reshape(-1))
        return idx.reshape(k, m), found.reshape(k, m)
    qkeys = st.grid.pack(q)
    if query_keys is not None:
        qkeys = jnp.where((query_keys == SENTINEL_KEY)[None, :],
                          SENTINEL_KEY, qkeys)
    idx, found = lookup(st.keys, qkeys.reshape(-1))
    return idx.reshape(k, m), found.reshape(k, m)


def apply_sparse_conv(feats: jnp.ndarray, weights: jnp.ndarray,
                      idx: jnp.ndarray, found: jnp.ndarray,
                      out_dtype=None) -> jnp.ndarray:
    """out[m] = Σ_k W[k]ᵀ · feats[idx[k,m]] (missing neighbors contribute 0).

    One MXU matmul per kernel offset, accumulated in fp32 under a
    ``lax.scan`` over offsets — the scan keeps the HLO one-body-sized
    (vs 27 inlined gather+matmul pairs), which matters for compile time
    across the ~30-layer detection stack.  A gather-once formulation
    ([M, K·Cin] @ [K·Cin, Cout]) measured ~1.5x faster in isolation at
    neck shapes but SLOWER in the compiled pipeline (the [K·M, Cin]
    temp + transpose defeats fusion) — kept out.
    """
    out_dtype = out_dtype or feats.dtype
    m = idx.shape[1]
    cout = weights.shape[-1]

    def body(acc, inp):
        wk, ik, fk = inp
        g = jnp.take(feats, ik, axis=0)
        g = jnp.where(fk[:, None], g, jnp.zeros((), g.dtype))
        acc = acc + jnp.dot(g, wk.astype(g.dtype),
                            preferred_element_type=jnp.float32)
        return acc, None

    acc, _ = jax.lax.scan(body, jnp.zeros((m, cout), jnp.float32),
                          (weights, idx, found))
    return acc.astype(out_dtype)


# ---------------------------------------------------------------------------
# convolution variants
# ---------------------------------------------------------------------------

def subm_conv(st: SparseTensor, weights: jnp.ndarray,
              kmap: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
              offsets: Optional[np.ndarray] = None) -> SparseTensor:
    """Submanifold (stride-1) conv: output on the same coordinate set.

    Pass a precomputed ``kmap`` to share neighbor lookups across the layers
    of a stage.
    """
    if kmap is None:
        if offsets is None:
            ks = round(len(weights) ** (1 / 3))
            offsets = kernel_offsets(ks)
        kmap = kernel_map(st, offsets)
    idx, found = kmap
    out = apply_sparse_conv(st.feats, weights, idx, found)
    return st.with_feats(out)


def downsample_coords(st: SparseTensor, factor: int, capacity: int,
                      align_orig: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Output coordinate set of a strided op: unique(floor(c / s´) * s´).

    Returns (keys [capacity] sorted, coords [capacity,3], run_id [N]).
    run_id maps rows to output slots (capacity = dropped); by default its
    row alignment is path-dependent (sorted order on the sort path,
    original order on the LUT path); ``align_orig=True`` guarantees
    original-row alignment on both paths (one extra scatter on the sort
    path) — required by the derived kernel maps.

    When the output stride's lattice fits ``LUT_CELL_BUDGET`` the dedup
    is sort-free: scatter an occupancy flag per input row, rank occupied
    cells with a cumsum, and scatter keys to their ranks.  Cell order ==
    ascending packed-key order (both are lex over shifted coords), so
    the output is IDENTICAL to the sort-based path — including the
    capacity-overflow rule (lowest-key cells win).
    """
    new_stride = st.stride * factor
    q = (st.coords // new_stride) * new_stride
    if lut_eligible(st.grid, new_stride):
        cells = lattice_cells(st.grid, new_stride)
        cell = lattice_index(st.grid, new_stride, q, st.valid)    # [N]
        occ = jnp.zeros((cells + 1,), jnp.int32).at[cell].set(
            1, mode="drop", unique_indices=False)[:cells]
        rank_incl = jnp.cumsum(occ)
        _cap_report(f"dedup(stride {new_stride})", rank_incl[-1], capacity)
        slot = rank_incl[cell.clip(0, cells - 1)] - 1             # [N]
        valid_in = st.valid & (cell < cells)
        slot = jnp.where(valid_in & (slot < capacity), slot, capacity)
        qkeys = jnp.where(valid_in, st.grid.pack(q), SENTINEL_KEY)
        out_keys = jnp.full((capacity,), SENTINEL_KEY, jnp.int32
                            ).at[slot].set(qkeys, mode="drop")
        return out_keys, st.grid.unpack(out_keys), slot
    qkeys = jnp.where(st.valid, st.grid.pack(q), SENTINEL_KEY)
    if align_orig:
        n = qkeys.shape[0]
        keys_sorted, perm = sort_by_key(qkeys,
                                        jnp.arange(n, dtype=jnp.int32))
        out_keys, run_id, n_uniq = unique_sorted(keys_sorted, capacity)
        _cap_report(f"dedup(stride {new_stride})", n_uniq, capacity)
        run_orig = jnp.full((n,), capacity, jnp.int32).at[perm].set(
            run_id.astype(jnp.int32), mode="drop")
        return out_keys, st.grid.unpack(out_keys), run_orig
    keys_sorted, = sort_by_key(qkeys)
    out_keys, run_id, n_uniq = unique_sorted(keys_sorted, capacity)
    _cap_report(f"dedup(stride {new_stride})", n_uniq, capacity)
    return out_keys, st.grid.unpack(out_keys), run_id


def _derived_pool_kmap(st: SparseTensor, factor: int, capacity: int):
    """Search-free kernel map of a k=f, s=f pooling op.

    Each input voxel serves exactly one (offset, output) pair: offset =
    its within-cell position, output = its parent's slot — so the whole
    map is the downsample relation plus one scatter.
    """
    out_keys, out_coords, slot = downsample_coords(st, factor, capacity,
                                                   align_orig=True)
    f = factor
    o = (st.coords // st.stride) % f                 # [N,3] in 0..f-1
    k_idx = (o[:, 2] * f + o[:, 1]) * f + o[:, 0]    # x fastest
    n, m = st.capacity, capacity
    ok = st.valid & (slot < m)
    flat = jnp.where(ok, k_idx * m + slot, f ** 3 * m)
    idx = jnp.zeros((f ** 3 * m + 1,), jnp.int32).at[flat].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    fnd = jnp.zeros((f ** 3 * m + 1,), bool).at[flat].set(ok, mode="drop")
    return (out_keys, out_coords, idx[:f ** 3 * m].reshape(f ** 3, m),
            fnd[:f ** 3 * m].reshape(f ** 3, m))


def _stem_k_table() -> np.ndarray:
    """Static [8 parities, 8 parent-neighbors] -> conv-offset row (or -1).

    An input voxel with within-cell parity ``o`` answers a k3-s2 query
    (out, d) iff d == o - 2e for some e in {0,1}^3 with e <= o, and then
    out = parent + e·new_stride; the table maps (o, e) to the
    ``kernel_offsets(3)`` row of that d.
    """
    conv_offs = kernel_offsets(3).tolist()
    off_index = {tuple(v): i for i, v in enumerate(conv_offs)}
    T = -np.ones((8, 8), np.int32)
    for oi in range(8):
        o = np.array([oi & 1, (oi >> 1) & 1, (oi >> 2) & 1])
        for ei in range(8):
            e = np.array([ei & 1, (ei >> 1) & 1, (ei >> 2) & 1])
            if np.any(e > o):
                continue
            d = o - 2 * e
            T[oi, ei] = off_index[tuple(int(v) for v in d)]
    return T


_STEM_K_TABLE = _stem_k_table()


def _derived_strided3_kmap(st: SparseTensor, capacity: int):
    """k3-s2 strided-conv kernel map from the parent relation.

    Replaces the 27-offset search over the INPUT set with an 8-offset
    neighbor map over the (4x smaller) OUTPUT set plus 8 scatters: input
    c with parity o serves query (parent+e·s', o-2e) for every e <= o.

    Exact whenever the output capacity holds every occupied parent cell.
    Under capacity OVERFLOW (already a lossy regime — whole output cells
    are dropped) this path additionally loses a dropped-parent input's
    contributions to kept neighboring outputs, which the searchsorted
    construction would find; size capacities to avoid overflow.
    """
    out_keys, out_coords, slot = downsample_coords(st, 2, capacity,
                                                   align_orig=True)
    stub = SparseTensor(keys=out_keys, coords=out_coords,
                        feats=jnp.zeros((capacity, 1), jnp.float32),
                        stride=st.stride * 2, grid=st.grid)
    nbr_offs = np.array([(x, y, z) for z in (0, 1) for y in (0, 1)
                         for x in (0, 1)], np.int32)
    nbr_idx, nbr_fnd = kernel_map(stub, nbr_offs)            # [8, M]
    o = (st.coords // st.stride) % 2
    o_idx = o[:, 0] + 2 * o[:, 1] + 4 * o[:, 2]
    T = jnp.asarray(_STEM_K_TABLE)
    n, m = st.capacity, capacity
    ok0 = st.valid & (slot < m)
    # Overflow here is LOSSY beyond the ordinary capacity drop (see
    # docstring): surface it loudly under CNRMA_CAPACITY_DEBUG.
    _cap_report("derived-kmap(k3s2) dropped-parent inputs (lossy!)",
                jnp.sum((st.valid & (slot >= m)).astype(jnp.int32)), 1)
    slot_c = jnp.where(ok0, slot, 0)
    rows = jnp.arange(n, dtype=jnp.int32)
    idx_buf = jnp.zeros((27 * m + 1,), jnp.int32)
    fnd_buf = jnp.zeros((27 * m + 1,), bool)
    for ei in range(8):                       # static: 8 tiny scatters
        k = jnp.take(T[:, ei], o_idx)                        # [N]
        tgt = jnp.take(nbr_idx[ei], slot_c)
        tf = jnp.take(nbr_fnd[ei], slot_c)
        ok = ok0 & (k >= 0) & tf
        flat = jnp.where(ok, k * m + tgt, 27 * m)
        idx_buf = idx_buf.at[flat].set(rows, mode="drop")
        fnd_buf = fnd_buf.at[flat].set(ok, mode="drop")
    return (out_keys, out_coords, idx_buf[:27 * m].reshape(27, m),
            fnd_buf[:27 * m].reshape(27, m))


def strided_conv(st: SparseTensor, weights: jnp.ndarray, factor: int,
                 capacity: int, offsets: Optional[np.ndarray] = None
                 ) -> SparseTensor:
    """Strided conv (e.g. k3 s2): output on the quantized coordinate set,
    kernel offsets in input-stride units around each output coordinate."""
    if offsets is None:
        ks = round(len(weights) ** (1 / 3))
        offsets = kernel_offsets(ks)
    if (DERIVED_KMAPS and factor == 2
            and np.array_equal(offsets, kernel_offsets(3))):
        out_keys, out_coords, idx, found = _derived_strided3_kmap(
            st, capacity)
    elif (DERIVED_KMAPS and factor == 2 and len(offsets) == 1
            and not np.any(offsets)):
        # k1 s2 (the residual-path 1x1 downsample): input c answers query
        # (out, 0) iff c == out, i.e. within-cell parity 0 — pure scatter
        out_keys, out_coords, slot = downsample_coords(
            st, 2, capacity, align_orig=True)
        o = (st.coords // st.stride) % 2
        ok = st.valid & (slot < capacity) & jnp.all(o == 0, axis=1)
        flat = jnp.where(ok, slot, capacity)
        n = st.capacity
        idx = jnp.zeros((capacity + 1,), jnp.int32).at[flat].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")[None, :capacity]
        found = jnp.zeros((capacity + 1,), bool).at[flat].set(
            ok, mode="drop")[None, :capacity]
    else:
        out_keys, out_coords, _ = downsample_coords(st, factor, capacity)
        idx, found = kernel_map(st, offsets, query_coords=out_coords,
                                query_keys=out_keys,
                                offset_stride=st.stride)
    out = apply_sparse_conv(st.feats, weights, idx, found)
    return SparseTensor(keys=out_keys, coords=out_coords, feats=out,
                        stride=st.stride * factor, grid=st.grid)


def max_pool(st: SparseTensor, factor: int, capacity: int) -> SparseTensor:
    """Max pooling (kernel = stride = factor), offsets {0..factor-1}^3."""
    if DERIVED_KMAPS:
        out_keys, out_coords, idx, found = _derived_pool_kmap(
            st, factor, capacity)
    else:
        r = range(factor)
        offsets = np.array([(x, y, z) for z in r for y in r for x in r],
                           np.int32)
        out_keys, out_coords, _ = downsample_coords(st, factor, capacity)
        idx, found = kernel_map(st, offsets, query_coords=out_coords,
                                query_keys=out_keys,
                                offset_stride=st.stride)
    neg = jnp.finfo(st.feats.dtype).min
    feats = st.feats

    def body(acc, inp):
        ik, fk = inp
        g = jnp.take(feats, ik, axis=0)
        g = jnp.where(fk[:, None], g, neg)
        return jnp.maximum(acc, g), None

    acc, _ = jax.lax.scan(
        body, jnp.full((capacity, st.num_channels), neg, feats.dtype),
        (idx, found))
    any_found = found.any(axis=0)
    acc = jnp.where(any_found[:, None], acc, 0.0)
    return SparseTensor(keys=out_keys, coords=out_coords,
                        feats=acc.astype(st.feats.dtype),
                        stride=st.stride * factor, grid=st.grid)


def generative_transpose_conv(st: SparseTensor, weights: jnp.ndarray,
                              sort: bool = True) -> SparseTensor:
    """Generative transposed conv k2 s2 (ME
    ``MinkowskiGenerativeConvolutionTranspose``, ``fcaf3d_head.py:72-78``):
    every input voxel emits its 8 stride/2 children with per-child weights.

    Output capacity is 8x the input capacity; children of distinct parents
    are distinct so no dedup is needed (children of different parents can
    interleave in key order — z-adjacent parents are only ``stride`` apart
    in key space — so a real sort is required for a canonical tensor).

    With ``sort=False`` the children stay in p-major order (row p*8 + o,
    the layout ``derive_child_kmap``/``add_skip_into_children``/
    ``interpolate_children_scores`` expect); the keys array is then NOT
    sorted — do not ``lookup`` into it.
    """
    assert st.stride % 2 == 0, "cannot upsample a stride-1 tensor"
    child_stride = st.stride // 2
    r = (0, 1)
    offsets = np.array([(x, y, z) for z in r for y in r for x in r],
                       np.int32) * child_stride                 # [8,3]
    n = st.capacity
    child_coords = (st.coords[:, None, :]
                    + jnp.asarray(offsets)[None, :, :])         # [N,8,3]
    child_keys = jnp.where(st.valid[:, None], st.grid.pack(child_coords),
                           SENTINEL_KEY)
    # child features: one [N,Cin]@[Cin,8*Cout] matmul covers all 8 children
    cout = weights.shape[-1]
    w_flat = jnp.transpose(weights, (1, 0, 2)).reshape(
        st.num_channels, 8 * cout)
    outs = jnp.dot(st.feats, w_flat.astype(st.feats.dtype),
                   preferred_element_type=jnp.float32
                   ).reshape(n, 8, cout)                         # [N,8,Cout]
    keys_flat = child_keys.reshape(8 * n)
    coords_flat = child_coords.reshape(8 * n, 3)
    feats_flat = outs.reshape(8 * n, -1).astype(st.feats.dtype)
    if not sort:
        return SparseTensor(keys=keys_flat, coords=coords_flat,
                            feats=feats_flat, stride=child_stride,
                            grid=st.grid)
    keys_sorted, coords_s, feats_s = sort_by_key(
        keys_flat, coords_flat, feats_flat)
    return SparseTensor(keys=keys_sorted, coords=coords_s, feats=feats_s,
                        stride=child_stride, grid=st.grid)


# ---------------------------------------------------------------------------
# decoder fast path: children of a sorted parent tensor
#
# A generative transpose emits the 8 stride/2 children of every parent in
# p-major order (row p*8 + o).  Because every child coordinate is
# parent + o·s/2 with o in {0,1}^3, EVERY structural query about children
# reduces to queries about parents:
#   * a child's 27-neighborhood lives among the children of the parent's
#     27-neighborhood:  (o + d) = 2e + o'  with e in {-1,0,1}^3;
#   * a skip-tensor row at child stride belongs to child slot
#     (parent_index(coord//s·s)·8 + o_index(coord));
#   * the trilinear corners of a child on the parent grid are the parents
#     at offsets c in {0,1}^3 with static weights 0.5^{|o|}.
# So the whole FCAF3D decoder level needs ONE searchsorted kernel map (the
# parent's, which the out-block conv needs anyway) — the former per-level
# searches over the 8x-larger child set become index arithmetic.
# ---------------------------------------------------------------------------

def _child_offset_tables() -> Tuple[np.ndarray, np.ndarray]:
    """Static (e_idx, o'_idx) tables [8 children, 27 conv offsets].

    e_idx indexes kernel_offsets(3) rows (parent neighborhood), o'_idx the
    child enumeration used by ``generative_transpose_conv`` (x fastest).
    """
    child_offs = [(x, y, z) for z in (0, 1) for y in (0, 1)
                  for x in (0, 1)]                       # transpose order
    conv_offs = kernel_offsets(3)                        # [27,3] x fastest
    off_index = {tuple(v): i for i, v in enumerate(conv_offs.tolist())}
    child_index = {v: i for i, v in enumerate(child_offs)}
    e_idx = np.zeros((8, 27), np.int32)
    op_idx = np.zeros((8, 27), np.int32)
    for oi, o in enumerate(child_offs):
        for di, d in enumerate(conv_offs.tolist()):
            e, op = [], []
            for a in range(3):
                t = o[a] + d[a]
                e.append((t - (t % 2)) // 2)
                op.append(t % 2)
            e_idx[oi, di] = off_index[tuple(e)]
            op_idx[oi, di] = child_index[tuple(op)]
    return e_idx, op_idx


_CHILD_E_IDX, _CHILD_OP_IDX = _child_offset_tables()


def derive_child_kmap(kmap27: Tuple[jnp.ndarray, jnp.ndarray]
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Parent [27, N] kernel map -> child [27, 8N] kernel map, no search.

    Children are in ``generative_transpose_conv`` row order (p*8 + o).
    """
    p_idx, p_found = kmap27                              # [27, N]
    n = p_idx.shape[1]
    e = jnp.asarray(_CHILD_E_IDX)                        # [8, 27]
    op = jnp.asarray(_CHILD_OP_IDX)
    # neighbor parent per (child o, conv offset d): [8, 27, N]
    par = jnp.take(p_idx, e.reshape(-1), axis=0).reshape(8, 27, n)
    fnd = jnp.take(p_found, e.reshape(-1), axis=0).reshape(8, 27, n)
    idx = par * 8 + op[:, :, None]
    # -> [27, 8N] with child rows p-major (p*8 + o)
    idx = jnp.transpose(idx, (1, 2, 0)).reshape(27, 8 * n)
    fnd = jnp.transpose(fnd, (1, 2, 0)).reshape(27, 8 * n)
    return idx.astype(jnp.int32), fnd


def add_skip_into_children(children: SparseTensor, skip: SparseTensor,
                           parent_keys: jnp.ndarray,
                           parent: Optional[SparseTensor] = None
                           ) -> SparseTensor:
    """children += skip, matching by coordinate via PARENT lookup only.

    ``children`` is the (possibly unsorted, p-major) output of a
    generative transpose over parents with sorted ``parent_keys``; a skip
    row at coordinate c lands in child slot parent_index(c//s·s)*8 +
    o_index(c) — N searches instead of 8N.

    Passing ``parent`` (the tensor behind ``parent_keys``) enables the
    LUT path when its stride lattice fits the budget — which also lifts
    the sorted requirement on ``parent_keys`` (full-LUT decoder mode).
    """
    s = skip.stride * 2
    half = skip.stride
    pc = (skip.coords // s) * s
    if parent is not None and lut_eligible(skip.grid, s):
        p_idx, found = lookup_lut(parent.keys, parent.coords, parent.grid,
                                  s, pc, skip.valid)
    else:
        pkeys = jnp.where(skip.valid, skip.grid.pack(pc), SENTINEL_KEY)
        p_idx, found = lookup(parent_keys, pkeys)
    o = (skip.coords - pc) // half                        # [N,3] in {0,1}
    o_idx = o[:, 0] + 2 * o[:, 1] + 4 * o[:, 2]           # x fastest
    slot = jnp.where(found, p_idx * 8 + o_idx, children.capacity)
    add = jnp.where(found[:, None], skip.feats, 0.0)
    feats = children.feats.at[slot].add(
        add.astype(children.feats.dtype), mode="drop")
    return children.with_feats(feats)


def interpolate_children_scores(scores: jnp.ndarray,
                                kmap27: Tuple[jnp.ndarray, jnp.ndarray],
                                parent_valid: jnp.ndarray) -> jnp.ndarray:
    """Trilinear parent-grid scores at all 8N child positions, no search.

    A child at parent + o·s/2 has fracs o/2 per axis, so its trilinear
    corners are the parents at offsets c <= o (c in {0,1}^3) with weight
    0.5^{|o|}; corner indices come from the parent 27-map.  Equivalent to
    ``interpolate_at(score_st, child_positions)`` (missing corners
    contribute 0).  scores: [N] parent scores.  Returns [8N] p-major.
    """
    p_idx, p_found = kmap27
    n = p_idx.shape[1]
    conv_offs = kernel_offsets(3).tolist()
    off_index = {tuple(v): i for i, v in enumerate(conv_offs)}
    child_offs = [(x, y, z) for z in (0, 1) for y in (0, 1)
                  for x in (0, 1)]
    out = jnp.zeros((n, 8), jnp.float32)
    sc = jnp.where(parent_valid, scores.astype(jnp.float32), 0.0)
    for oi, o in enumerate(child_offs):
        no = o[0] + o[1] + o[2]
        w = 0.5 ** no
        acc = jnp.zeros((n,), jnp.float32)
        for cx in range(o[0] + 1):
            for cy in range(o[1] + 1):
                for cz in range(o[2] + 1):
                    ei = off_index[(cx, cy, cz)]
                    v = jnp.take(sc, p_idx[ei]) * p_found[ei]
                    acc = acc + w * v
        out = out.at[:, oi].set(acc)
    return out.reshape(8 * n)


def add_into(target: SparseTensor, source: SparseTensor) -> SparseTensor:
    """target += source, matching rows by coordinate.

    Used for the neck's ``inputs[i] + x`` (``fcaf3d_head.py:114``): the
    upsampled children are a superset of the skip coordinates, so every
    source row lands in the target.
    """
    idx, found = lookup(target.keys, source.keys)
    add = jnp.where(found[:, None], source.feats, 0.0)
    feats = target.feats.at[idx].add(
        add.astype(target.feats.dtype), mode="drop")
    return target.with_feats(feats)


def prune_topk(st: SparseTensor, scores: jnp.ndarray, keep: int,
               sort: bool = True) -> SparseTensor:
    """Keep the `keep` highest-scoring valid rows (ME MinkowskiPruning +
    per-scene topk, ``fcaf3d_head.py:123-139``), re-sorted by key.

    ``sort=False`` skips the re-sort (rows stay in score order) — the
    same row multiset, valid ONLY when every downstream lookup takes the
    coordinate-LUT path (``lut_eligible``); the sort-based ``lookup``
    would silently mis-search unsorted keys.
    """
    neg = jnp.finfo(jnp.float32).min
    s = jnp.where(st.valid, scores.astype(jnp.float32), neg)
    _, top_idx = jax.lax.top_k(s, keep)
    keys = jnp.take(st.keys, top_idx)
    # rows that were invalid (score == -inf) stay invalid
    keys = jnp.where(jnp.take(st.valid, top_idx), keys, SENTINEL_KEY)
    feats = jnp.take(st.feats, top_idx, axis=0)
    if not sort:
        return SparseTensor(keys=keys, coords=st.grid.unpack(keys),
                            feats=feats, stride=st.stride, grid=st.grid)
    coords = jnp.take(st.coords, top_idx, axis=0)
    keys_sorted, coords_s, feats_s = sort_by_key(keys, coords, feats)
    coords_s = st.grid.unpack(keys_sorted)
    return SparseTensor(keys=keys_sorted, coords=coords_s, feats=feats_s,
                        stride=st.stride, grid=st.grid)


def interpolate_at(st: SparseTensor, positions: jnp.ndarray,
                   pos_valid: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation of a sparse tensor at float positions
    (ME ``features_at_coordinates``, ``fcaf3d_head.py:129``).

    positions are in base-voxel units; the 8 surrounding stride-grid voxels
    are looked up (missing -> 0 contribution).
    """
    s = float(st.stride)
    p = positions / s                                            # grid units
    p0 = jnp.floor(p)
    frac = p - p0
    corners = jnp.asarray(
        [(dx, dy, dz) for dz in (0, 1) for dy in (0, 1)
         for dx in (0, 1)], jnp.float32)                         # [8,3]
    # all 8 corner lookups in ONE batched searchsorted (8 sequential
    # bisections would serialize ~8x log(N) gather rounds)
    w = jnp.prod(jnp.where(corners[:, None, :] > 0, frac[None, :, :],
                           1 - frac[None, :, :]), axis=-1)       # [8,Q]
    coord = ((p0[None, :, :] + corners[:, None, :]) * s).astype(jnp.int32)
    keys = jnp.where(pos_valid[None, :], st.grid.pack(coord), SENTINEL_KEY)
    idx, found = lookup(st.keys, keys.reshape(-1))               # [8Q]
    g = jnp.take(st.feats, idx, axis=0).astype(jnp.float32)
    g = g.reshape(8, positions.shape[0], st.num_channels)
    return jnp.sum(g * (w * found.reshape(w.shape))[..., None], axis=0)
