"""Voxel key packing, sorting, dedup — the coordinate machinery under the
sparse-conv stack.

Replaces MinkowskiEngine's C++ coordinate hash maps
(``ray_marching.py:328-330`` ``ME.utils.batch_sparse_collate`` /
``ME.SparseTensor``) with a TPU-native scheme: voxel coordinates are packed
into a single sortable int32 key; lookups are binary searches over the sorted
key array; dedup is a sorted-run reduction.  Everything is fixed-capacity —
empty slots carry the sentinel key (int32 max) which sorts to the end.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

SENTINEL_KEY = jnp.iinfo(jnp.int32).max  # 2147483647


class VoxelGrid(NamedTuple):
    """Static bounded coordinate domain for key packing.

    Defaults cover a ±10.24 m x/y, −0.64..+4.46 m z workspace at 1 cm —
    larger than the reference's biggest test grid (256·256·96 @ 4 cm =
    10.24 m × 3.84 m, ``ray_marching_scannet.py:16``) with augmentation
    headroom.  Coordinates outside the domain are treated as invalid.
    """
    bounds: Tuple[int, int, int] = (2048, 2048, 510)
    shifts: Tuple[int, int, int] = (1024, 1024, 64)

    def pack(self, coords: jnp.ndarray) -> jnp.ndarray:
        """[..., 3] int32 voxel coords -> [...] int32 keys (OOB -> SENTINEL)."""
        bx, by, bz = self.bounds
        sx, sy, sz = self.shifts
        x = coords[..., 0] + sx
        y = coords[..., 1] + sy
        z = coords[..., 2] + sz
        ok = ((x >= 0) & (x < bx) & (y >= 0) & (y < by)
              & (z >= 0) & (z < bz))
        key = (x * by + y) * bz + z
        return jnp.where(ok, key, SENTINEL_KEY).astype(jnp.int32)

    def unpack(self, keys: jnp.ndarray) -> jnp.ndarray:
        """Inverse of pack; sentinel keys map to OOB coords (bounds)."""
        bx, by, bz = self.bounds
        sx, sy, sz = self.shifts
        z = keys % bz
        xy = keys // bz
        y = xy % by
        x = xy // by
        coords = jnp.stack([x - sx, y - sy, z - sz], axis=-1)
        bad = (keys == SENTINEL_KEY)[..., None]
        oob = jnp.array(self.bounds, jnp.int32)
        return jnp.where(bad, oob, coords).astype(jnp.int32)


def sort_by_key(keys: jnp.ndarray, *arrays):
    """Sort keys ascending and apply the permutation to payload arrays."""
    n = keys.shape[0]
    perm = jnp.arange(n, dtype=jnp.int32)
    keys_sorted, perm = jax.lax.sort_key_val(keys, perm)
    return (keys_sorted,) + tuple(jnp.take(a, perm, axis=0) for a in arrays)


def unique_sorted(keys_sorted: jnp.ndarray, capacity: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Collapse sorted keys to unique keys with fixed capacity.

    Returns:
        out_keys: [capacity] unique keys, sorted, SENTINEL-padded.
        run_id:   [N] index into out_keys for every input element
                  (== capacity for sentinel inputs and overflow — safe as a
                  dropped scatter index / num_segments bucket).
        n_unique: scalar int32 count (before capacity clipping).
    """
    n = keys_sorted.shape[0]
    valid = keys_sorted != SENTINEL_KEY
    prev = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), keys_sorted[:-1]])
    firsts = valid & (keys_sorted != prev)
    run_id = jnp.cumsum(firsts.astype(jnp.int32)) - 1
    n_unique = jnp.where(n > 0, run_id[-1] + 1, 0)
    run_id = jnp.where(valid & (run_id < capacity), run_id, capacity)
    out_keys = jnp.full((capacity,), SENTINEL_KEY, jnp.int32)
    slot = jnp.where(firsts, run_id, capacity)
    out_keys = out_keys.at[slot].set(keys_sorted, mode="drop")
    return out_keys, run_id, n_unique


def lattice_cells(grid: VoxelGrid, stride: int) -> int:
    """Number of stride-lattice cells of the grid (for LUT sizing).

    Ceil division on every axis: a bound not divisible by the stride
    still has valid stride-multiple coords in its partial last cell
    (shifted x in [nx_floor*stride, bx)), and those must map to a real
    cell or LUT lookups silently miss rows the sort path finds.
    """
    bx, by, bz = grid.bounds
    return (-(-bx // stride)) * (-(-by // stride)) * (-(-bz // stride))


def lattice_index(grid: VoxelGrid, stride: int, coords: jnp.ndarray,
                  valid: jnp.ndarray) -> jnp.ndarray:
    """[...,3] stride-multiple voxel coords -> flat stride-lattice cell.

    Invalid / out-of-domain coords map to the last cell + 1 sentinel
    (callers allocate ``cells + 1`` table rows or use mode='drop').
    Requires ``grid.shifts`` divisible by ``stride`` (true for the default
    grid up to stride 64).
    """
    bx, by, bz = grid.bounds
    sx, sy, sz = grid.shifts
    assert sx % stride == 0 and sy % stride == 0 and sz % stride == 0, (
        f"grid shifts {grid.shifts} not divisible by stride {stride}")
    nx, ny, nz = -(-bx // stride), -(-by // stride), -(-bz // stride)
    x = (coords[..., 0] + sx) // stride
    y = (coords[..., 1] + sy) // stride
    z = (coords[..., 2] + sz) // stride
    ok = (valid & (x >= 0) & (x < nx) & (y >= 0) & (y < ny)
          & (z >= 0) & (z < nz))
    cell = (x * ny + y) * nz + z
    return jnp.where(ok, cell, nx * ny * nz).astype(jnp.int32)


def lookup_lut(keys_sorted: jnp.ndarray, coords: jnp.ndarray, grid: VoxelGrid,
               stride: int, query_coords: jnp.ndarray,
               query_valid: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``lookup`` via a dense rank table on the stride lattice.

    Scatters each valid row's rank into a ``lattice_cells``-sized int32
    table once, then answers every query with ONE direct gather — no
    sort.  Profitable when the query count is large and the lattice fits
    memory (stride >= 4 on the default grid: 134 MB at s4, <= 17 MB at
    s8+); the sort-based ``lookup`` serializes a 28N-element sort per
    call (tools/micro_bench.py 'lutmap').

    Exact iff every valid coord is a stride multiple inside the grid
    domain (the SparseTensor invariant).  Returns (idx, found) with the
    same contract as ``lookup``.
    """
    n = keys_sorted.shape[0]
    cells = lattice_cells(grid, stride)
    valid = keys_sorted != SENTINEL_KEY
    cell = lattice_index(grid, stride, coords, valid)
    # Table sized `cells`: every invalid/sentinel row maps to cell==cells,
    # which is out of bounds and dropped.  (A cells+1 table would funnel
    # all sentinel rows onto one slot — duplicate scatter indices, so no
    # uniqueness promise could be made.)  Applied indices are unique by
    # the SparseTensor sorted-unique-keys invariant.
    tbl = jnp.zeros((cells,), jnp.int32).at[cell].set(
        jnp.arange(1, n + 1, dtype=jnp.int32), mode="drop",
        unique_indices=True)
    qcell = lattice_index(grid, stride, query_coords, query_valid)
    got = jnp.take(tbl, jnp.minimum(qcell, cells - 1))
    found = (got > 0) & (qcell < cells)
    idx = jnp.clip(got - 1, 0, n - 1)
    return idx, found


def lookup(keys_sorted: jnp.ndarray, queries: jnp.ndarray
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Search queries in a sorted key array.

    Returns (idx clipped to [0, N-1], found bool).  Sentinel queries are
    never "found" (sentinel==sentinel hits are masked out).

    Always uses the sort-based searchsorted: the bisection ('scan') method
    serializes ~log2(N) HBM gather rounds and measured 3-8x slower at
    EVERY kernel-map size on v5e (27x8k queries: 29 ms scan vs 9 ms sort;
    27x262k: 970 ms vs 119 ms — tools/micro_bench.py 'lookup').
    """
    n = keys_sorted.shape[0]
    idx = jnp.searchsorted(keys_sorted, queries, method="sort")
    idx = jnp.clip(idx, 0, n - 1).astype(jnp.int32)
    found = (jnp.take(keys_sorted, idx) == queries) & (queries != SENTINEL_KEY)
    return idx, found
