"""Back-projection of 2D feature maps into a 3D feature volume.

TPU-native formulation of reference ``ray_marching.py:backproject`` (:21-69)
/ ``atlas.py:backproject`` (:20-67): for every voxel, project its center into
the view and *gather* the pixel feature (no scatter — XLA-friendly, perfectly
parallel over voxels).  Views are accumulated with a running (volume, valid)
sum via ``lax.scan`` so memory is O(volume), not O(views) — the reference's
sequential per-view accumulation (``ray_marching.py:424-436``) expressed as a
compiled loop.  The accumulator is a commutative sum, so views can also be
sharded across devices and combined with a ``psum`` (see parallel/).

Layout: channels-last.  feature [H, W, C]; per-view volumes travel as
[X, Y, Z*C] (pad-free TPU tiling — a bare 32-channel minor dim costs 4x
lane padding); ``accumulate_views`` unfolds to [X, Y, Z, C] at the end.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _project_indices(projection: jnp.ndarray, voxel_dim, voxel_size,
                     origin: jnp.ndarray, height: int, width: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-voxel flat pixel index (clipped in-bounds) + validity mask.

    Matches reference ``backproject``'s round()-then-cast pixel lookup
    (``ray_marching.py:52-53``).  Returns ([X,Y,Z] int32, [X,Y,Z] bool).
    """
    X, Y, Z = voxel_dim
    xs = jnp.arange(X, dtype=jnp.float32) * voxel_size + origin[0]
    ys = jnp.arange(Y, dtype=jnp.float32) * voxel_size + origin[1]
    zs = jnp.arange(Z, dtype=jnp.float32) * voxel_size + origin[2]
    # camera = P[:, :3] @ world + P[:, 3]; broadcast per-axis to avoid
    # materializing the [X,Y,Z,3] world grid.
    cam = (projection[:, 0][None, None, None, :] * xs[:, None, None, None]
           + projection[:, 1][None, None, None, :] * ys[None, :, None, None]
           + projection[:, 2][None, None, None, :] * zs[None, None, :, None]
           + projection[:, 3][None, None, None, :])            # [X,Y,Z,3]
    pz = cam[..., 2]
    inv_z = jnp.where(pz != 0, 1.0 / pz, 0.0)
    px = jnp.round(cam[..., 0] * inv_z).astype(jnp.int32)
    py = jnp.round(cam[..., 1] * inv_z).astype(jnp.int32)
    valid = ((px >= 0) & (py >= 0) & (px < width) & (py < height)
             & (pz > 0))
    flat_idx = (jnp.clip(py, 0, height - 1) * width
                + jnp.clip(px, 0, width - 1))
    return flat_idx, valid


def _project_indices_tiled(projection: jnp.ndarray, voxel_dim, tile: int,
                           voxel_size, origin: jnp.ndarray, height: int,
                           width: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``_project_indices`` computed directly in tile-major layout.

    Returns ([Nt, t³] int32 flat pixel index, [Nt, t³] bool valid) where
    ``Nt = (X/t)(Y/t)(Z/t)`` and row ``i`` holds tile ``i``'s voxels in
    x-major order — no dense [X,Y,Z] intermediate or transpose.
    """
    X, Y, Z = voxel_dim
    t = tile
    nx, ny, nz = X // t, Y // t, Z // t
    xs = (jnp.arange(X, dtype=jnp.float32) * voxel_size
          + origin[0]).reshape(nx, 1, 1, t, 1, 1)
    ys = (jnp.arange(Y, dtype=jnp.float32) * voxel_size
          + origin[1]).reshape(1, ny, 1, 1, t, 1)
    zs = (jnp.arange(Z, dtype=jnp.float32) * voxel_size
          + origin[2]).reshape(1, 1, nz, 1, 1, t)

    def cam_row(k):
        return (projection[k, 0] * xs + projection[k, 1] * ys
                + projection[k, 2] * zs + projection[k, 3])

    pz = cam_row(2)
    inv_z = jnp.where(pz != 0, 1.0 / pz, 0.0)
    px = jnp.round(cam_row(0) * inv_z).astype(jnp.int32)
    py = jnp.round(cam_row(1) * inv_z).astype(jnp.int32)
    valid = ((px >= 0) & (py >= 0) & (px < width) & (py < height)
             & (pz > 0))
    flat_idx = (jnp.clip(py, 0, height - 1) * width
                + jnp.clip(px, 0, width - 1))
    n_tiles = nx * ny * nz
    return (flat_idx.reshape(n_tiles, t * t * t),
            valid.reshape(n_tiles, t * t * t))


def _project_pixels_tiled(projection: jnp.ndarray, voxel_dim, tile: int,
                          voxel_size, origin: jnp.ndarray, height: int,
                          width: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Like ``_project_indices_tiled`` but keeps (px, py) separate.

    Returns ([Nt, t³] px, [Nt, t³] py, [Nt, t³] valid); px/py are clipped
    in-bounds (valid=False where the true pixel was outside).
    """
    X, Y, Z = voxel_dim
    t = tile
    nx, ny, nz = X // t, Y // t, Z // t
    xs = (jnp.arange(X, dtype=jnp.float32) * voxel_size
          + origin[0]).reshape(nx, 1, 1, t, 1, 1)
    ys = (jnp.arange(Y, dtype=jnp.float32) * voxel_size
          + origin[1]).reshape(1, ny, 1, 1, t, 1)
    zs = (jnp.arange(Z, dtype=jnp.float32) * voxel_size
          + origin[2]).reshape(1, 1, nz, 1, 1, t)

    def cam_row(k):
        return (projection[k, 0] * xs + projection[k, 1] * ys
                + projection[k, 2] * zs + projection[k, 3])

    pz = cam_row(2)
    inv_z = jnp.where(pz != 0, 1.0 / pz, 0.0)
    px = jnp.round(cam_row(0) * inv_z).astype(jnp.int32)
    py = jnp.round(cam_row(1) * inv_z).astype(jnp.int32)
    valid = ((px >= 0) & (py >= 0) & (px < width) & (py < height)
             & (pz > 0))
    n_tiles = nx * ny * nz
    shape = (n_tiles, t * t * t)
    return (jnp.clip(px, 0, width - 1).reshape(shape),
            jnp.clip(py, 0, height - 1).reshape(shape),
            valid.reshape(shape))


def backproject_view(projection: jnp.ndarray,
                     feature: jnp.ndarray,
                     voxel_dim: Sequence[int],
                     voxel_size: float,
                     origin: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lift one view's features along camera rays into the voxel volume.

    Args:
        projection: [3,4] = intrinsics @ extrinsics⁻¹ (already divided by the
            2D backbone stride).
        feature: [H, W, C] feature map.
        voxel_dim: static (X, Y, Z).
        voxel_size: metric voxel size.
        origin: [3] world position of voxel (0,0,0).

    Returns:
        volume: [X, Y, Z*C] voxel features, channels folded into the minor
            axis (pad-free TPU tiling; reshape to [X, Y, Z, C] to unfold),
            0 outside the frustum.
        valid: [X, Y, Z] bool, voxel projects into the view frustum.
    """
    X, Y, Z = voxel_dim
    H, W, C = feature.shape
    dtype = feature.dtype

    flat_idx, valid = _project_indices(projection, voxel_dim, voxel_size,
                                       origin, H, W)
    # The [X*Y*Z, C] gather temp is the memory hot spot: a 32-channel
    # minor dim gets 4x lane padding under TPU (8,128) tiling.  Masking
    # fuses into the reshape to [X, Y, Z*C], whose minor dim is a multiple
    # of 128 — pad-free downstream.
    gathered = jnp.take(feature.reshape(H * W, C),
                        flat_idx.reshape(-1), axis=0)          # [XYZ, C]
    vol_flat = jnp.where(valid.reshape(-1)[:, None], gathered,
                         jnp.zeros((), dtype=dtype))
    volume = vol_flat.reshape(X, Y, Z * C)
    return volume, valid


def accumulate_views_partial(projections: jnp.ndarray,
                             features: jnp.ndarray,
                             view_valid: jnp.ndarray,
                             voxel_dim: Sequence[int],
                             voxel_size: float,
                             origin: jnp.ndarray,
                             accum_dtype=jnp.float32,
                             view_chunk: int = 4,
                             tile: int = 0,
                             tile_capacity: int = 0,
                             rect: Tuple[int, int] = (0, 0),
                             rect_capacity: int = 0
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unnormalized (volume sum, view count) accumulation over views.

    The commutative-sum partial behind ``accumulate_views``: summing the
    outputs over disjoint view subsets (or ``psum``-ing them across a
    ``('view',)`` mesh axis — see ``accumulate_views_view_sharded``) and
    then normalizing is exactly the full-view result.

    ``view_chunk`` views are summed per scan step before touching the
    ``accum_dtype`` accumulator, dividing the accumulator's HBM
    read-modify-write traffic (2 x X*Y*Z*C*itemsize bytes per step — the
    dominant cost after the gathers) by the chunk size.  Views are padded
    to a chunk multiple with invalid entries, which contribute nothing.
    View counts are accumulated in fp32 regardless of ``accum_dtype``
    (integer-exact for any view count).

    Returns:
        vol_sum: [X, Y, Z, C] summed per-view volumes (accum_dtype),
        count: [X, Y, Z] number of observing views (accum_dtype).

    Differentiable w.r.t. ``features`` through a custom VJP: autodiff's
    transpose of the chunked gather scan emits ``view_chunk`` fused
    scatter-adds per scan body, which the TPU compiler cannot handle at
    production sizes; the custom backward is one clean per-view
    scatter-add under its own scan.

    ``tile > 0`` switches to the frustum-tile-culled formulation (see
    ``_accum_impl_tiled``): per view only the ``tile_capacity`` tiles
    with the most in-frustum voxels are gathered.  Exact vs ``tile=0``
    whenever each view's in-frustum tile count fits the capacity;
    requires every voxel dim divisible by ``tile``.
    """
    if tile:
        X, Y, Z = voxel_dim
        if X % tile or Y % tile or Z % tile:
            raise ValueError(f"voxel_dim {tuple(voxel_dim)} not divisible "
                             f"by tile {tile}")
        if rect[0] and rect[1]:
            # rect-footprint path: rect tiles via span-gather + one-hot
            # matmul at capacity ``rect_capacity``; oversized-footprint
            # tiles via row gather at capacity ``tile_capacity``
            return _accum_core_rect(
                tuple(voxel_dim), float(voxel_size), int(tile),
                (int(rect[0]), int(rect[1])), int(rect_capacity),
                int(tile_capacity), jnp.dtype(accum_dtype).name,
                projections, features, view_valid, origin)
        return _accum_core_tiled(
            tuple(voxel_dim), float(voxel_size), int(tile),
            int(tile_capacity), jnp.dtype(accum_dtype).name,
            features.shape[1:3],
            projections, features, view_valid, origin)
    return _accum_core(tuple(voxel_dim), float(voxel_size),
                       int(view_chunk), jnp.dtype(accum_dtype).name,
                       features.shape[1:3],
                       projections, features, view_valid, origin)


def _accum_impl(voxel_dim, voxel_size, view_chunk, accum_dtype_name,
                projections, features, view_valid, origin):
    accum_dtype = jnp.dtype(accum_dtype_name)
    X, Y, Z = voxel_dim
    C = features.shape[-1]
    V = features.shape[0]
    chunk = max(1, min(view_chunk, V))
    pad = (-V) % chunk
    if pad:
        projections = jnp.concatenate(
            [projections, jnp.tile(projections[-1:], (pad, 1, 1))], axis=0)
        features = jnp.concatenate(
            [features, jnp.zeros((pad,) + features.shape[1:],
                                 features.dtype)], axis=0)
        view_valid = jnp.concatenate(
            [view_valid, jnp.zeros((pad,), view_valid.dtype)], axis=0)
    n_chunks = features.shape[0] // chunk
    projections = projections.reshape((n_chunks, chunk) + projections.shape[1:])
    features = features.reshape((n_chunks, chunk) + features.shape[1:])
    view_valid = view_valid.reshape(n_chunks, chunk)

    def body(carry, inp):
        vol_acc, cnt_acc = carry
        projs, feats, oks = inp
        vol_sum = jnp.zeros((X, Y, Z * C), accum_dtype)
        # view counts stay fp32 regardless of accum_dtype: they are
        # integer-valued and fp32 keeps them exact for any view count
        # (bf16 would round past 256), at ~3% of the accumulator traffic
        cnt_sum = jnp.zeros((X, Y, Z), jnp.float32)
        for j in range(chunk):
            vol, valid = backproject_view(projs[j], feats[j], voxel_dim,
                                          voxel_size, origin)
            okf = oks[j].astype(accum_dtype)
            vol_sum = vol_sum + vol.astype(accum_dtype) * okf
            cnt_sum = cnt_sum + valid.astype(jnp.float32) \
                * oks[j].astype(jnp.float32)
        return (vol_acc + vol_sum, cnt_acc + cnt_sum), None

    init = (jnp.zeros((X, Y, Z * C), accum_dtype),
            jnp.zeros((X, Y, Z), jnp.float32))
    (vol, cnt), _ = jax.lax.scan(body, init,
                                 (projections, features, view_valid))
    return vol.reshape(X, Y, Z, C), cnt


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _accum_core(voxel_dim, voxel_size, view_chunk, accum_dtype_name, hw,
                projections, features, view_valid, origin):
    return _accum_impl(voxel_dim, voxel_size, view_chunk,
                       accum_dtype_name, projections, features,
                       view_valid, origin)


def _accum_core_fwd(voxel_dim, voxel_size, view_chunk, accum_dtype_name,
                    hw, projections, features, view_valid, origin):
    out = _accum_impl(voxel_dim, voxel_size, view_chunk, accum_dtype_name,
                      projections, features, view_valid, origin)
    # dtype carried by a zero-size array (dtype objects are not pytree
    # leaves); H/W are the static ``hw`` nondiff arg
    res = (projections, view_valid, origin,
           jnp.zeros((0,), features.dtype))
    return out, res


def _accum_core_bwd(voxel_dim, voxel_size, view_chunk, accum_dtype_name,
                    hw, res, g):
    """d vol_sum / d features: for every valid view v,
    g_feat[v, p] = sum over voxels i with pixel(v, i) == p of g_vol[i].

    One scatter-add per view under ``lax.scan`` (a single scatter
    instruction in the program); invalid voxels route to a sentinel row
    that is sliced away.  Projections/origin carry no gradient (camera
    geometry is data, reference semantics) and view_valid is boolean.
    """
    import numpy as _np

    accum_dtype = jnp.dtype(accum_dtype_name)
    projections, view_valid, origin, fdtype_carrier = res
    fdtype = fdtype_carrier.dtype
    g_vol, _g_cnt = g                               # count: no feat grad
    H, W = hw
    C = g_vol.shape[-1]
    g_rows = g_vol.reshape(-1, C).astype(accum_dtype)     # [XYZ, C]
    sentinel = H * W

    def body(_, pv):
        p, ok = pv
        flat, valid = _project_indices(p, voxel_dim, voxel_size, origin,
                                       H, W)
        tgt = jnp.where(valid.reshape(-1), flat.reshape(-1), sentinel)
        tbl = jnp.zeros((H * W + 1, C), accum_dtype)
        tbl = tbl.at[tgt].add(g_rows)
        okf = ok.astype(accum_dtype)
        return None, (tbl[:H * W] * okf).reshape(H, W, C).astype(fdtype)

    _, g_feats = jax.lax.scan(body, None, (projections, view_valid))
    g_proj = jnp.zeros_like(projections)
    g_valid = _np.zeros(view_valid.shape, jax.dtypes.float0)
    g_origin = jnp.zeros_like(origin)
    return g_proj, g_feats, g_valid, g_origin


_accum_core.defvjp(_accum_core_fwd, _accum_core_bwd)


# ---------------------------------------------------------------------------
# Frustum-tile-culled accumulation: the gather is index-rate-bound (~0.3 G
# rows/s measured — doc/performance.md), and only ~35% of a full-scale
# ScanNet grid's 8³ tiles intersect any one view's frustum.  Culling at
# tile granularity turns the 6.3M per-view row-gathers into
# ``tile_capacity``·t³ gathers plus one cheap large-row scatter-add,
# without dynamic shapes: per view, score every tile by its in-frustum
# voxel count (pure VPU math, no memory traffic), ``top_k`` a STATIC
# number of tiles, gather features only for those, and scatter-add whole
# tiles (t³·C-element rows — bandwidth-bound, not index-bound) into a
# tile-major accumulator that unfolds to [X, Y, Z, C] once at the end.
# EXACT vs the dense path whenever the in-frustum tile count fits the
# capacity; on overflow the fullest tiles win and dropped tiles simply
# lose that view's contribution to the mean (graceful, view-local).


def _accum_impl_tiled(voxel_dim, voxel_size, tile, tile_capacity,
                      accum_dtype_name, projections, features, view_valid,
                      origin):
    accum_dtype = jnp.dtype(accum_dtype_name)
    X, Y, Z = voxel_dim
    t = tile
    t3 = t * t * t
    nx, ny, nz = X // t, Y // t, Z // t
    n_tiles = nx * ny * nz
    K = max(1, min(n_tiles, int(tile_capacity)))
    V, H, W, C = features.shape

    def body(carry, inp):
        vol_acc, cnt_acc = carry
        p, feat, ok = inp
        idx, valid = _project_indices_tiled(p, voxel_dim, t, voxel_size,
                                            origin, H, W)
        score = valid.sum(axis=1, dtype=jnp.int32)           # [Nt]
        from cnrma_tpu.utils.capacity_debug import report as _cap_report
        _cap_report("bp in-frustum tiles/view",
                    jnp.sum((score > 0).astype(jnp.int32)), K)
        _, tids = jax.lax.top_k(score, K)
        idx_k = jnp.take(idx, tids, axis=0)                  # [K, t³]
        val_k = jnp.take(valid, tids, axis=0)
        gathered = jnp.take(feat.reshape(H * W, C),
                            idx_k.reshape(-1), axis=0)       # THE gather
        okf = ok.astype(accum_dtype)
        rows = (jnp.where(val_k.reshape(-1)[:, None], gathered,
                          jnp.zeros((), feat.dtype))
                .astype(accum_dtype) * okf)
        # Accumulate via inverse-permutation GATHER + dense add, not
        # .at[tids].add: XLA:TPU's row scatter runs ~6x below HBM
        # bandwidth regardless of unique/sorted hints (measured 9.5
        # ms/view for K=6144 x 16384 f32 — the stage's single largest
        # cost, 473 of 1165 ms), while an n_tiles-row gather + add
        # streams at bandwidth (stage 1165 -> 982 ms at full scale).
        # Summing several views before touching the accumulator was
        # measured SLOWER (chunk=2: 1053 ms, chunk=5: 1017 ms) — XLA
        # materializes the per-chunk partial sum instead of fusing the
        # gathers into one accumulator pass, so keep one view per step.
        # inv[tile] = position of tile in tids, or K -> the zero row.
        inv = jnp.full((n_tiles,), K, jnp.int32)
        inv = inv.at[tids].set(jnp.arange(K, dtype=jnp.int32),
                               unique_indices=True,
                               mode="promise_in_bounds")     # tiny scatter
        rows_ext = jnp.concatenate(
            [rows.reshape(K, t3 * C),
             jnp.zeros((1, t3 * C), accum_dtype)], axis=0)
        # counts stay fp32 (integer-exact for any view count; ~3% of
        # the accumulator traffic) even when accum_dtype is bf16
        cnt_ext = jnp.concatenate(
            [val_k.astype(jnp.float32) * ok.astype(jnp.float32),
             jnp.zeros((1, t3), jnp.float32)], axis=0)
        vol_acc = vol_acc + jnp.take(rows_ext, inv, axis=0)
        cnt_acc = cnt_acc + jnp.take(cnt_ext, inv, axis=0)
        return (vol_acc, cnt_acc), None

    init = (jnp.zeros((n_tiles, t3 * C), accum_dtype),
            jnp.zeros((n_tiles, t3), jnp.float32))
    (vol, cnt), _ = jax.lax.scan(body, init,
                                 (projections, features, view_valid))
    vol = (vol.reshape(nx, ny, nz, t, t, t, C)
           .transpose(0, 3, 1, 4, 2, 5, 6).reshape(X, Y, Z, C))
    cnt = (cnt.reshape(nx, ny, nz, t, t, t)
           .transpose(0, 3, 1, 4, 2, 5).reshape(X, Y, Z))
    return vol, cnt


@_partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _accum_core_tiled(voxel_dim, voxel_size, tile, tile_capacity,
                      accum_dtype_name, hw, projections, features,
                      view_valid, origin):
    return _accum_impl_tiled(voxel_dim, voxel_size, tile, tile_capacity,
                             accum_dtype_name, projections, features,
                             view_valid, origin)


def _accum_core_tiled_fwd(voxel_dim, voxel_size, tile, tile_capacity,
                          accum_dtype_name, hw, projections, features,
                          view_valid, origin):
    out = _accum_impl_tiled(voxel_dim, voxel_size, tile, tile_capacity,
                            accum_dtype_name, projections, features,
                            view_valid, origin)
    res = (projections, view_valid, origin,
           jnp.zeros((0,), features.dtype))
    return out, res


def _accum_core_tiled_bwd(voxel_dim, voxel_size, tile, tile_capacity,
                          accum_dtype_name, hw, res, g):
    """Same pixel scatter-add as ``_accum_core_bwd`` but only for the
    tiles the forward kept (recomputed — the tile selection is a
    deterministic function of the projection), cutting the per-view
    scatter count by the same culling factor."""
    import numpy as _np

    accum_dtype = jnp.dtype(accum_dtype_name)
    projections, view_valid, origin, fdtype_carrier = res
    fdtype = fdtype_carrier.dtype
    g_vol, _g_cnt = g
    H, W = hw
    X, Y, Z = voxel_dim
    t = tile
    t3 = t * t * t
    nx, ny, nz = X // t, Y // t, Z // t
    n_tiles = nx * ny * nz
    K = max(1, min(n_tiles, int(tile_capacity)))
    C = g_vol.shape[-1]
    g_tiles = (g_vol.reshape(nx, t, ny, t, nz, t, C)
               .transpose(0, 2, 4, 1, 3, 5, 6)
               .reshape(n_tiles, t3, C).astype(accum_dtype))
    sentinel = H * W

    def body(_, pv):
        p, ok = pv
        idx, valid = _project_indices_tiled(p, voxel_dim, t, voxel_size,
                                            origin, H, W)
        score = valid.sum(axis=1, dtype=jnp.int32)
        _, tids = jax.lax.top_k(score, K)
        idx_k = jnp.take(idx, tids, axis=0).reshape(-1)
        val_k = jnp.take(valid, tids, axis=0).reshape(-1)
        g_k = jnp.take(g_tiles, tids, axis=0).reshape(K * t3, C)
        tgt = jnp.where(val_k, idx_k, sentinel)
        tbl = jnp.zeros((H * W + 1, C), accum_dtype)
        tbl = tbl.at[tgt].add(g_k)
        okf = ok.astype(accum_dtype)
        return None, (tbl[:H * W] * okf).reshape(H, W, C).astype(fdtype)

    _, g_feats = jax.lax.scan(body, None, (projections, view_valid))
    g_proj = jnp.zeros_like(projections)
    g_valid = _np.zeros(view_valid.shape, jax.dtypes.float0)
    g_origin = jnp.zeros_like(origin)
    return g_proj, g_feats, g_valid, g_origin


_accum_core_tiled.defvjp(_accum_core_tiled_fwd, _accum_core_tiled_bwd)


# ---------------------------------------------------------------------------
# Rect-footprint accumulation: the tiled path above is index-rate-bound —
# one row gather per in-frustum voxel (~110M/scene at full scale, the
# measured ~0.21 G rows/s XLA gather ceiling — doc/performance.md).  A
# tile's voxels project into a small contiguous pixel RECT, so instead of
# 512 row gathers per tile we can load the rect with ``Rh`` span gathers
# (long contiguous [Rw, C] slices) and pick each voxel's pixel out of the
# rect with a one-hot matmul on the MXU — ~20x fewer gather indices, with
# the selection moved to compute.  Tiles whose footprint exceeds the
# static ``Rh x Rw`` rect (near-camera tiles — few) take the row-gather
# path at a second static capacity.  Exact vs the dense path under the
# same capacity caveats as the tiled path (kept = highest in-frustum
# count per class); requires bf16-exact features (the one-hot matmul
# multiplies each feature by exactly 1.0, so any dtype is value-exact —
# but accumulation casts through the feature dtype like the other paths).


def _rect_select(px, py, valid, rh, rw, k_rect, k_over, ax=1, ay=1):
    """Per-view tile classification + top-k selection.

    Returns (tids_r [K1], sel_r [K1], tids_o [K2], sel_o [K2], rx0, ry0)
    where sel_* masks the slots actually backed by a qualifying tile.

    ``ax``/``ay`` snap the rect start down to an alignment lattice (the
    Pallas gather needs x-starts on the 16-lattice and y-starts on the
    4-lattice); the fits test uses the SNAPPED start so every pixel of
    a fits tile is provably inside the aligned rect.  ax=ay=1 is the
    exact pre-existing behavior.
    """
    big = jnp.int32(1 << 20)
    pxm = jnp.min(jnp.where(valid, px, big), axis=1)
    pxM = jnp.max(jnp.where(valid, px, -1), axis=1)
    pym = jnp.min(jnp.where(valid, py, big), axis=1)
    pyM = jnp.max(jnp.where(valid, py, -1), axis=1)
    if ax > 1:
        pxm = (pxm // ax) * ax
    if ay > 1:
        pym = (pym // ay) * ay
    has = valid.any(axis=1)
    fits = has & (pxM - pxm < rw) & (pyM - pym < rh)
    score = valid.sum(axis=1, dtype=jnp.int32)
    sr = jnp.where(fits, score, -1)
    _, tids_r = jax.lax.top_k(sr, k_rect)
    sel_r = jnp.take(sr, tids_r) >= 0
    so = jnp.where(has & ~fits, score, -1)
    _, tids_o = jax.lax.top_k(so, k_over)
    sel_o = jnp.take(so, tids_o) >= 0
    # exactness requires BOTH classes to fit their caps (dropped tiles
    # lose their views' contributions) — surface under the debug flag
    from cnrma_tpu.utils.capacity_debug import report as _cap_report
    _cap_report("bp rect-fit tiles/view",
                jnp.sum(fits.astype(jnp.int32)), k_rect)
    _cap_report("bp overflow tiles/view",
                jnp.sum((has & ~fits).astype(jnp.int32)), k_over)
    return tids_r, sel_r, tids_o, sel_o, pxm, pym


_RECT_CHUNK = 256   # tiles per one-hot matmul step (bounds the operand)


def _bp_pallas_decision(H, W, C, rh, rw, k1, t3):
    """(use_pallas, interpret) for the rect gather at these shapes.

    ``CNRMA_BP_PALLAS``: ``auto`` (default — on when the default JAX
    backend is a real TPU and the shapes are eligible), ``1`` (force,
    e.g. to compile-check), ``interpret`` (run the kernel in interpret
    mode — CPU parity tests), ``0`` (never).
    """
    import os

    mode = os.environ.get("CNRMA_BP_PALLAS", "auto").lower()
    if mode in ("0", "off", "false"):
        return False, False
    from . import pallas_bp
    if not pallas_bp.rect_gather_eligible(H, W, C, rh, rw, k1, t3):
        return False, False
    if mode == "interpret":
        return True, True
    if mode in ("1", "on", "true"):
        return True, False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probe never raises
        on_tpu = False
    return on_tpu, False


def _rect_gather_rows_pallas(feat, px, py, valid, tids_r, sel_r, pxm, pym,
                             rh, rw, t3, accum_dtype, interpret):
    """Pallas-kernel variant of ``_rect_gather_rows``.

    Requires ``pxm``/``pym`` from ``_rect_select(..., ax=16, ay=4)`` so
    the clipped rect starts stay on the alignment lattice (eligibility
    guarantees (W - rw) % 16 == 0 and (H - rh) % 4 == 0).  The local
    pixel code is computed from the SAME px/py as selection/backward,
    so the kernel can never disagree with them on a pixel.
    """
    from . import pallas_bp

    H, W, C = feat.shape
    ry0 = jnp.clip(jnp.take(pym, tids_r), 0, H - rh)
    rx0 = jnp.clip(jnp.take(pxm, tids_r), 0, W - rw)
    lx = jnp.take(px, tids_r, axis=0) - rx0[:, None]
    ly = jnp.take(py, tids_r, axis=0) - ry0[:, None]
    inside = ((lx >= 0) & (lx < rw) & (ly >= 0) & (ly < rh)
              & jnp.take(valid, tids_r, axis=0) & sel_r[:, None])
    invalid = (rh // 4) * rw * 4     # quarter-row position rp -> no match
    code = jnp.where(inside, (((ly >> 2) * rw + lx) << 2) | (ly & 3),
                     invalid)
    return pallas_bp.rect_gather(feat, ry0, rx0, code, rh, rw,
                                 accum_dtype, interpret=interpret)


def _rect_caps(n_tiles: int, k_rect: int, k_over: int) -> Tuple[int, int]:
    """Static (K1, K2): K1 a multiple of the one-hot chunk size."""
    K1 = min(n_tiles, max(1, int(k_rect)))
    if K1 >= _RECT_CHUNK:
        K1 = (K1 // _RECT_CHUNK) * _RECT_CHUNK
    K2 = max(1, min(n_tiles, int(k_over)))
    return K1, K2


def _rect_gather_rows(feat, px, py, valid, tids_r, sel_r, pxm, pym,
                      rh, rw, t3, accum_dtype):
    """Rect-load + one-hot-matmul features for the selected rect tiles.

    Returns rows [K1, C, t3] (channel-major within tile) in accum_dtype.
    """
    H, W, C = feat.shape
    K1 = tids_r.shape[0]
    rp = rh * rw
    ry0 = jnp.clip(jnp.take(pym, tids_r), 0, H - rh)
    rx0 = jnp.clip(jnp.take(pxm, tids_r), 0, W - rw)
    starts = jnp.stack(
        [jnp.repeat(ry0, rh)
         + jnp.tile(jnp.arange(rh, dtype=jnp.int32), K1),
         jnp.repeat(rx0, rh)], axis=-1)                       # [K1*rh, 2]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    rect = jax.lax.gather(
        feat, starts, dn, slice_sizes=(1, rw, C),
        mode=jax.lax.GatherScatterMode.CLIP).reshape(K1, rp, C)
    # local pixel within the rect; anything outside -> rp (one-hot
    # matches nothing -> zero row), which also zeroes unselected slots
    lx = jnp.take(px, tids_r, axis=0) - rx0[:, None]
    ly = jnp.take(py, tids_r, axis=0) - ry0[:, None]
    inside = ((lx >= 0) & (lx < rw) & (ly >= 0) & (ly < rh)
              & jnp.take(valid, tids_r, axis=0) & sel_r[:, None])
    pl = jnp.where(inside, ly * rw + lx, rp)                  # [K1, t3]

    ch = min(_RECT_CHUNK, K1)
    n_ch = K1 // ch
    rect = rect.reshape(n_ch, ch, rp, C)
    pl_c = pl.reshape(n_ch, ch, t3)

    def body(_, inp):
        r, p = inp
        oh = (jax.lax.broadcasted_iota(jnp.int32, (ch, rp, t3), 1)
              == p[:, None, :]).astype(r.dtype)
        # [ch, C, rp] @ [ch, rp, t3] -> [ch, C, t3]: output minor dim t3
        # is lane-aligned (the vpc orientation pads C=34 -> 128 lanes)
        return None, jnp.einsum("kpc,kpv->kcv", r, oh,
                                preferred_element_type=jnp.float32)
    _, out = jax.lax.scan(body, None, (rect, pl_c))
    return out.reshape(K1, C, t3).astype(accum_dtype)


def _accum_impl_rect(voxel_dim, voxel_size, tile, rect_hw, k_rect, k_over,
                     accum_dtype_name, projections, features, view_valid,
                     origin):
    accum_dtype = jnp.dtype(accum_dtype_name)
    X, Y, Z = voxel_dim
    t = tile
    t3 = t * t * t
    nx, ny, nz = X // t, Y // t, Z // t
    n_tiles = nx * ny * nz
    rh, rw = rect_hw
    V, H, W, C = features.shape
    rh, rw = min(rh, H), min(rw, W)
    K1, K2 = _rect_caps(n_tiles, k_rect, k_over)
    use_pl, pl_interp = _bp_pallas_decision(H, W, C, rh, rw, K1, t3)
    ax, ay = (16, 4) if use_pl else (1, 1)

    def body(carry, inp):
        vol_acc, cnt_acc = carry
        p, feat, ok = inp
        px, py, valid = _project_pixels_tiled(
            p, voxel_dim, t, voxel_size, origin, H, W)
        tids_r, sel_r, tids_o, sel_o, pxm, pym = _rect_select(
            px, py, valid, rh, rw, K1, K2, ax, ay)
        if use_pl:
            rows_r = _rect_gather_rows_pallas(
                feat, px, py, valid, tids_r, sel_r, pxm, pym, rh, rw,
                t3, accum_dtype, pl_interp)
        else:
            rows_r = _rect_gather_rows(feat, px, py, valid, tids_r,
                                       sel_r, pxm, pym, rh, rw, t3,
                                       accum_dtype)
        # overflow tiles: the tiled path's per-voxel row gather
        idx_o = (jnp.take(py, tids_o, axis=0) * W
                 + jnp.take(px, tids_o, axis=0))              # [K2, t3]
        val_o = jnp.take(valid, tids_o, axis=0) & sel_o[:, None]
        g = jnp.take(feat.reshape(H * W, C), idx_o.reshape(-1), axis=0)
        rows_o = jnp.where(val_o.reshape(-1)[:, None], g,
                           jnp.zeros((), g.dtype))
        rows_o = (rows_o.reshape(K2, t3, C).transpose(0, 2, 1)
                  .astype(accum_dtype))                       # [K2, C, t3]
        okf = ok.astype(accum_dtype)
        # inverse permutation: tile -> row in concat(rect, overflow, zero)
        zero_row = K1 + K2
        inv = jnp.full((n_tiles,), zero_row, jnp.int32)
        inv = inv.at[jnp.where(sel_r, tids_r, n_tiles)].set(
            jnp.arange(K1, dtype=jnp.int32), mode="drop")
        inv = inv.at[jnp.where(sel_o, tids_o, n_tiles)].set(
            jnp.arange(K1, K1 + K2, dtype=jnp.int32), mode="drop")
        rows_ext = jnp.concatenate(
            [rows_r.reshape(K1, C * t3) * okf,
             rows_o.reshape(K2, C * t3) * okf,
             jnp.zeros((1, C * t3), accum_dtype)], axis=0)
        val_r = jnp.take(valid, tids_r, axis=0) & sel_r[:, None]
        cnt_ext = jnp.concatenate(
            [val_r.astype(jnp.float32), val_o.astype(jnp.float32),
             jnp.zeros((1, t3), jnp.float32)], axis=0
        ) * ok.astype(jnp.float32)
        vol_acc = vol_acc + jnp.take(rows_ext, inv, axis=0)
        cnt_acc = cnt_acc + jnp.take(cnt_ext, inv, axis=0)
        return (vol_acc, cnt_acc), None

    init = (jnp.zeros((n_tiles, C * t3), accum_dtype),
            jnp.zeros((n_tiles, t3), jnp.float32))
    (vol, cnt), _ = jax.lax.scan(body, init,
                                 (projections, features, view_valid))
    vol = (vol.reshape(nx, ny, nz, C, t, t, t)
           .transpose(0, 4, 1, 5, 2, 6, 3).reshape(X, Y, Z, C))
    cnt = (cnt.reshape(nx, ny, nz, t, t, t)
           .transpose(0, 3, 1, 4, 2, 5).reshape(X, Y, Z))
    return vol, cnt


@_partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _accum_core_rect(voxel_dim, voxel_size, tile, rect_hw, k_rect, k_over,
                     accum_dtype_name, projections, features, view_valid,
                     origin):
    return _accum_impl_rect(voxel_dim, voxel_size, tile, rect_hw, k_rect,
                            k_over, accum_dtype_name, projections,
                            features, view_valid, origin)


def _accum_core_rect_fwd(voxel_dim, voxel_size, tile, rect_hw, k_rect,
                         k_over, accum_dtype_name, projections, features,
                         view_valid, origin):
    out = _accum_impl_rect(voxel_dim, voxel_size, tile, rect_hw, k_rect,
                           k_over, accum_dtype_name, projections,
                           features, view_valid, origin)
    res = (projections, view_valid, origin,
           jnp.zeros((0,) + features.shape[1:], features.dtype))
    return out, res


def _accum_core_rect_bwd(voxel_dim, voxel_size, tile, rect_hw, k_rect,
                         k_over, accum_dtype_name, res, g):
    """Pixel scatter-add of g over exactly the voxels the forward kept
    (both tile classes), recomputing the deterministic selection."""
    import numpy as _np

    accum_dtype = jnp.dtype(accum_dtype_name)
    projections, view_valid, origin, fcarrier = res
    fdtype = fcarrier.dtype
    H, W, C = fcarrier.shape[1:]
    g_vol, _g_cnt = g
    X, Y, Z = voxel_dim
    t = tile
    t3 = t * t * t
    nx, ny, nz = X // t, Y // t, Z // t
    n_tiles = nx * ny * nz
    rh, rw = rect_hw
    rh, rw = min(rh, H), min(rw, W)
    K1, K2 = _rect_caps(n_tiles, k_rect, k_over)
    # The SAME alignment decision as the forward: the fits/keep masks
    # must match the kept set exactly (same env, same static shapes).
    use_pl, _pl_interp = _bp_pallas_decision(H, W, C, rh, rw, K1, t3)
    ax, ay = (16, 4) if use_pl else (1, 1)
    g_tiles = (g_vol.reshape(nx, t, ny, t, nz, t, C)
               .transpose(0, 2, 4, 1, 3, 5, 6)
               .reshape(n_tiles, t3, C).astype(accum_dtype))
    sentinel = H * W

    def body(_, pv):
        p, ok = pv
        px, py, valid = _project_pixels_tiled(
            p, voxel_dim, t, voxel_size, origin, H, W)
        tids_r, sel_r, tids_o, sel_o, pxm, pym = _rect_select(
            px, py, valid, rh, rw, K1, K2, ax, ay)
        ry0 = jnp.clip(jnp.take(pym, tids_r), 0, H - rh)
        rx0 = jnp.clip(jnp.take(pxm, tids_r), 0, W - rw)
        lx = jnp.take(px, tids_r, axis=0) - rx0[:, None]
        ly = jnp.take(py, tids_r, axis=0) - ry0[:, None]
        keep_r = ((lx >= 0) & (lx < rw) & (ly >= 0) & (ly < rh)
                  & jnp.take(valid, tids_r, axis=0) & sel_r[:, None])
        keep_o = jnp.take(valid, tids_o, axis=0) & sel_o[:, None]
        tids = jnp.concatenate([tids_r, tids_o])
        keep = jnp.concatenate([keep_r, keep_o]).reshape(-1)
        pix = (jnp.take(py, tids, axis=0) * W
               + jnp.take(px, tids, axis=0)).reshape(-1)
        g_k = jnp.take(g_tiles, tids, axis=0).reshape(-1, C)
        tgt = jnp.where(keep, pix, sentinel)
        tbl = jnp.zeros((H * W + 1, C), accum_dtype)
        tbl = tbl.at[tgt].add(g_k)
        okf = ok.astype(accum_dtype)
        return None, (tbl[:H * W] * okf).reshape(H, W, C).astype(fdtype)

    _, g_feats = jax.lax.scan(body, None, (projections, view_valid))
    g_proj = jnp.zeros_like(projections)
    g_valid = _np.zeros(view_valid.shape, jax.dtypes.float0)
    g_origin = jnp.zeros_like(origin)
    return g_proj, g_feats, g_valid, g_origin


_accum_core_rect.defvjp(_accum_core_rect_fwd, _accum_core_rect_bwd)


def _normalize_volume(vol_sum: jnp.ndarray, cnt: jnp.ndarray, dtype
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    denom = jnp.where(cnt > 0, cnt, 1.0)
    return (vol_sum / denom[..., None]).astype(dtype), cnt > 0


def accumulate_views(projections: jnp.ndarray,
                     features: jnp.ndarray,
                     view_valid: jnp.ndarray,
                     voxel_dim: Sequence[int],
                     voxel_size: float,
                     origin: jnp.ndarray,
                     accum_dtype=jnp.float32,
                     view_chunk: int = 4,
                     tile: int = 0,
                     tile_capacity: int = 0,
                     rect: Tuple[int, int] = (0, 0),
                     rect_capacity: int = 0
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Accumulate all views into a normalized feature volume.

    Mirrors reference ``aggregate_2d_features`` + ``clear_3d_features``
    (``ray_marching.py:220-257``): sum per-view volumes and view counts, then
    volume /= count with count==0 -> 0.

    Args:
        projections: [V, 3, 4] per-view projections (stride-adjusted).
        features: [V, H, W, C].
        view_valid: [V] bool — padded views contribute nothing.

    Returns:
        volume: [X, Y, Z, C] mean feature volume (0 where unobserved),
        valid: [X, Y, Z] bool (observed by >= 1 view).
    """
    vol, cnt = accumulate_views_partial(
        projections, features, view_valid, voxel_dim, voxel_size, origin,
        accum_dtype=accum_dtype, view_chunk=view_chunk, tile=tile,
        tile_capacity=tile_capacity, rect=rect,
        rect_capacity=rect_capacity)
    return _normalize_volume(vol, cnt, features.dtype)


def accumulate_views_view_sharded(mesh, projections: jnp.ndarray,
                                  features: jnp.ndarray,
                                  view_valid: jnp.ndarray,
                                  voxel_dim: Sequence[int],
                                  voxel_size: float,
                                  origin: jnp.ndarray,
                                  axis: str = "view",
                                  accum_dtype=jnp.float32,
                                  view_chunk: int = 4,
                                  tile: int = 0,
                                  tile_capacity: int = 0,
                                  rect: Tuple[int, int] = (0, 0),
                                  rect_capacity: int = 0
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """View-parallel volume accumulation (SURVEY.md §5 scaling plan).

    Shards the view axis over ``mesh[axis]``: each device scan-accumulates
    its view shard locally, then the (volume, count) partials combine with
    ONE ``psum`` over ICI — the collective-friendly layout for scaling the
    50-view accumulation across chips.  Numerically identical to
    ``accumulate_views`` (the accumulator is a commutative fp32 sum).

    Requires ``V % mesh.shape[axis] == 0`` (pad with invalid views).

    The accumulation knobs (``accum_dtype`` / ``view_chunk`` / frustum
    tile/rect culling) apply per shard exactly as in
    ``accumulate_views`` — the same config values drive both paths.
    """
    from jax.sharding import PartitionSpec as P

    from cnrma_tpu.parallel.mesh import view_psum_volume

    V = features.shape[0]
    n = mesh.shape[axis]
    if V % n != 0:
        raise ValueError(f"views ({V}) must divide the '{axis}' mesh axis "
                         f"size ({n}); pad with invalid views")

    def partial_fn(proj, feats, valid):
        return accumulate_views_partial(
            proj, feats, valid, voxel_dim, voxel_size, origin,
            accum_dtype=accum_dtype, view_chunk=view_chunk, tile=tile,
            tile_capacity=tile_capacity, rect=rect,
            rect_capacity=rect_capacity)

    # check_vma off: the scan accumulator inits as a replicated zero but
    # becomes device-varying through the per-shard views — by construction
    # (commutative sum + psum) the combined result is replicated.
    fn = jax.shard_map(view_psum_volume(partial_fn, axis_name=axis),
                       mesh=mesh, in_specs=(P(axis), P(axis), P(axis)),
                       out_specs=(P(), P()), check_vma=False)
    vol, valid = fn(projections, features, view_valid)
    return vol.astype(features.dtype), valid
