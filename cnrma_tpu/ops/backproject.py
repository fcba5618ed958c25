"""Back-projection of 2D feature maps into a 3D feature volume.

TPU-native formulation of reference ``ray_marching.py:backproject`` (:21-69)
/ ``atlas.py:backproject`` (:20-67): for every voxel, project its center into
the view and *gather* the pixel feature (no scatter — XLA-friendly, perfectly
parallel over voxels).  Views are accumulated with a running (volume, valid)
sum via ``lax.scan`` so memory is O(volume), not O(views) — the reference's
sequential per-view accumulation (``ray_marching.py:424-436``) expressed as a
compiled loop.  The accumulator is a commutative sum, so views can also be
sharded across devices and combined with a ``psum`` (see parallel/).

Layout: channels-last.  feature [H, W, C]; volume [X, Y, Z, C].
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


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
        volume: [X, Y, Z, C] voxel features (0 outside the frustum),
        valid: [X, Y, Z] bool, voxel projects into the view frustum.
    """
    X, Y, Z = voxel_dim
    H, W, C = feature.shape
    dtype = feature.dtype

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
    # match reference: round() then integer cast (ray_marching.py:52-53)
    px = jnp.round(cam[..., 0] * inv_z).astype(jnp.int32)
    py = jnp.round(cam[..., 1] * inv_z).astype(jnp.int32)
    valid = ((px >= 0) & (py >= 0) & (px < W) & (py < H) & (pz > 0))

    flat_idx = jnp.clip(py, 0, H - 1) * W + jnp.clip(px, 0, W - 1)
    gathered = jnp.take(feature.reshape(H * W, C),
                        flat_idx.reshape(-1), axis=0).reshape(X, Y, Z, C)
    volume = jnp.where(valid[..., None], gathered,
                       jnp.zeros((), dtype=dtype))
    return volume, valid


def accumulate_views(projections: jnp.ndarray,
                     features: jnp.ndarray,
                     view_valid: jnp.ndarray,
                     voxel_dim: Sequence[int],
                     voxel_size: float,
                     origin: jnp.ndarray,
                     accum_dtype=jnp.float32
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
    X, Y, Z = voxel_dim
    C = features.shape[-1]

    def body(carry, inp):
        vol_acc, cnt_acc = carry
        proj, feat, ok = inp
        vol, valid = backproject_view(proj, feat, voxel_dim, voxel_size,
                                      origin)
        okf = ok.astype(accum_dtype)
        vol_acc = vol_acc + vol.astype(accum_dtype) * okf
        cnt_acc = cnt_acc + valid.astype(accum_dtype) * okf
        return (vol_acc, cnt_acc), None

    init = (jnp.zeros((X, Y, Z, C), accum_dtype),
            jnp.zeros((X, Y, Z), accum_dtype))
    (vol, cnt), _ = jax.lax.scan(body, init,
                                 (projections, features, view_valid))
    denom = jnp.where(cnt > 0, cnt, 1.0)
    volume = vol / denom[..., None]
    return volume.astype(features.dtype), cnt > 0
