"""GT TSDF fusion from posed depth maps — jittable.

Re-implements the reference's offline fusion
(``data_prepare/scannet/tsdf.py:402-451`` + ``generate_tsdf.py:82-173``) as
a ``lax.scan`` over frames on a fixed voxel grid:

* signed distance ``dist = pz - depth`` clamped to min -1 in units of the
  truncation margin (``trunc_ratio`` voxels); voxels more than one margin
  behind the surface (dist >= 1) stay unknown (+1);
* near-surface observations (dist > -1) accumulate a running sum with a
  weight count (average on readout) — exactly the reference ``integrate``
  (``tsdf.py:436-446``): clamped free-space observations (dist == -1) only
  perform a "first write", so a voxel seen exclusively as deep free space
  reads out as -1 with weight 0, and never biases the near-surface mean;
* volume bounds come from a depth-backprojected point cloud quantile with
  margin (``get_volume_setting``).

Runs per-scale (4/8/16 cm) on TPU or CPU; the driver
``tools/data_prepare/generate_tsdf.py`` parallelizes over scenes with
processes (replacing the reference's ray actors).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("voxel_dim",))
def fuse_tsdf(depths: jnp.ndarray,
              projections: jnp.ndarray,
              frame_valid: jnp.ndarray,
              origin: jnp.ndarray,
              voxel_dim: Tuple[int, int, int],
              voxel_size: float,
              trunc_ratio: float = 3.0,
              max_depth: float = 3.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse depth maps into a TSDF volume.

    Args:
        depths: [F, H, W] metric depth (0 = invalid).
        projections: [F, 3, 4] K @ world-to-camera.
        frame_valid: [F] bool.
        origin: [3] world position of voxel (0,0,0).
    Returns:
        tsdf [X, Y, Z] in [-1, 1] (+1 unknown), weights [X, Y, Z].
    """
    X, Y, Z = voxel_dim
    f, h, w = depths.shape
    trunc = trunc_ratio * voxel_size

    xs = jnp.arange(X, dtype=jnp.float32) * voxel_size + origin[0]
    ys = jnp.arange(Y, dtype=jnp.float32) * voxel_size + origin[1]
    zs = jnp.arange(Z, dtype=jnp.float32) * voxel_size + origin[2]

    def integrate(carry, inp):
        tsdf_sum, weight, free_seen = carry
        proj, depth, ok = inp
        cam = (proj[:, 0][None, None, None, :] * xs[:, None, None, None]
               + proj[:, 1][None, None, None, :] * ys[None, :, None, None]
               + proj[:, 2][None, None, None, :] * zs[None, None, :, None]
               + proj[:, 3][None, None, None, :])
        pz = cam[..., 2]
        inv_z = jnp.where(pz != 0, 1.0 / pz, 0.0)
        px = jnp.round(cam[..., 0] * inv_z).astype(jnp.int32)
        py = jnp.round(cam[..., 1] * inv_z).astype(jnp.int32)
        in_view = ((px >= 0) & (py >= 0) & (px < w) & (py < h) & (pz > 0))
        flat = jnp.clip(py, 0, h - 1) * w + jnp.clip(px, 0, w - 1)
        d = jnp.take(depth.reshape(-1), flat.reshape(-1)).reshape(pz.shape)
        has_depth = (d > 0) & (d <= max_depth)
        dist = jnp.clip((pz - d) / trunc, -1.0, None)
        valid = in_view & has_depth & (dist < 1.0) & ok
        # reference integrate (tsdf.py:436-446): only near-surface
        # observations (dist > -1) enter the running mean; a clamped
        # free-space observation (dist == -1) is remembered but weightless
        near = valid & (dist > -1.0)
        tsdf_sum = tsdf_sum + jnp.where(near, dist, 0.0)
        weight = weight + near.astype(jnp.float32)
        free_seen = free_seen | (valid & ~near)
        return (tsdf_sum, weight, free_seen), None

    init = (jnp.zeros((X, Y, Z), jnp.float32),
            jnp.zeros((X, Y, Z), jnp.float32),
            jnp.zeros((X, Y, Z), bool))
    (tsdf_sum, weight, free_seen), _ = jax.lax.scan(
        integrate, init, (projections, depths, frame_valid))
    tsdf = jnp.where(weight > 0, tsdf_sum / jnp.maximum(weight, 1.0),
                     jnp.where(free_seen, -1.0, 1.0))
    return tsdf, weight


def depth_to_world_points(depth: np.ndarray, intrinsic: np.ndarray,
                          cam2world: np.ndarray,
                          max_depth: float = 3.0) -> np.ndarray:
    """Backproject one depth map to world points (numpy, bounds estimate;
    reference ``data_prepare/scannet/tsdf.py:77-101``)."""
    h, w = depth.shape
    v, u = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    valid = (depth > 0) & (depth <= max_depth)
    z = depth[valid]
    uu, vv = u[valid], v[valid]
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    xyz_cam = np.stack([(uu - cx) / fx * z, (vv - cy) / fy * z, z,
                        np.ones_like(z)], axis=0)
    return (cam2world @ xyz_cam)[:3].T


def volume_bounds_from_depths(points: np.ndarray, voxel_size: float,
                              margin: float = 1.5,
                              quantile: float = 0.005
                              ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """0.5%-quantile bounds + margin -> (origin, voxel_dim)
    (reference ``generate_tsdf.py:82-101``)."""
    lo = np.quantile(points, quantile, axis=0) - margin
    hi = np.quantile(points, 1 - quantile, axis=0) + margin
    origin = lo.astype(np.float32)
    dim = np.ceil((hi - lo) / voxel_size).astype(int)
    return origin, (int(dim[0]), int(dim[1]), int(dim[2]))
