"""CN-RMA combined model: 2D tower -> volume -> TSDF -> ray marching ->
sparse detection, plus the recon-only Atlas model.

Re-implements the reference top-level detectors
(``models/ray_marching.py:RayMarching`` and ``models/atlas.py:Atlas``) as a
single jittable flax module:

* ``forward_train`` (:409-451): joint 2D backbone over all views, per-view
  volume accumulation, 3D U-Net + TSDF head, NeuS ray marching into a point
  cloud, point augmentation + subsample, FCAF3D loss;
  total = w_recon * recon + w_det * det.
* ``forward_test`` (:456-521): same pipeline on the test grid; emits the
  fine TSDF and raw per-scale top-k boxes (saved host-side in the
  reference's ``{scene}_bbox_raw.npz`` format by ``train/eval.py``).

Static-shape redesign of the dynamic parts:
* views are a padded axis processed by ``lax.scan``/``lax.map``;
* per-view ray-march compaction is fixed-capacity (``rays_per_view_cap``);
* the global 500k subsample is a sort by (invalid, random) — an exact
  without-replacement sample of valid points (reference
  ``sample_points``, ``fcaf3d_transforms.py:283-296``);
* pixel features are gathered only for the surviving points.

Gradient flow matches the reference: the TSDF entering ray marching is
stop-gradient (reference wraps sampling in no_grad, :705-745), while the
gathered 2D features stay differentiable, so the detection loss trains the
2D tower but not the recon head through the ray-march path.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cnrma_tpu.models.fcaf3d import (
    DetectionCapacities, FCAF3DDetector, LevelOut)
from cnrma_tpu.models.resnet_fpn import ResNetFPN2D
from cnrma_tpu.models.tsdf_head import TSDFHead
from cnrma_tpu.models.unet3d import UNet3D
from cnrma_tpu.ops.backproject import accumulate_views
from cnrma_tpu.utils.batching import batch_map
from cnrma_tpu.ops.ray_marching import (
    RayMarchPoints, build_occupancy, ray_march_depth, ray_march_neus)


class RayPoints(NamedTuple):
    """Final per-scene point cloud fed to the detector."""
    xyz: jnp.ndarray       # [B, P, 3] world coords (offset applied)
    feats: jnp.ndarray     # [B, P, C] weight-scaled features
    valid: jnp.ndarray     # [B, P]


def _rotate_boxes(boxes: jnp.ndarray, angle: jnp.ndarray,
                  with_yaw: bool) -> jnp.ndarray:
    """Rotate gravity-center boxes around +z.  For no-yaw boxes the xy dims
    become the rotated enclosing box (mmdet3d Depth-box semantics used by
    ``TransformFeaturesBBoxes``)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = boxes[..., 0] * c - boxes[..., 1] * s
    y = boxes[..., 0] * s + boxes[..., 1] * c
    if with_yaw:
        dims = boxes[..., 3:6]
        yaw = boxes[..., 6] + angle
    else:
        w = (jnp.abs(boxes[..., 3] * c) + jnp.abs(boxes[..., 4] * s))
        l = (jnp.abs(boxes[..., 3] * s) + jnp.abs(boxes[..., 4] * c))
        dims = jnp.stack([w, l, boxes[..., 5]], axis=-1)
        yaw = boxes[..., 6]
    return jnp.concatenate(
        [jnp.stack([x, y, boxes[..., 2]], -1), dims, yaw[..., None]],
        axis=-1)


def feature_transform_aug(rng: jax.Array, points: jnp.ndarray,
                          boxes: jnp.ndarray, with_yaw: bool,
                          flip_ratio_horizontal: float = 0.5,
                          flip_ratio_vertical: float = 0.5,
                          rot_range: Tuple[float, float] = (-0.087266,
                                                            0.087266),
                          scale_ratio_range: Tuple[float, float] = (0.9,
                                                                    1.1),
                          translation_std: Tuple[float, float, float] =
                          (0.1, 0.1, 0.1)
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Train-time point/box augmentation (reference
    ``TransformFeaturesBBoxes``, ``fcaf3d_transforms.py:14-146``): flips,
    small z-rotation, global scale, gaussian translation — applied jointly
    to the ray-marched points and the gt boxes, per scene."""
    kf, kv, kr, ks, kt = jax.random.split(rng, 5)
    pts = points

    do_h = jax.random.uniform(kf) < flip_ratio_horizontal
    pts = jnp.where(do_h, pts * jnp.array([-1.0, 1.0, 1.0]), pts)
    bx = jnp.where(do_h, -boxes[..., 0], boxes[..., 0])
    byaw = jnp.where(do_h & with_yaw, math.pi - boxes[..., 6],
                     boxes[..., 6])
    boxes = jnp.concatenate([bx[..., None], boxes[..., 1:6],
                             byaw[..., None]], axis=-1)

    do_v = jax.random.uniform(kv) < flip_ratio_vertical
    pts = jnp.where(do_v, pts * jnp.array([1.0, -1.0, 1.0]), pts)
    by = jnp.where(do_v, -boxes[..., 1], boxes[..., 1])
    byaw = jnp.where(do_v & with_yaw, -boxes[..., 6], boxes[..., 6])
    boxes = jnp.concatenate([boxes[..., :1], by[..., None],
                             boxes[..., 2:6], byaw[..., None]], axis=-1)

    angle = jax.random.uniform(kr, minval=rot_range[0],
                               maxval=rot_range[1])
    c, s = jnp.cos(angle), jnp.sin(angle)
    px = pts[..., 0] * c - pts[..., 1] * s
    py = pts[..., 0] * s + pts[..., 1] * c
    pts = jnp.stack([px, py, pts[..., 2]], axis=-1)
    boxes = _rotate_boxes(boxes, angle, with_yaw)

    scale = jax.random.uniform(ks, minval=scale_ratio_range[0],
                               maxval=scale_ratio_range[1])
    pts = pts * scale
    boxes = jnp.concatenate([boxes[..., :6] * scale, boxes[..., 6:]],
                            axis=-1)

    trans = (jax.random.normal(kt, (3,))
             * jnp.asarray(translation_std, jnp.float32))
    pts = pts + trans
    boxes = jnp.concatenate(
        [boxes[..., :3] + trans, boxes[..., 3:]], axis=-1)
    return pts, boxes


def _normalize_subsample(flat: RayMarchPoints, rng_b: jax.Array,
                         max_points: int):
    """Mean-normalize weights over all collected samples and draw an
    exact without-replacement random subsample of the valid points
    (reference ``switch_pointcloud`` + ``sample_points``,
    ``ray_marching.py:297-307``, ``fcaf3d_transforms.py:283-296``)."""
    from cnrma_tpu.utils.capacity_debug import report as _cap_report
    n_flat = flat.weight.shape[0]
    valid = flat.weight > 0
    n_valid = jnp.sum(valid.astype(jnp.float32))
    _cap_report("scene points before max_points subsample",
                n_valid, max_points)
    mean_w = (jnp.sum(flat.weight)
              / jnp.maximum(n_valid, 1.0))
    weights = flat.weight / jnp.maximum(mean_w, 1e-12)
    r = jax.random.uniform(rng_b, (n_flat,))
    order = jnp.argsort(jnp.where(valid, r, jnp.inf))
    sel = order[:max_points]
    return (jnp.take(flat.xyz, sel, axis=0),
            jnp.take(weights, sel),
            jnp.take(flat.uv, sel, axis=0),
            jnp.take(flat.view, sel),
            jnp.take(valid, sel))


def _gather_point_feats(f_b: jnp.ndarray, uv_b: jnp.ndarray,
                        view_b: jnp.ndarray, valid_b: jnp.ndarray
                        ) -> jnp.ndarray:
    """Per-point pixel-feature fetch from the [V, h, w, C] feature maps."""
    v, h, w, c = f_b.shape
    vi = jnp.clip(view_b, 0, v - 1)
    flat_idx = (vi * h + jnp.clip(uv_b[:, 1], 0, h - 1)) * w \
        + jnp.clip(uv_b[:, 0], 0, w - 1)
    g = jnp.take(f_b.reshape(v * h * w, c), flat_idx, axis=0)
    return jnp.where(valid_b[:, None], g, 0.0)


class CNRMA(nn.Module):
    """The combined detector (reference ``RayMarching``).

    Batch layout: imgs [B, V, H, W, 3] raw RGB; projections [B, V, 3, 4]
    (full-resolution intrinsics x inverse extrinsics); view_valid [B, V];
    gt boxes padded [B, M, 7] gravity-z + masks; offset [B, 3].
    """
    voxel_dim: Tuple[int, int, int] = (192, 192, 80)
    voxel_size: float = 0.04
    n_scales: int = 3
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    pixel_mean: Tuple[float, float, float] = (103.53, 116.28, 123.675)
    pixel_std: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    backbone2d_stride: int = 4
    feature_dim: int = 32
    # ray marching
    ray_marching_type: str = "neus"        # 'neus' | 'depth'
    neus_threshold: float = 0.05
    depth_points: int = 2
    ray_samples: int = 300
    # per-view kept-sample capacity: the reference keeps EVERY
    # above-threshold sample (ray_marching.py:780-800, unbounded
    # nonzero); we keep the capacity highest-weight ones.  98304 keeps
    # 100% of the weight mass on every probed full-scale view
    # (tools/raycap_probe.py — 32768 clipped up to 36%).
    rays_per_view_cap: int = 98304
    max_points: int = 500000
    # empty-space skipping (neus only): coarse occupancy pre-march; 0
    # disables.  The fine TSDF gather — the measured ray-march wall — runs
    # on a ``ray_skip_window``-sample window around the first surface
    # band instead of all ``ray_samples`` (ops/ray_marching.py).
    ray_skip_factor: int = 8
    ray_skip_window: int = 48
    # coarse pre-march stride: 8 fine steps stays under one dilated
    # coarse-cell edge (cells are 8 voxels; the band cannot be stepped
    # over — pinned to the dense march by test).  Default 8 since the
    # round-4 TPU A/B: ray march 565 -> 433 ms at full scale.
    ray_skip_coarse_step: int = 8
    # frustum-tile culling for volume accumulation (ops/backproject.py):
    # per view only the bp_tile_frac fraction of bp_tile³ voxel tiles with
    # the most in-frustum voxels are gathered.  Exact whenever each view's
    # frustum covers <= that fraction of the grid (measured ~35% at the
    # full ScanNet setting); only applied to grids of >= 4096 tiles so
    # small test/entry grids keep the dense path.  0 disables.
    bp_tile: int = 8
    bp_tile_frac: float = 0.5
    # rect-footprint volume gather (ops/backproject.py): small-footprint
    # tiles load their bp_rect_h x bp_rect_w pixel rect with span gathers
    # and pick voxels' pixels out of it with the VMEM-resident Pallas
    # one-hot MXU kernel (ops/pallas_bp.py); tiles whose footprint
    # exceeds the rect (near-camera — few) take the row-gather path at
    # the bp_overflow_frac capacity.  DEFAULT ON since the round-5 TPU
    # A/B (volume 827 -> ~700 ms at the full rung; sweep in
    # doc/performance.md) — but only engaged when the Pallas kernel is
    # eligible for the shapes/backend (build_volume checks
    # _bp_pallas_decision; the pure-XLA rect formulation LOSES at full
    # scale, so ineligible setups keep the row-gather tiled path).
    # 32x32 @ overflow 0.06 is the exactness-safe point measured by
    # tools/rect_fit_probe.py: probe max overflow occupancy 0.018
    # (full) / 0.038 (medium) of n_tiles — 1.6-3x margin; rect-fit
    # max 0.48 < bp_rect_frac 0.5.  Verify on new data with
    # CNRMA_CAPACITY_DEBUG=1.  0 disables (row-gather tiled path).
    bp_rect_h: int = 32
    bp_rect_w: int = 32
    bp_rect_frac: float = 0.5
    bp_overflow_frac: float = 0.06   # row-gather capacity when rect is on
    # dtype of the volume-sum accumulator (ops/backproject.py).  The
    # accumulator's HBM read-modify-write is the volume stage's largest
    # cost after the gathers; 'bfloat16' halves that traffic at ~1%
    # relative error on the 50-view mean (view counts stay fp32-exact
    # either way).  'float32' (default) is bit-faithful to the
    # reference's fp32 `self.volume += volume` (atlas.py:152-153).
    bp_accum_dtype: str = "float32"
    # view-parallel volume accumulation (SURVEY.md §5): a Mesh with a
    # 'view' axis shards the view loop across devices and combines the
    # (volume, count) partials with one psum over ICI — the multi-chip
    # latency path for single-scene inference (tools/test.py
    # --view-shard).  None = single-device lax.scan over views.
    view_mesh: Optional[Any] = None
    # detection
    detection: bool = True
    n_classes: int = 18
    n_reg_outs: int = 6
    with_yaw: bool = False
    voxel_size_fcaf3d: float = 0.01
    pts_threshold: int = 200000
    assigner_limit: int = 27
    assigner_topk: int = 18
    nms_pre: int = 1000
    capacities: DetectionCapacities = DetectionCapacities()
    # losses
    loss_weight_recon: float = 1.0
    loss_weight_detection: float = 1.0
    # augmentation
    use_feature_transform: bool = True
    feature_transform: Optional[Dict[str, Any]] = None
    # misc — the reference's use_batchnorm_train/test knobs
    # (ray_marching.py:474-483) have no analog here: with running-stats BN
    # (FrozenBN) per-frame and joint-batch 2D execution are identical, so
    # the builder accepts-and-ignores them (core/builder.py)
    compute_dtype: Any = jnp.float32
    # mesh axis for cross-device loss reductions (reference reduce_mean,
    # fcaf3d_head.py:188-198); set by the shard_map train step, None when
    # the whole batch lives in one program
    pmean_axis: Optional[str] = None

    def setup(self):
        self.tower2d = ResNetFPN2D(output_dim=self.feature_dim,
                                   compute_dtype=self.compute_dtype)
        self.backbone3d = UNet3D(
            remat=True,
            compute_dtype=(self.compute_dtype
                           if self.compute_dtype != jnp.float32 else None))
        self.tsdf_head = TSDFHead(voxel_size=self.voxel_size,
                                  n_scales=self.n_scales)
        if self.detection:
            self.detector = FCAF3DDetector(
                n_classes=self.n_classes, n_reg_outs=self.n_reg_outs,
                voxel_size=self.voxel_size_fcaf3d,
                pts_threshold=self.pts_threshold,
                assigner_limit=self.assigner_limit,
                assigner_topk=self.assigner_topk,
                with_yaw=self.with_yaw, nms_pre=self.nms_pre,
                capacities=self.capacities,
                compute_dtype=self.compute_dtype)

    # ------------------------------------------------------------------
    def normalize_images(self, imgs: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        return (imgs - mean) / std

    def extract_2d(self, imgs: jnp.ndarray, train: bool) -> jnp.ndarray:
        """[B, V, H, W, 3] -> [B, V, h, w, C] stride-4 features.  All views
        share one joint batch (the reference's ``use_batchnorm_train`` path,
        ``ray_marching.py:419-426``).

        With ``view_mesh`` the per-view batch is GSPMD-sharded over the
        'view' axis: the tower is embarrassingly parallel per image at
        eval time (running BN stats), so one sharding constraint splits
        every conv across chips with no collectives until the consumer."""
        b, v = imgs.shape[:2]
        x = self.normalize_images(imgs.reshape((b * v,) + imgs.shape[2:]))
        if self.view_mesh is not None and not train \
                and (b * v) % self.view_mesh.shape["view"] == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(self.view_mesh, P("view")))
        feats = self.tower2d(x, train=train)
        return feats.reshape((b, v) + feats.shape[1:])

    def _bp_knobs(self, feat_shape: Optional[Tuple[int, int, int]] = None
                  ) -> Tuple[int, int, Tuple[int, int], int]:
        """(tile, tile_capacity, rect, rect_capacity) accumulation knobs
        from the model config (tile culling + rect gather gating).

        ``feat_shape`` = (h, w, C) of the stride-4 feature maps: the
        rect path only engages when the Pallas rect kernel would serve
        it (``_bp_pallas_decision``) — the pure-XLA rect formulation
        measured SLOWER than the row-gather tiled path at full scale
        (doc/performance.md round-4 A/B), so non-TPU backends and
        ineligible shapes keep the tiled path.
        """
        tile, tile_cap = 0, 0
        if self.bp_tile > 0 and all(d % self.bp_tile == 0
                                    for d in self.voxel_dim):
            n_tiles = 1
            for d in self.voxel_dim:
                n_tiles *= d // self.bp_tile
            if n_tiles >= 4096:
                tile = self.bp_tile
                tile_cap = max(1, int(round(self.bp_tile_frac * n_tiles)))
        rect, rect_cap = (0, 0), 0
        if tile and self.bp_rect_h > 0 and self.bp_rect_w > 0:
            n_tiles = 1
            for d in self.voxel_dim:
                n_tiles *= d // tile
            k_rect = max(1, int(round(self.bp_rect_frac * n_tiles)))
            eligible = True
            if feat_shape is not None:
                from cnrma_tpu.ops.backproject import (
                    _bp_pallas_decision, _rect_caps)
                h, w, c = feat_shape
                K1, _ = _rect_caps(n_tiles, k_rect, 1)
                eligible = _bp_pallas_decision(
                    h, w, c, self.bp_rect_h, self.bp_rect_w, K1,
                    tile ** 3)[0]
            if eligible:
                rect = (self.bp_rect_h, self.bp_rect_w)
                rect_cap = k_rect
                # tile_capacity becomes the overflow row-gather cap
                tile_cap = max(1, int(round(self.bp_overflow_frac
                                            * n_tiles)))
        return tile, tile_cap, rect, rect_cap

    def build_volume(self, feats: jnp.ndarray, projections: jnp.ndarray,
                     view_valid: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Scaled-projection back-projection + mean accumulation."""
        proj = projections.at[..., :2, :].divide(self.backbone2d_stride)
        origin = jnp.asarray(self.origin, jnp.float32)
        tile, tile_cap, rect, rect_cap = self._bp_knobs(
            tuple(feats.shape[-3:]))
        if self.view_mesh is not None:
            from cnrma_tpu.ops.backproject import (
                accumulate_views_view_sharded)
            n = self.view_mesh.shape["view"]
            pad = (-feats.shape[1]) % n
            if pad:       # pad views to the shard count with invalid rows
                proj = jnp.concatenate(
                    [proj, jnp.repeat(proj[:, :1], pad, axis=1)], axis=1)
                feats = jnp.concatenate(
                    [feats, jnp.zeros_like(
                        jnp.repeat(feats[:, :1], pad, axis=1))], axis=1)
                view_valid = jnp.concatenate(
                    [view_valid,
                     jnp.zeros((view_valid.shape[0], pad), bool)], axis=1)
            # same accumulation knobs as the single-program path below
            return batch_map(
                lambda p, f, v: accumulate_views_view_sharded(
                    self.view_mesh, p, f, v, self.voxel_dim,
                    self.voxel_size, origin,
                    accum_dtype=jnp.dtype(self.bp_accum_dtype),
                    tile=tile, tile_capacity=tile_cap,
                    rect=rect, rect_capacity=rect_cap),
                proj, feats, view_valid)
        vol, valid = batch_map(
            lambda p, f, v: accumulate_views(
                p, f, v, self.voxel_dim, self.voxel_size, origin,
                accum_dtype=jnp.dtype(self.bp_accum_dtype),
                tile=tile, tile_capacity=tile_cap,
                rect=rect, rect_capacity=rect_cap),
            proj, feats, view_valid)
        return vol, valid

    def reconstruct(self, volume: jnp.ndarray,
                    targets: Optional[Dict[str, jnp.ndarray]], train: bool
                    ) -> Tuple[Dict[str, jnp.ndarray],
                               Dict[str, jnp.ndarray]]:
        xs = self.backbone3d(volume, train=train)
        return self.tsdf_head(xs, targets)

    # ------------------------------------------------------------------
    def ray_march(self, feats: jnp.ndarray, projections: jnp.ndarray,
                  view_valid: jnp.ndarray, tsdf004: jnp.ndarray,
                  offset: jnp.ndarray, rng: jax.Array,
                  scene_seed: Optional[jnp.ndarray] = None) -> RayPoints:
        """All-view ray marching -> weighted feature point cloud.

        Mirrors ``aggregate_2d_features_ray_marching`` + ``switch_pointcloud``
        (``ray_marching.py:260-307,339-407``): per-view NeuS/depth marching,
        weight normalization by the global mean, random subsample to
        ``max_points``, pixel-feature gather, weight multiply, offset add.

        ``scene_seed`` ([B] int32, optional): when given, each scene's
        subsample key is ``fold_in(rng, seed_b)`` instead of
        ``split(rng, B)[b]`` — making the draw a function of the scene
        alone, so a multi-device N-scene batch (``tools/test.py
        --n-devices``) bit-matches N sequential single-scene runs.
        """
        b, v, h, w, c = feats.shape
        proj = projections.at[..., :2, :].divide(self.backbone2d_stride)
        tsdf = jax.lax.stop_gradient(tsdf004)
        origin = jnp.asarray(self.origin, jnp.float32)

        use_skip = (self.ray_marching_type == "neus"
                    and self.ray_skip_factor > 0
                    and self.ray_samples > self.ray_skip_window
                    and all(dim % self.ray_skip_factor == 0
                            for dim in self.voxel_dim))
        march = (partial(ray_march_neus,
                         weight_threshold=self.neus_threshold,
                         skip_factor=self.ray_skip_factor,
                         skip_window=self.ray_skip_window,
                         coarse_step=self.ray_skip_coarse_step)
                 if self.ray_marching_type == "neus"
                 else partial(ray_march_depth,
                              depth_points=self.depth_points))

        def scene(proj_b, tsdf_b, valid_b, rng_b):
            occ = (build_occupancy(tsdf_b, self.ray_skip_factor)
                   if use_skip else None)

            def make_per_view(tsdf_r, occ_r, valid_r):
                def per_view(pv):
                    p, idx = pv
                    extra = {"occupancy": occ_r} if use_skip else {}
                    pts = march(p, tsdf_r, self.voxel_dim,
                                self.voxel_size, origin, h, w,
                                view_index=idx,
                                n_samples=self.ray_samples,
                                capacity=self.rays_per_view_cap, **extra)
                    ok = valid_r[jnp.minimum(idx, v - 1)] & (idx < v)
                    keep_w = jnp.where(ok, pts.weight, 0.0)
                    return RayMarchPoints(pts.xyz, keep_w, pts.uv,
                                          pts.view)
                return per_view

            if self.view_mesh is not None:
                # view-parallel marching (SURVEY.md §5): each device
                # marches its view shard against the REPLICATED TSDF;
                # the downstream mean/subsample run on the re-combined
                # buffers.  Views pad to the shard count with dead rows.
                from jax.sharding import PartitionSpec as P
                n = self.view_mesh.shape["view"]
                vp = v + ((-v) % n)
                proj_v = (jnp.concatenate(
                    [proj_b, jnp.repeat(proj_b[:1], vp - v, axis=0)])
                    if vp != v else proj_b)

                def march_shard(proj_s, ids_s, tsdf_r, valid_r, *occ_opt):
                    pv = make_per_view(tsdf_r,
                                       occ_opt[0] if occ_opt else None,
                                       valid_r)
                    return jax.lax.map(pv, (proj_s, ids_s))

                operands = [proj_v, jnp.arange(vp), tsdf_b, valid_b]
                in_specs = [P("view"), P("view"), P(), P()]
                if use_skip:
                    operands.append(occ)
                    in_specs.append(P())
                per = jax.shard_map(
                    march_shard, mesh=self.view_mesh,
                    in_specs=tuple(in_specs), out_specs=P("view"),
                    check_vma=False)(*operands)
                n_flat = vp * self.rays_per_view_cap
            else:
                per = jax.lax.map(
                    make_per_view(tsdf_b, occ, valid_b),
                    (proj_b, jnp.arange(v)))                  # [V, K, ...]
                n_flat = v * self.rays_per_view_cap
            flat = jax.tree_util.tree_map(
                lambda a: a.reshape((n_flat,) + a.shape[2:]), per)
            return _normalize_subsample(flat, rng_b, self.max_points)

        rngs = (jax.vmap(lambda s: jax.random.fold_in(rng, s))(scene_seed)
                if scene_seed is not None else jax.random.split(rng, b))
        xyz, wts, uv, view, valid = batch_map(
            scene, proj, tsdf, view_valid, rngs)

        # gather pixel features for surviving points only
        pf = batch_map(_gather_point_feats, feats, uv, view, valid)
        pf = pf * wts[..., None]
        return RayPoints(xyz=xyz, feats=pf, valid=valid)

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool
                 ) -> Dict[str, Any]:
        """Runs the full pipeline.  Returns dict with ``losses`` plus
        (always) ``tsdf`` outputs and, when detection is on and not
        training, raw ``bboxes``/``scores``/``bbox_valid``."""
        imgs = batch["imgs"]
        projections = batch["projection"]
        view_valid = batch.get(
            "view_valid",
            jnp.ones(imgs.shape[:2], bool))
        targets = batch.get("tsdf_list")

        feats = self.extract_2d(imgs, train=train)
        volume, _ = self.build_volume(feats, projections, view_valid)
        tsdf_out, recon_losses = self.reconstruct(volume, targets, train)

        losses = {k: v * self.loss_weight_recon
                  for k, v in recon_losses.items()}
        out: Dict[str, Any] = {"tsdf": tsdf_out}

        if not self.detection:
            out["losses"] = losses
            return out

        rng = (self.make_rng("sample")
               if self.has_rng("sample") else jax.random.PRNGKey(0))
        pts = self.ray_march(feats, projections, view_valid,
                             tsdf_out[f"scene_tsdf_{self.tsdf_head.keys[-1]}"],
                             batch["offset"], rng,
                             scene_seed=batch.get("scene_seed"))
        # move to world/detection frame (reference switch_pointcloud:364)
        xyz = pts.xyz + batch["offset"][:, None, :]

        gt_boxes = batch.get("gt_boxes")
        gt_labels = batch.get("gt_labels")
        gt_valid = batch.get("gt_valid")
        if train and self.use_feature_transform:
            aug_rng = (self.make_rng("aug")
                       if self.has_rng("aug") else jax.random.PRNGKey(1))
            ft_cfg = dict(self.feature_transform or {})
            xyz, gt_boxes = batch_map(
                lambda r, p, bx: feature_transform_aug(
                    r, p, bx, self.with_yaw, **ft_cfg),
                jax.random.split(aug_rng, xyz.shape[0]), xyz, gt_boxes)

        level_outs = self.detector(xyz, pts.feats, pts.valid, train=train)
        out["points"] = RayPoints(xyz=xyz, feats=pts.feats,
                                  valid=pts.valid)

        if gt_boxes is not None:
            det_losses = self.detector.loss(level_outs, gt_boxes,
                                            gt_labels, gt_valid,
                                            axis_name=self.pmean_axis)
            for k, v in det_losses.items():
                losses[k] = v * self.loss_weight_detection
        if not train:
            bboxes, scores, bvalid = self.detector.get_bboxes(level_outs)
            out.update(bboxes=bboxes, scores=scores, bbox_valid=bvalid)
        out["losses"] = losses
        return out

    # ------------------------------------------------------------------
    def forward_view_sharded(self, batch: Dict[str, jnp.ndarray],
                             view_axis: str = "view") -> Dict[str, Any]:
        """Train-mode forward of ONE scene split across a ``view`` mesh
        axis — the intra-scene sharding that makes the reference's
        stage-3 finetune workload (192x192x80 / 40 views per scene,
        ``ray_marching_scannet.py:12-19,77``) fit devices it cannot fit
        alone (doc/performance.md "Training throughput").

        Runs as the per-device body of a ``('data', 'view')`` shard_map
        (``train/loop.py:make_train_step(view_axis=...)``).  Sharding
        layout, stage by stage:

        * 2D tower: each device runs its ``V/n`` view shard; BatchNorm
          statistics sync with pmean (``shard_ctx.bn_sync_axis``) so they
          equal the reference's joint-view BN (``ray_marching.py:419-426``);
        * volume: per-shard partial (volume, count) sums + one ``psum``
          — the commutative-accumulator view parallelism of SURVEY §5;
        * 3D U-Net + TSDF head: X-axis slab per device with 1-voxel halo
          exchanges per conv (``shard_ctx.halo_axis``); the three TSDF
          scales re-assemble with tiled ``all_gather``;
        * ray marching: each device marches its own views against the
          (replicated) predicted TSDF; the fixed-capacity per-view
          buffers re-assemble with ``all_gather``;
        * subsample + augmentation + sparse detection: replicated — every
          device of the view row computes them identically (same rng).

        Losses come back as GLOBAL values, identical on every device of
        the view row.  Gradients: values crossing the sharded ->
        replicated boundary (the gathered TSDFs, ray buffers and feature
        maps) are wrapped with ``shard_ctx.scale_grad(1/n)`` so the
        collective transposes — which SUM the n identical replicated-
        tail cotangents — deliver exactly the true cotangent upstream;
        sharded-module gradients then come back as TRUE per-device
        partials (assembled with ``psum`` over ``view_axis``) while the
        replicated detector computes the full gradient on every device
        (assembled with ``pmean``) — see ``train/loop.py:reduce_view``
        and the exactness test
        ``tests/test_view_sharded.py:TestBoundaryGradParity``.

        Constraints (checked): local batch 1; ``V % n == 0`` (BN-exact
        shards); ``X % n == 0`` and ``(X/n) % 8 == 0`` (slab starts stay
        even through the three stride-2 levels).
        """
        n = jax.lax.axis_size(view_axis)
        vix = jax.lax.axis_index(view_axis)
        imgs = batch["imgs"]
        projections = batch["projection"]
        view_valid = batch.get("view_valid",
                               jnp.ones(imgs.shape[:2], bool))
        targets = batch.get("tsdf_list")
        b, V = imgs.shape[:2]
        X, Y, Z = self.voxel_dim
        if b != 1:
            raise ValueError("forward_view_sharded: per-device batch "
                             f"must be 1 scene, got {b}")
        if V % n:
            raise ValueError(f"views ({V}) must divide the view axis "
                             f"({n}) for joint-BN-exact sharding")
        if X % n or (X // n) % 8:
            raise ValueError(f"voxel X dim {X} must split into {n} slabs "
                             "divisible by 8 (three stride-2 levels)")
        from cnrma_tpu.models.tsdf_head import tsdf_losses
        from cnrma_tpu.ops.backproject import (
            _normalize_volume, accumulate_views_partial)
        from cnrma_tpu.utils.shard_ctx import (
            bn_sync_axis, halo_axis, scale_grad)

        # ---- 2D tower on this device's view shard --------------------
        vs = V // n
        sl = vix * vs
        imgs_s = jax.lax.dynamic_slice_in_dim(imgs, sl, vs, axis=1)
        proj_s = jax.lax.dynamic_slice_in_dim(projections, sl, vs, axis=1)
        vv_s = jax.lax.dynamic_slice_in_dim(view_valid, sl, vs, axis=1)
        with bn_sync_axis(view_axis):
            feats_s = self.extract_2d(imgs_s, train=True)  # [1,vs,h,w,C]
        h, w, c = feats_s.shape[2:]

        # ---- volume: partial accumulate + psum -----------------------
        origin = jnp.asarray(self.origin, jnp.float32)
        proj_sc = proj_s.at[..., :2, :].divide(self.backbone2d_stride)
        tile, tile_cap, rect, rect_cap = self._bp_knobs((h, w, c))
        vol_p, cnt_p = accumulate_views_partial(
            proj_sc[0], feats_s[0], vv_s[0], self.voxel_dim,
            self.voxel_size, origin,
            accum_dtype=jnp.dtype(self.bp_accum_dtype),
            tile=tile, tile_capacity=tile_cap,
            rect=rect, rect_capacity=rect_cap)
        vol_sum = jax.lax.psum(vol_p, view_axis)
        cnt = jax.lax.psum(cnt_p, view_axis)
        volume, _ = _normalize_volume(vol_sum, cnt, feats_s.dtype)
        volume = volume[None]                        # [1, X, Y, Z, C]

        # ---- U-Net + TSDF head on this device's X slab ---------------
        xs_slab = X // n
        slab = jax.lax.dynamic_slice_in_dim(volume, vix * xs_slab,
                                            xs_slab, axis=1)
        with bn_sync_axis(view_axis), halo_axis(view_axis):
            feats3d = self.backbone3d(slab, train=True)
            tsdf_slab, _ = self.tsdf_head(feats3d, None)
        # Gathered values consumed by computation REPLICATED across the
        # view axis carry a 1/n gradient scale: the collective transposes
        # sum the n identical replicated-tail cotangents, and the scale
        # makes that sum exactly the true cotangent (see
        # shard_ctx.scale_grad).  Sharded-module grads then assemble
        # with psum over the view axis, the replicated detector's with
        # pmean (train/loop.py).
        inv_n = 1.0 / n
        tsdf_out = {k: scale_grad(
            jax.lax.all_gather(t, view_axis, axis=1, tiled=True), inv_n)
            for k, t in tsdf_slab.items()}
        losses: Dict[str, jnp.ndarray] = {}
        if targets is not None:
            recon = tsdf_losses(tsdf_out, targets, self.tsdf_head.keys,
                                self.tsdf_head.sparse_threshold)
            losses = {k: val * self.loss_weight_recon
                      for k, val in recon.items()}
        out: Dict[str, Any] = {"tsdf": tsdf_out}
        if not self.detection:
            out["losses"] = losses
            return out

        # ---- ray march this device's views ---------------------------
        rng = (self.make_rng("sample")
               if self.has_rng("sample") else jax.random.PRNGKey(0))
        scene_seed = batch.get("scene_seed")
        rng_b = (jax.random.fold_in(rng, scene_seed[0])
                 if scene_seed is not None
                 else jax.random.split(rng, 1)[0])
        fine_key = f"scene_tsdf_{self.tsdf_head.keys[-1]}"
        tsdf_fine = jax.lax.stop_gradient(tsdf_out[fine_key][0])
        use_skip = (self.ray_marching_type == "neus"
                    and self.ray_skip_factor > 0
                    and self.ray_samples > self.ray_skip_window
                    and all(dim % self.ray_skip_factor == 0
                            for dim in self.voxel_dim))
        occ = (build_occupancy(tsdf_fine, self.ray_skip_factor)
               if use_skip else None)
        march = (partial(ray_march_neus,
                         weight_threshold=self.neus_threshold,
                         skip_factor=self.ray_skip_factor,
                         skip_window=self.ray_skip_window,
                         coarse_step=self.ray_skip_coarse_step)
                 if self.ray_marching_type == "neus"
                 else partial(ray_march_depth,
                              depth_points=self.depth_points))

        def per_view(pv):
            p, idx = pv
            extra = {"occupancy": occ} if use_skip else {}
            pts = march(p, tsdf_fine, self.voxel_dim, self.voxel_size,
                        origin, h, w, view_index=idx,
                        n_samples=self.ray_samples,
                        capacity=self.rays_per_view_cap, **extra)
            ok = view_valid[0, jnp.minimum(idx, V - 1)] & (idx < V)
            return RayMarchPoints(pts.xyz,
                                  jnp.where(ok, pts.weight, 0.0),
                                  pts.uv, pts.view)

        per = jax.lax.map(per_view,
                          (proj_sc[0], sl + jnp.arange(vs)))  # [vs,K,..]
        per = scale_grad(jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, view_axis, axis=0,
                                         tiled=True), per), inv_n)
        n_flat = V * self.rays_per_view_cap
        flat = jax.tree_util.tree_map(
            lambda a: a.reshape((n_flat,) + a.shape[2:]), per)

        # ---- replicated tail: subsample, aug, detection --------------
        xyz, wts, uv, view, valid = _normalize_subsample(
            flat, rng_b, self.max_points)
        feats_all = scale_grad(
            jax.lax.all_gather(feats_s, view_axis, axis=1, tiled=True),
            inv_n)                                            # [1,V,...]
        pf = _gather_point_feats(feats_all[0], uv, view, valid)
        pf = (pf * wts[:, None])[None]
        xyz = xyz[None] + batch["offset"][:, None, :]
        valid = valid[None]

        gt_boxes = batch.get("gt_boxes")
        gt_labels = batch.get("gt_labels")
        gt_valid = batch.get("gt_valid")
        if self.use_feature_transform:
            aug_rng = (self.make_rng("aug")
                       if self.has_rng("aug") else jax.random.PRNGKey(1))
            ft_cfg = dict(self.feature_transform or {})
            xyz1, gtb1 = feature_transform_aug(
                jax.random.split(aug_rng, 1)[0], xyz[0], gt_boxes[0],
                self.with_yaw, **ft_cfg)
            xyz, gt_boxes = xyz1[None], gtb1[None]

        level_outs = self.detector(xyz, pf, valid, train=True)
        out["points"] = RayPoints(xyz=xyz, feats=pf, valid=valid)
        if gt_boxes is not None:
            det_losses = self.detector.loss(level_outs, gt_boxes,
                                            gt_labels, gt_valid,
                                            axis_name=self.pmean_axis)
            for k, val in det_losses.items():
                losses[k] = val * self.loss_weight_detection
        out["losses"] = losses
        return out


class Atlas(CNRMA):
    """Recon-only model for stage-1 pretraining (reference
    ``models/atlas.py``): identical 2D tower / volume / U-Net / TSDF head,
    no detection branch — parameters transfer 1:1 into CNRMA."""
    detection: bool = False
