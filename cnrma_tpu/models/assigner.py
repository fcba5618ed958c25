"""FCAF3D label assignment — static-shape JAX version.

Mirrors reference ``FCAF3DAssigner.assign`` (``models/fcaf3d_head.py:405-484``):
1. a point is a candidate for a gt box if it lies inside it (after
   yaw-derotation);
2. the box is assigned to the last pyramid scale with >= ``limit`` inside
   points (else the scale just below the first under-limit one);
3. only the ``topk`` highest-centerness points per box stay positive;
4. ties resolve to the minimum-volume box.

Padding: invalid points / boxes are excluded via masks; fully padded scenes
yield all-background labels.  Everything is fixed-shape [P, M] math.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

FLOAT_MAX = 1e8


def compute_centerness(dx_min, dx_max, dy_min, dy_max, dz_min, dz_max
                       ) -> jnp.ndarray:
    """sqrt of product of min/max face-distance ratios
    (reference ``compute_centerness``, ``fcaf3d_head.py:395-402``)."""
    eps = 1e-12
    r = (jnp.minimum(dx_min, dx_max) / jnp.maximum(jnp.maximum(dx_min, dx_max), eps)
         * jnp.minimum(dy_min, dy_max) / jnp.maximum(jnp.maximum(dy_min, dy_max), eps)
         * jnp.minimum(dz_min, dz_max) / jnp.maximum(jnp.maximum(dz_min, dz_max), eps))
    return jnp.sqrt(jnp.clip(r, 0.0, None))


class AssignResult(NamedTuple):
    centerness_targets: jnp.ndarray   # [P]
    bbox_targets: jnp.ndarray         # [P, 7] assigned gt (gravity center)
    labels: jnp.ndarray               # [P] int32, -1 = background


def fcaf3d_assign(points: jnp.ndarray,
                  scale_ids: jnp.ndarray,
                  point_valid: jnp.ndarray,
                  gt_boxes: jnp.ndarray,
                  gt_labels: jnp.ndarray,
                  gt_valid: jnp.ndarray,
                  n_scales: int,
                  limit: int,
                  topk: int) -> AssignResult:
    """Single-scene assignment.

    Args:
        points: [P, 3] point locations (all scales concatenated).
        scale_ids: [P] int32 pyramid scale of each point.
        point_valid: [P] bool.
        gt_boxes: [M, 7] (cx, cy, cz_gravity, dx, dy, dz, yaw).
        gt_labels: [M] int32.
        gt_valid: [M] bool.
    """
    p, m = points.shape[0], gt_boxes.shape[0]

    cx, cy, cz = gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 2]
    w, l, h = gt_boxes[:, 3], gt_boxes[:, 4], gt_boxes[:, 5]
    yaw = gt_boxes[:, 6]

    # local (de-rotated) offsets, [P, M].  The reference derotates with
    # mmdet3d-0.15 ``rotation_3d_in_axis(shift, -yaw, axis=2)``
    # (``fcaf3d_head.py:435``); that helper's einsum applies the TRANSPOSE
    # of the standard rotation matrix (i.e. rotates clockwise for +angle),
    # so with angle=-yaw the local frame is lx = c*ox - s*oy,
    # ly = s*ox + c*oy — the opposite sin sign from the textbook
    # world->box derotation.  We match the reference bit for bit
    # (verified by tools/detection_parity.py against the reference's own
    # torch assigner).
    ox = points[:, 0:1] - cx[None, :]
    oy = points[:, 1:2] - cy[None, :]
    oz = points[:, 2:3] - cz[None, :]
    c, s = jnp.cos(yaw)[None, :], jnp.sin(yaw)[None, :]
    lx = c * ox - s * oy
    ly = s * ox + c * oy

    dx_min = lx + w[None, :] / 2
    dx_max = w[None, :] / 2 - lx
    dy_min = ly + l[None, :] / 2
    dy_max = l[None, :] / 2 - ly
    dz_min = oz + h[None, :] / 2
    dz_max = h[None, :] / 2 - oz

    min_face = jnp.minimum(
        jnp.minimum(jnp.minimum(dx_min, dx_max),
                    jnp.minimum(dy_min, dy_max)),
        jnp.minimum(dz_min, dz_max))
    inside = ((min_face > 0) & point_valid[:, None] & gt_valid[None, :])

    # condition 2: best scale per box
    scale_onehot = jax.nn.one_hot(scale_ids, n_scales,
                                  dtype=jnp.float32)           # [P, S]
    n_pos_per_scale = jnp.einsum(
        "pm,ps->sm", inside.astype(jnp.float32), scale_onehot)  # [S, M]
    lower = n_pos_per_scale < limit
    lower_index = jnp.argmax(lower.astype(jnp.int32), axis=0) - 1
    lower_index = jnp.maximum(lower_index, 0)
    all_upper = jnp.all(~lower, axis=0)
    best_scale = jnp.where(all_upper, n_scales - 1, lower_index)  # [M]
    inside_best = best_scale[None, :] == scale_ids[:, None]

    # condition 3: topk centerness per box
    centerness = compute_centerness(dx_min, dx_max, dy_min, dy_max,
                                    dz_min, dz_max)
    centerness = jnp.where(inside & inside_best, centerness, -1.0)
    k = min(topk + 1, p)
    kth = jax.lax.top_k(centerness.T, k)[0][:, -1]             # [M]
    inside_top = centerness > kth[None, :]

    volumes = (w * l * h)[None, :] * jnp.ones((p, 1), jnp.float32)
    volumes = jnp.where(inside & inside_best & inside_top, volumes,
                        FLOAT_MAX)
    min_area = jnp.min(volumes, axis=1)                        # [P]
    min_inds = jnp.argmin(volumes, axis=1)                     # [P]

    labels = jnp.take(gt_labels, min_inds)
    labels = jnp.where(min_area >= FLOAT_MAX, -1, labels)
    labels = jnp.where(point_valid, labels, -1).astype(jnp.int32)

    gather = lambda a: jnp.take_along_axis(a, min_inds[:, None],
                                           axis=1)[:, 0]
    centerness_targets = compute_centerness(
        gather(dx_min), gather(dx_max), gather(dy_min), gather(dy_max),
        gather(dz_min), gather(dz_max))
    bbox_targets = jnp.take(gt_boxes, min_inds, axis=0)        # [P, 7]

    return AssignResult(
        centerness_targets=jax.lax.stop_gradient(centerness_targets),
        bbox_targets=jax.lax.stop_gradient(bbox_targets),
        labels=jax.lax.stop_gradient(labels))
