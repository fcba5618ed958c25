"""3D box IoU — axis-aligned and rotated — in pure JAX.

Replaces two CUDA dependencies of the reference:
* the Rotated_IoU ``cuda_op`` inside the fcaf3d fork's ``IoU3DLoss``
  (reference config ``ray_marching_scannet.py:197``, ``doc/install.md:38-47``)
* the BEV overlap computation of the pcdet NMS kernels
  (``fcaf3d_head.py:20``, ``post_process/nms_bbox.py:15``)

The rotated rectangle intersection is an exact Sutherland–Hodgman convex
clip with fixed-size (16-slot) vertex buffers — fully vectorizable with
``vmap`` and differentiable almost everywhere, so the same code backs the
training loss and evaluation.

Box format: (cx, cy, cz, dx, dy, dz[, yaw]) with **gravity-center** z.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAXV = 16


def rect_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 7] rotated boxes -> [..., 4, 2] BEV corners (ccw)."""
    cx, cy = boxes[..., 0], boxes[..., 1]
    dx, dy = boxes[..., 3], boxes[..., 4]
    yaw = boxes[..., 6] if boxes.shape[-1] > 6 else jnp.zeros_like(cx)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    hx, hy = dx / 2, dy / 2
    local = jnp.stack([
        jnp.stack([hx, hy], -1), jnp.stack([-hx, hy], -1),
        jnp.stack([-hx, -hy], -1), jnp.stack([hx, -hy], -1)], axis=-2)
    x = local[..., 0] * c[..., None] - local[..., 1] * s[..., None]
    y = local[..., 0] * s[..., None] + local[..., 1] * c[..., None]
    return jnp.stack([x + cx[..., None], y + cy[..., None]], axis=-1)


def _clip_polygon(verts: jnp.ndarray, count: jnp.ndarray,
                  p1: jnp.ndarray, p2: jnp.ndarray):
    """Clip a convex polygon by the half-plane left of directed edge p1->p2.

    verts: [V,2] fixed buffer, count: scalar number of valid verts.
    Returns new (verts, count).
    """
    v = _MAXV
    edge = p2 - p1
    rel = verts - p1[None, :]
    # signed area: >=0 keeps (left side for ccw clip polygon)
    side = edge[0] * rel[:, 1] - edge[1] * rel[:, 0]
    idx = jnp.arange(v)
    nxt = jnp.where(idx + 1 < count, idx + 1, 0)
    side_n = jnp.take(side, nxt)
    verts_n = jnp.take(verts, nxt, axis=0)

    inside = side >= 0
    inside_n = side_n >= 0
    cross = inside != inside_n
    denom = side - side_n
    t = side / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    inter = verts + t[:, None] * (verts_n - verts)

    active = idx < count
    emit_v = active & inside                 # emit current vertex
    emit_i = active & cross                  # emit intersection point
    n_emit = emit_v.astype(jnp.int32) + emit_i.astype(jnp.int32)
    pos = jnp.cumsum(n_emit) - n_emit        # exclusive cumsum
    out = jnp.zeros((v, 2), verts.dtype)
    slot_v = jnp.where(emit_v, pos, v)
    out = out.at[slot_v].set(verts, mode="drop")
    slot_i = jnp.where(emit_i, pos + emit_v.astype(jnp.int32), v)
    out = out.at[slot_i].set(inter, mode="drop")
    return out, jnp.sum(n_emit)


def _poly_area(verts: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    idx = jnp.arange(_MAXV)
    nxt = jnp.where(idx + 1 < count, idx + 1, 0)
    x, y = verts[:, 0], verts[:, 1]
    xn, yn = jnp.take(x, nxt), jnp.take(y, nxt)
    terms = jnp.where(idx < count, x * yn - xn * y, 0.0)
    return jnp.abs(jnp.sum(terms)) / 2


def rotated_rect_intersection_area(c1: jnp.ndarray, c2: jnp.ndarray
                                   ) -> jnp.ndarray:
    """Intersection area of two ccw rectangles given as [4,2] corners."""
    verts = jnp.zeros((_MAXV, 2), jnp.float32).at[:4].set(c1)
    count = jnp.int32(4)
    for e in range(4):
        p1 = c2[e]
        p2 = c2[(e + 1) % 4]
        verts, count = _clip_polygon(verts, count, p1, p2)
    return _poly_area(verts, count)


def _z_overlap(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    zmin1, zmax1 = b1[..., 2] - b1[..., 5] / 2, b1[..., 2] + b1[..., 5] / 2
    zmin2, zmax2 = b2[..., 2] - b2[..., 5] / 2, b2[..., 2] + b2[..., 5] / 2
    return jnp.clip(jnp.minimum(zmax1, zmax2) - jnp.maximum(zmin1, zmin2),
                    0.0, None)


def aligned_iou_3d(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise axis-aligned 3D IoU of [..., 6+] boxes (yaw ignored)."""
    inter = _z_overlap(b1, b2)
    for a in (0, 1):
        lo = jnp.maximum(b1[..., a] - b1[..., 3 + a] / 2,
                         b2[..., a] - b2[..., 3 + a] / 2)
        hi = jnp.minimum(b1[..., a] + b1[..., 3 + a] / 2,
                         b2[..., a] + b2[..., 3 + a] / 2)
        inter = inter * jnp.clip(hi - lo, 0.0, None)
    vol1 = b1[..., 3] * b1[..., 4] * b1[..., 5]
    vol2 = b2[..., 3] * b2[..., 4] * b2[..., 5]
    return inter / jnp.clip(vol1 + vol2 - inter, 1e-8, None)


def rotated_iou_3d(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise rotated 3D IoU of [N, 7] boxes (yaw around z)."""
    c1 = rect_corners_bev(b1)
    c2 = rect_corners_bev(b2)
    bev = jax.vmap(rotated_rect_intersection_area)(c1, c2)
    inter = bev * _z_overlap(b1, b2)
    vol1 = b1[..., 3] * b1[..., 4] * b1[..., 5]
    vol2 = b2[..., 3] * b2[..., 4] * b2[..., 5]
    return inter / jnp.clip(vol1 + vol2 - inter, 1e-8, None)


def iou_bev_matrix(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                   rotated: bool) -> jnp.ndarray:
    """[N, M] BEV IoU matrix — the overlap used by the pcdet NMS kernels
    (rotated for ``nms_gpu``, axis-aligned for ``nms_normal_gpu``)."""
    n, m = boxes1.shape[0], boxes2.shape[0]
    a1 = boxes1[..., 3] * boxes1[..., 4]
    a2 = boxes2[..., 3] * boxes2[..., 4]
    if rotated:
        c1 = rect_corners_bev(boxes1)
        c2 = rect_corners_bev(boxes2)
        inter = jax.vmap(lambda ca: jax.vmap(
            lambda cb: rotated_rect_intersection_area(ca, cb))(c2))(c1)
    else:
        lo_x = jnp.maximum(
            (boxes1[:, 0] - boxes1[:, 3] / 2)[:, None],
            (boxes2[:, 0] - boxes2[:, 3] / 2)[None, :])
        hi_x = jnp.minimum(
            (boxes1[:, 0] + boxes1[:, 3] / 2)[:, None],
            (boxes2[:, 0] + boxes2[:, 3] / 2)[None, :])
        lo_y = jnp.maximum(
            (boxes1[:, 1] - boxes1[:, 4] / 2)[:, None],
            (boxes2[:, 1] - boxes2[:, 4] / 2)[None, :])
        hi_y = jnp.minimum(
            (boxes1[:, 1] + boxes1[:, 4] / 2)[:, None],
            (boxes2[:, 1] + boxes2[:, 4] / 2)[None, :])
        inter = (jnp.clip(hi_x - lo_x, 0, None)
                 * jnp.clip(hi_y - lo_y, 0, None))
    return inter / jnp.clip(a1[:, None] + a2[None, :] - inter, 1e-8, None)


def iou_3d_matrix(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                  rotated: bool) -> jnp.ndarray:
    """[N, M] full 3D IoU matrix (for mAP evaluation)."""
    z = jax.vmap(lambda a: jax.vmap(lambda b: _z_overlap(a, b))(boxes2))(
        boxes1)
    if rotated:
        c1 = rect_corners_bev(boxes1)
        c2 = rect_corners_bev(boxes2)
        bev = jax.vmap(lambda ca: jax.vmap(
            lambda cb: rotated_rect_intersection_area(ca, cb))(c2))(c1)
    else:
        bev = jnp.ones_like(z)
        for a in (0, 1):
            lo = jnp.maximum(
                (boxes1[:, a] - boxes1[:, 3 + a] / 2)[:, None],
                (boxes2[:, a] - boxes2[:, 3 + a] / 2)[None, :])
            hi = jnp.minimum(
                (boxes1[:, a] + boxes1[:, 3 + a] / 2)[:, None],
                (boxes2[:, a] + boxes2[:, 3 + a] / 2)[None, :])
            bev = bev * jnp.clip(hi - lo, 0, None)
    inter = bev * z
    vol1 = boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5]
    vol2 = boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5]
    return inter / jnp.clip(vol1[:, None] + vol2[None, :] - inter, 1e-8,
                            None)
