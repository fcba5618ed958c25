"""On-device 3D NMS (replaces the pcdet CUDA NMS kernels).

The reference runs NMS offline with ``pcdet_nms_gpu`` (rotated BEV) /
``pcdet_nms_normal_gpu`` (axis-aligned BEV) — flaky CUDA kernels the README
tells users to re-run (``README.md:68-70``, ``post_process/nms_bbox.py``).
Here it is a deterministic greedy suppression over a precomputed BEV IoU
matrix under ``lax.fori_loop`` — fixed shapes, jittable, no flakiness.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cnrma_tpu.ops.iou3d import iou_bev_matrix


@partial(jax.jit, static_argnames=("rotated",))
def nms_bev(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thr: float,
            rotated: bool) -> jnp.ndarray:
    """Greedy BEV NMS.

    Args:
        boxes: [N, 7] (cx, cy, cz, dx, dy, dz, yaw) gravity-center boxes.
        scores: [N]; entries with score <= -inf/NaN-free sentinel are skipped
            by passing score = -1.
        iou_thr: suppression threshold.
        rotated: use rotated rectangle overlap (yaw) vs axis-aligned.

    Returns:
        keep: [N] bool mask of surviving boxes.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = jnp.take(boxes, order, axis=0)
    s = jnp.take(scores, order)
    iou = iou_bev_matrix(b, b, rotated=rotated)

    def body(i, keep):
        alive = keep[i] & (s[i] > -jnp.inf)
        suppress = (iou[i] > iou_thr) & (jnp.arange(n) > i) & alive
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, n, body,
                                    jnp.ones((n,), jnp.bool_)) & (s > -jnp.inf)
    keep = jnp.zeros((n,), jnp.bool_).at[order].set(keep_sorted)
    return keep


def multiclass_nms_np(bboxes: np.ndarray, scores: np.ndarray,
                      score_thr: float = 0.01, iou_thr: float = 0.5):
    """Per-class NMS over raw head outputs — numpy driver matching
    ``post_process/nms_bbox.py:nms`` (:17-58).

    Args:
        bboxes: [N, 6|7] gravity-center boxes (z = center), as stored in
            ``{scene}_bbox_raw.npz``.
        scores: [N, n_classes] (sigmoid cls x sigmoid centerness).

    Returns:
        (boxes [M, 6|7], scores [M], labels [M]) with **gravity-center z**
        — the reference's ``_atlas_bbox.npz`` convention (its save path
        stores bottom-z internally then re-adds dz/2, ``nms_bbox.py:63``;
        ``evaluate_bbox.py`` re-loads with origin=(.5,.5,.5)).
    """
    n_classes = scores.shape[1]
    yaw_flag = bboxes.shape[1] == 7
    if not yaw_flag:
        bboxes = np.concatenate(
            [bboxes, np.zeros((len(bboxes), 1), bboxes.dtype)], axis=1)
    out_b, out_s, out_l = [], [], []
    for cls in range(n_classes):
        ids = scores[:, cls] > score_thr
        if not ids.any():
            continue
        cb = bboxes[ids]
        cs = scores[ids, cls]
        # pad to a power-of-two bucket: nms_bev jits per static length, so
        # raw per-class counts would trigger a compile per unique N
        n_real = len(cb)
        n_pad = max(16, 1 << (n_real - 1).bit_length())
        cb_p = np.zeros((n_pad, cb.shape[1]), np.float32)
        cb_p[:n_real] = cb
        cs_p = np.full((n_pad,), -np.inf, np.float32)
        cs_p[:n_real] = cs
        keep = np.asarray(nms_bev(jnp.asarray(cb_p), jnp.asarray(cs_p),
                                  iou_thr, rotated=yaw_flag))[:n_real]
        out_b.append(cb[keep])
        out_s.append(cs[keep])
        out_l.append(np.full(int(keep.sum()), cls, np.int64))
    if out_b:
        boxes = np.concatenate(out_b)
        scs = np.concatenate(out_s)
        labels = np.concatenate(out_l)
    else:
        boxes = np.zeros((0, 7), np.float32)
        scs = np.zeros((0,), np.float32)
        labels = np.zeros((0,), np.int64)
    if not yaw_flag:
        boxes = boxes[:, :6]
    return boxes, scs, labels
