"""Detection losses in pure JAX.

Replaces the mmcv CUDA ``SigmoidFocalLoss``, mmdet ``CrossEntropyLoss``
(sigmoid) and the fcaf3d fork's ``IoU3DLoss`` + Rotated_IoU CUDA op
(reference ``fcaf3d_head.py:35-45,141-214``).  All losses are masked,
fixed-shape reductions with explicit ``avg_factor`` denominators so they
match the reference's averaging under padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cnrma_tpu.ops.iou3d import aligned_iou_3d, rotated_iou_3d


def sigmoid_focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       valid: jnp.ndarray, avg_factor: jnp.ndarray,
                       gamma: float = 2.0, alpha: float = 0.25,
                       loss_weight: float = 1.0) -> jnp.ndarray:
    """Multi-class sigmoid focal loss.

    Args:
        logits: [N, C] class logits.
        labels: [N] int; class index in [0, C) for positives, -1 background.
        valid: [N] bool — padded rows contribute nothing.
        avg_factor: denominator (number of positives, >= 1).
    """
    n, c = logits.shape
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, c - 1), c,
                            dtype=jnp.float32)
    onehot = jnp.where((labels >= 0)[:, None], onehot, 0.0)
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    ce = (-onehot * jax.nn.log_sigmoid(logits)
          - (1 - onehot) * jax.nn.log_sigmoid(-logits))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    loss = alpha_t * ((1 - p_t) ** gamma) * ce
    loss = jnp.where(valid[:, None], loss, 0.0)
    return loss_weight * jnp.sum(loss) / avg_factor


def bce_loss(logits: jnp.ndarray, targets: jnp.ndarray,
             valid: jnp.ndarray, avg_factor: jnp.ndarray,
             loss_weight: float = 1.0) -> jnp.ndarray:
    """Binary cross entropy with logits (mmdet CrossEntropyLoss
    use_sigmoid=True) — used for centerness."""
    ce = (-targets * jax.nn.log_sigmoid(logits)
          - (1 - targets) * jax.nn.log_sigmoid(-logits))
    ce = jnp.where(valid, ce, 0.0)
    return loss_weight * jnp.sum(ce) / avg_factor


def iou3d_loss(pred_boxes: jnp.ndarray, target_boxes: jnp.ndarray,
               weight: jnp.ndarray, valid: jnp.ndarray,
               avg_factor: jnp.ndarray, with_yaw: bool,
               loss_weight: float = 1.0) -> jnp.ndarray:
    """1 − IoU3D regression loss, weighted by centerness targets
    (fcaf3d ``IoU3DLoss``; axis-aligned for ScanNet, rotated for ARKit).

    Boxes are (cx, cy, cz, dx, dy, dz[, yaw]) with gravity-center z.
    """
    if with_yaw:
        # Substitute INVALID rows (padding / background: degenerate
        # zero-size boxes from zero-feature slots) with a unit box
        # before the polygon clip: the rotated-IoU backward hits
        # inf * 0-cotangent NaNs on degenerate geometry even though the
        # mask below discards those rows' values.  Valid rows are
        # untouched.
        unit = jnp.asarray([0., 0., 0., 1., 1., 1., 0.], jnp.float32)
        pred_s = jnp.where(valid[:, None], pred_boxes, unit)
        targ_s = jnp.where(valid[:, None], target_boxes, unit)
        iou = rotated_iou_3d(pred_s, targ_s)
    else:
        iou = aligned_iou_3d(pred_boxes, target_boxes)
    loss = (1.0 - iou) * weight
    loss = jnp.where(valid, loss, 0.0)
    return loss_weight * jnp.sum(loss) / avg_factor


def log_transform(x: jnp.ndarray, shift: float = 1.0) -> jnp.ndarray:
    """TSDF log rescaling (reference ``atlas_head.py:83-86``)."""
    return jnp.sign(x) * jnp.log1p(jnp.abs(x) / shift)
