"""Standalone FCAF3D detector for stage-2 pretraining on dumped points.

In-framework replacement for the external fcaf3d repo stage
(``doc/train_val.md:75-93``, reference ``fcaf3d/fcaf3d_middle_*.py``
training ``SingleStageSparse3DDetector`` on 35-dim points): the same
``FCAF3DDetector`` submodule as CNRMA (parameters transfer 1:1 via
``tools/combine_models.py``) with the point-cloud augmentation applied
in-model.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cnrma_tpu.models.cn_rma import feature_transform_aug
from cnrma_tpu.models.fcaf3d import DetectionCapacities, FCAF3DDetector
from cnrma_tpu.utils.batching import batch_map


class FCAF3DOnly(nn.Module):
    n_classes: int = 18
    n_reg_outs: int = 6
    with_yaw: bool = False
    voxel_size: float = 0.01
    pts_threshold: int = 200000
    assigner_limit: int = 27
    assigner_topk: int = 18
    nms_pre: int = 1000
    capacities: DetectionCapacities = DetectionCapacities()
    use_feature_transform: bool = True
    feature_transform: Optional[Dict[str, Any]] = None
    # mesh axis for cross-device loss reductions (see CNRMA.pmean_axis)
    pmean_axis: Optional[str] = None

    def setup(self):
        # same submodule name as CNRMA so params transfer between stages
        self.detector = FCAF3DDetector(
            n_classes=self.n_classes, n_reg_outs=self.n_reg_outs,
            voxel_size=self.voxel_size,
            pts_threshold=self.pts_threshold,
            assigner_limit=self.assigner_limit,
            assigner_topk=self.assigner_topk, with_yaw=self.with_yaw,
            nms_pre=self.nms_pre, capacities=self.capacities)

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool
                 ) -> Dict[str, Any]:
        pts = batch["points"]
        feats = batch["point_feats"]
        valid = batch["point_valid"]
        gt_boxes = batch.get("gt_boxes")
        gt_labels = batch.get("gt_labels")
        gt_valid = batch.get("gt_valid")

        if train and self.use_feature_transform and gt_boxes is not None:
            rng = (self.make_rng("aug") if self.has_rng("aug")
                   else jax.random.PRNGKey(0))
            cfg = dict(self.feature_transform or {})
            pts, gt_boxes = batch_map(
                lambda r, p, bx: feature_transform_aug(
                    r, p, bx, self.with_yaw, **cfg),
                jax.random.split(rng, pts.shape[0]), pts, gt_boxes)

        level_outs = self.detector(pts, feats, valid, train=train)
        out: Dict[str, Any] = {}
        losses = {}
        if gt_boxes is not None:
            losses = self.detector.loss(level_outs, gt_boxes, gt_labels,
                                        gt_valid,
                                        axis_name=self.pmean_axis)
        out["losses"] = losses
        if not train:
            bboxes, scores, bvalid = self.detector.get_bboxes(level_outs)
            out.update(bboxes=bboxes, scores=scores, bbox_valid=bvalid)
        return out
