"""Hand-computed oracle fixtures for the mAP scorer.

The reference relies on mmdet3d's ``indoor_eval``
(``post_process/evaluate_bbox.py:93-100``), which follows the original
VOC/votenet scorer: global score sort per class, greedy match to the
highest-IoU unmatched GT in the prediction's own scene, STRICT ``>`` at
the threshold, 'area' AP interpolation.  These fixtures pin our
re-implementation (``cnrma_tpu/eval/indoor_eval.py``) to hand-computed
AP values covering the tricky paths the perfect-prediction self-test
(tests/test_tools_contract.py) never exercises: duplicate detections,
FP-between-TPs precision dips, exact-threshold IoU, multi-scene score
interleaving, and class bookkeeping (GT-only and pred-only classes).
"""

import numpy as np
import pytest

from cnrma_tpu.eval.indoor_eval import _average_precision, indoor_eval


def box(x, y, z, dx=1.0, dy=1.0, dz=1.0):
    """bottom-z box helper (DepthInstance3DBoxes storage layout)."""
    return [x, y, z, dx, dy, dz]


def scene(gt_boxes, gt_labels):
    return {"gt_boxes": np.asarray(gt_boxes, np.float32).reshape(-1, 6),
            "labels": np.asarray(gt_labels, np.int64)}


def preds(boxes, scores, labels):
    return {"boxes": np.asarray(boxes, np.float32).reshape(-1, 6),
            "scores": np.asarray(scores, np.float32),
            "labels": np.asarray(labels, np.int64)}


class TestAveragePrecision:
    def test_perfect(self):
        assert _average_precision(np.array([1.0]), np.array([1.0])) == 1.0

    def test_area_interpolation_hand_computed(self):
        # recall [.5, .5, 1], precision [1, .5, 2/3]:
        # monotone mpre from the right = [1, 1, 2/3, 2/3, 0] over
        # mrec [0, .5, .5, 1, 1] -> AP = .5*1 + .5*(2/3) = 5/6
        ap = _average_precision(np.array([0.5, 0.5, 1.0]),
                                np.array([1.0, 0.5, 2.0 / 3.0]))
        np.testing.assert_allclose(ap, 5.0 / 6.0, rtol=1e-9)

    def test_empty_is_zero(self):
        assert _average_precision(np.zeros(0), np.zeros(0)) == 0.0


class TestIndoorEvalFixtures:
    def test_duplicate_detection_is_fp(self):
        # one GT, two overlapping predictions: the higher-scored one
        # matches, the duplicate is a FP -> AP still 1.0 (recall hits 1
        # at precision 1 before the duplicate arrives)
        g = [scene([box(0, 0, 0)], [0])]
        r = [preds([box(0, 0, 0), box(0.05, 0, 0)], [0.9, 0.8], [0, 0])]
        m = indoor_eval(g, r, iou_thrs=(0.25,), logger=None)
        np.testing.assert_allclose(m["mAP_0.25"], 1.0)
        np.testing.assert_allclose(m["mAR_0.25"], 1.0)

    def test_fp_between_tps_hand_computed(self):
        # 2 GT; preds: TP(.9), pure FP(.8), TP(.7)
        # tp=[1,0,1] -> recall [.5,.5,1], precision [1,.5,2/3], AP=5/6
        g = [scene([box(0, 0, 0), box(5, 5, 0)], [0, 0])]
        r = [preds([box(0, 0, 0), box(10, 10, 0), box(5, 5, 0)],
                   [0.9, 0.8, 0.7], [0, 0, 0])]
        m = indoor_eval(g, r, iou_thrs=(0.25,), logger=None)
        np.testing.assert_allclose(m["mAP_0.25"], 5.0 / 6.0, rtol=1e-6)

    def test_exact_threshold_iou_is_fp(self):
        # prediction shifted so that IoU == exactly 0.5:
        # unit cubes offset by 1/3 in x -> inter = 2/3, union = 4/3
        g = [scene([box(0, 0, 0)], [0])]
        r = [preds([box(1.0 / 3.0, 0, 0)], [0.9], [0])]
        m = indoor_eval(g, r, iou_thrs=(0.25, 0.5), logger=None)
        # IoU 0.5 > 0.25 -> TP at the low threshold...
        np.testing.assert_allclose(m["mAP_0.25"], 1.0)
        # ...but NOT > 0.5 -> FP at the high one (strict VOC semantics)
        np.testing.assert_allclose(m["mAP_0.50"], 0.0)

    def test_multi_scene_global_score_sort(self):
        # class 0 in two scenes; the cross-scene score order decides the
        # precision curve: scene B's FP (.85) lands between scene A's TP
        # (.9) and scene B's TP (.8).
        # tp=[1,0,1], 2 GT total -> AP = 5/6 (same curve as above, but
        # only if the sort is GLOBAL across scenes)
        g = [scene([box(0, 0, 0)], [0]), scene([box(5, 5, 0)], [0])]
        r = [preds([box(0, 0, 0)], [0.9], [0]),
             preds([box(20, 20, 0), box(5, 5, 0)], [0.85, 0.8], [0, 0])]
        m = indoor_eval(g, r, iou_thrs=(0.25,), logger=None)
        np.testing.assert_allclose(m["mAP_0.25"], 5.0 / 6.0, rtol=1e-6)

    def test_match_is_scene_local(self):
        # a prediction may only match GT in ITS OWN scene: scene 1's
        # pred overlaps scene 0's GT coordinates but must be a FP
        g = [scene([box(0, 0, 0)], [0]), scene([box(5, 5, 0)], [0])]
        r = [preds(np.zeros((0, 6)), [], []),
             preds([box(0, 0, 0)], [0.9], [0])]
        m = indoor_eval(g, r, iou_thrs=(0.25,), logger=None)
        np.testing.assert_allclose(m["mAP_0.25"], 0.0)

    def test_greedy_takes_best_iou_gt(self):
        # one pred overlapping two GTs: matches the HIGHER-IoU one; the
        # other GT stays unmatched -> recall 0.5
        g = [scene([box(0, 0, 0), box(0.8, 0, 0)], [0, 0])]
        r = [preds([box(0.1, 0, 0)], [0.9], [0])]
        m = indoor_eval(g, r, iou_thrs=(0.25,), logger=None)
        np.testing.assert_allclose(m["mAR_0.25"], 0.5)

    def test_class_bookkeeping(self):
        # class 0: GT + perfect pred; class 1: GT only (AP 0, counts in
        # mAP); class 2: PRED only (no GT -> excluded entirely, like
        # mmdet3d which iterates GT classes)
        g = [scene([box(0, 0, 0), box(5, 5, 0)], [0, 1])]
        r = [preds([box(0, 0, 0), box(9, 9, 0)], [0.9, 0.9], [0, 2])]
        m = indoor_eval(g, r, iou_thrs=(0.25,),
                        label2cat={0: "a", 1: "b", 2: "c"}, logger=None)
        np.testing.assert_allclose(m["a_AP_0.25"], 1.0)
        np.testing.assert_allclose(m["b_AP_0.25"], 0.0)
        assert "c_AP_0.25" not in m
        np.testing.assert_allclose(m["mAP_0.25"], 0.5)

    def test_duplicate_before_other_tp_hand_computed(self):
        # order: TP(.9) on GT1, DUPLICATE(.85) on GT1 (FP), TP(.8) on
        # GT2 -> identical curve to fp-between-tps: AP = 5/6.  Pins the
        # "already matched GT -> FP" rule at the right rank.
        g = [scene([box(0, 0, 0), box(5, 5, 0)], [0, 0])]
        r = [preds([box(0, 0, 0), box(0.02, 0, 0), box(5, 5, 0)],
                   [0.9, 0.85, 0.8], [0, 0, 0])]
        m = indoor_eval(g, r, iou_thrs=(0.25,), logger=None)
        np.testing.assert_allclose(m["mAP_0.25"], 5.0 / 6.0, rtol=1e-6)
