#!/usr/bin/env python
"""Offline per-class 3D NMS over raw bbox dumps.

Same CLI and file contract as the reference ``post_process/nms_bbox.py``:
reads ``{result_path}/{scene}/{scene}_bbox_raw.npz`` (bboxes gravity-z +
[N, n_classes] scores), per-class NMS at score_thr 0.01 / iou_thr 0.5,
writes ``{scene}{postfix}`` with {boxes (gravity-z), scores, labels} —
ready for ``evaluate_bbox.py``.  Runs the deterministic JAX NMS (no flaky
CUDA kernel to re-run).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--result_path", required=True)
    p.add_argument("--postfix", default="_atlas_bbox.npz")
    p.add_argument("--score_thr", type=float, default=0.01)
    p.add_argument("--iou_thr", type=float, default=0.5)
    args = p.parse_args()

    from cnrma_tpu.ops.nms import multiclass_nms_np

    scene_ids = sorted(os.listdir(args.result_path))
    for scene in scene_ids:
        raw = os.path.join(args.result_path, scene,
                           scene + "_bbox_raw.npz")
        if not os.path.isfile(raw):
            continue
        data = np.load(raw)
        boxes, scores, labels = multiclass_nms_np(
            data["bboxes"], data["scores"], score_thr=args.score_thr,
            iou_thr=args.iou_thr)
        # contract: stored boxes use gravity-center z.  The raw dump and
        # multiclass_nms_np already carry gravity-center z, so the boxes
        # pass through unchanged — the reference's +dz/2 (nms_bbox.py:63)
        # only undoes the bottom-z conversion its DepthInstance3DBoxes
        # (origin=(.5,.5,.5)) container performed, which we never do.
        np.savez(os.path.join(args.result_path, scene,
                              scene + args.postfix),
                 boxes=boxes, scores=scores, labels=labels)
        print("Saved", scene, f"({len(boxes)} boxes)")


if __name__ == "__main__":
    main()
