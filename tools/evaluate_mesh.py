#!/usr/bin/env python
"""Mesh reconstruction metrics over a results directory.

Same CLI and contract as the reference ``post_process/evaluate_mesh.py``:
compares ``{result_path}/{scene}/{scene}.ply`` predicted meshes with GT
meshes, writes per-scene ``metrics.json`` and prints the mean
(acc/comp distance, precision/recall/F-score @5 cm after 2 cm downsample).
GT lookup: ``{data_path}/scans/{scene}/{scene}_vh_clean_2.ply`` (ScanNet,
axis-aligned via the ``.txt`` meta) or ``{gt_path}/{scene}.ply``.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def read_axis_align_matrix(meta_file):
    if not os.path.exists(meta_file):
        return np.eye(4)
    for line in open(meta_file):
        if "axisAlignment" in line:
            vals = [float(x) for x in
                    line.rstrip().strip("axisAlignment = ").split(" ")]
            return np.array(vals).reshape(4, 4)
    return np.eye(4)


def find_gt_mesh(args, scene):
    cands = [
        os.path.join(args.gt_path or "", scene + ".ply"),
        os.path.join(args.data_path, "scans", scene,
                     scene + "_vh_clean_2.ply"),
    ]
    for c in cands:
        if c and os.path.isfile(c):
            return c
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="scannet")
    p.add_argument("--data_path", required=True)
    p.add_argument("--result_path", required=True)
    p.add_argument("--gt_path", default=None,
                   help="directory of GT meshes named {scene}.ply")
    p.add_argument("--axis_align", type=int, default=1)
    args = p.parse_args()

    from cnrma_tpu.eval.mesh_eval import eval_mesh_metrics
    from cnrma_tpu.utils.ply import read_ply

    keys = ["dist1", "dist2", "prec", "recal", "fscore"]
    all_metrics = {k: [] for k in keys}
    scenes = sorted(s for s in os.listdir(args.result_path)
                    if os.path.isfile(os.path.join(
                        args.result_path, s, s + ".ply")))
    for scene in scenes:
        pred_file = os.path.join(args.result_path, scene, scene + ".ply")
        gt_file = find_gt_mesh(args, scene)
        if gt_file is None:
            print(f"{scene}: no GT mesh found, skipped")
            continue
        verts_pred, _ = read_ply(pred_file)
        verts_gt, _ = read_ply(gt_file)
        if args.axis_align and args.dataset == "scannet":
            meta = os.path.join(args.data_path, "scans", scene,
                                scene + ".txt")
            M = read_axis_align_matrix(meta)
            verts_gt = (np.hstack([verts_gt,
                                   np.ones((len(verts_gt), 1))])
                        @ M.T)[:, :3].astype(np.float32)
        m = eval_mesh_metrics(verts_pred, verts_gt)
        with open(os.path.join(args.result_path, scene,
                               "metrics.json"), "w") as f:
            json.dump(m, f, indent=2)
        for k in keys:
            all_metrics[k].append(m[k])
        print(scene, {k: round(m[k], 4) for k in keys})

    if all_metrics["fscore"]:
        mean = {k: float(np.mean(v)) for k, v in all_metrics.items()}
        print("\nmean:", {k: round(v, 4) for k, v in mean.items()})
        with open(os.path.join(args.result_path, "metrics_mean.json"),
                  "w") as f:
            json.dump(mean, f, indent=2)


if __name__ == "__main__":
    main()
