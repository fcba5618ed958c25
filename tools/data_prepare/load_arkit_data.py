#!/usr/bin/env python
"""Extract ARKitScenes annotations -> instance-data arrays.

Replaces reference ``data_prepare/arkit/{load_arkit_data,box_utils,
rotation}.py``: parses ``{scene}_3dod_annotation.json`` oriented boxes
(centroid + axes lengths + rotation matrix) into 7-DoF (cx,cy,cz,dx,dy,dz,
yaw) + class-id arrays ``{scene}_aligned_bbox.npy``.
"""

import argparse
import json
import os
import sys

import numpy as np

ARKIT_CLASSES = ["cabinet", "refrigerator", "shelf", "stove", "bed",
                 "sink", "washer", "toilet", "bathtub", "oven",
                 "dishwasher", "fireplace", "stool", "chair", "table",
                 "tv_monitor", "sofa"]
CLASS_TO_ID = {c: i for i, c in enumerate(ARKIT_CLASSES)}


def yaw_from_rotation(R):
    """Extract z yaw from a (mostly upright) rotation matrix."""
    return float(np.arctan2(R[1, 0], R[0, 0]))


def parse_annotation(json_file):
    with open(json_file) as f:
        anno = json.load(f)
    boxes, labels = [], []
    for item in anno.get("data", []):
        label = item.get("label")
        if label not in CLASS_TO_ID:
            continue
        seg = item["segments"]["obbAligned"]
        centroid = np.asarray(seg["centroid"], np.float64)
        axes_len = np.asarray(seg["axesLengths"], np.float64)
        R = np.asarray(seg["normalizedAxes"], np.float64).reshape(3, 3).T
        yaw = yaw_from_rotation(R)
        boxes.append([*centroid, *axes_len, yaw])
        labels.append(CLASS_TO_ID[label])
    if not boxes:
        return np.zeros((0, 8))
    return np.hstack([np.asarray(boxes),
                      np.asarray(labels)[:, None]])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True,
                   help="root containing {split}/{scene}")
    p.add_argument("--output_path", required=True)
    p.add_argument("--splits", nargs="*",
                   default=["Training", "Validation"])
    args = p.parse_args()
    os.makedirs(args.output_path, exist_ok=True)
    for split in args.splits:
        split_dir = os.path.join(args.data_path, split)
        if not os.path.isdir(split_dir):
            continue
        for scene in sorted(os.listdir(split_dir)):
            jf = os.path.join(split_dir, scene,
                              f"{scene}_3dod_annotation.json")
            if not os.path.isfile(jf):
                continue
            arr = parse_annotation(jf)
            np.save(os.path.join(args.output_path,
                                 scene + "_aligned_bbox.npy"), arr)
            print(scene, len(arr), "boxes")


if __name__ == "__main__":
    main()
