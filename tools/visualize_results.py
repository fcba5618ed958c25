#!/usr/bin/env python
"""Visualize detections as wireframe boxes merged with the scene mesh.

Replaces reference ``post_process/visualize_results.py``: renders boxes
(score > threshold) as colored edge segments (thin quads instead of open3d
cylinders), merges with the predicted/GT mesh, exports
``{scene}{postfix}.ply``.  ``--generate_gt`` converts GT npys to the same
npz schema for side-by-side viewing.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

PALETTE = np.array([
    [255, 99, 71], [65, 105, 225], [60, 179, 113], [255, 215, 0],
    [186, 85, 211], [0, 206, 209], [255, 140, 0], [119, 136, 153],
    [220, 20, 60], [0, 128, 128], [154, 205, 50], [138, 43, 226],
    [233, 150, 122], [70, 130, 180], [189, 183, 107], [205, 92, 92],
    [106, 90, 205], [218, 165, 32]], np.uint8)

EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7), (6, 7),
         (0, 4), (1, 5), (2, 6), (3, 7)]


def box_corners(box):
    """(cx,cy,cz_bottom,dx,dy,dz[,yaw]) -> [8,3] corners."""
    cx, cy, cz, dx, dy, dz = box[:6]
    yaw = box[6] if len(box) > 6 else 0.0
    c, s = np.cos(yaw), np.sin(yaw)
    out = []
    for iz in (0.0, 1.0):
        for iy in (-0.5, 0.5):
            for ix in (-0.5, 0.5):
                x, y = ix * dx, iy * dy
                out.append([cx + x * c - y * s, cy + x * s + y * c,
                            cz + iz * dz])
    # order: (ix,iy,iz) nested -> relabel for EDGES convention
    o = np.array(out)
    return o[[0, 1, 2, 3, 4, 5, 6, 7]]


def edge_quads(p1, p2, radius=0.01):
    """A thin 2-triangle ribbon approximating a cylinder edge."""
    d = p2 - p1
    n = np.cross(d, [0, 0, 1.0])
    if np.linalg.norm(n) < 1e-8:
        n = np.cross(d, [0, 1.0, 0])
    n = n / np.linalg.norm(n) * radius
    verts = np.array([p1 - n, p1 + n, p2 + n, p2 - n])
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    return verts, faces


def generate_gt(result_path: str, gt_path: str, postfix: str) -> None:
    """Convert GT ``{scene}_aligned_bbox.npy`` instance data into the same
    ``{boxes, scores, labels}`` npz schema the renderer consumes (reference
    ``visualize_results.py:251-283``), so GT and predictions can be rendered
    side by side with different ``--postfix`` values."""
    for scene in sorted(os.listdir(result_path)):
        scene_dir = os.path.join(result_path, scene)
        if not os.path.isdir(scene_dir):
            continue
        npy = os.path.join(gt_path, scene + "_aligned_bbox.npy")
        if not os.path.isfile(npy):
            continue
        arr = np.load(npy)
        boxes = arr[:, :7].astype(np.float32) if arr.shape[1] >= 7 else \
            np.concatenate([arr[:, :6],
                            np.zeros((len(arr), 1))], 1).astype(np.float32)
        labels = arr[:, -1].astype(np.int64)
        np.savez(os.path.join(scene_dir, scene + postfix + ".npz"),
                 boxes=boxes, scores=np.ones(len(arr), np.float32),
                 labels=labels)
        print(scene, len(arr), "gt boxes")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--result_path", required=True)
    p.add_argument("--postfix", default="_atlas_bbox")
    p.add_argument("--score_threshold", type=float, default=0.15)
    p.add_argument("--generate_gt", action="store_true")
    p.add_argument("--gt_path", default=None,
                   help="instance-data dir for --generate_gt")
    args = p.parse_args()

    if args.generate_gt:
        if not args.gt_path:
            p.error("--generate_gt requires --gt_path")
        generate_gt(args.result_path, args.gt_path, args.postfix)

    from cnrma_tpu.utils.ply import read_ply, write_ply_mesh

    for scene in sorted(os.listdir(args.result_path)):
        scene_dir = os.path.join(args.result_path, scene)
        npz = os.path.join(scene_dir, scene + args.postfix + ".npz")
        if not os.path.isfile(npz):
            continue
        data = np.load(npz)
        boxes, scores, labels = (data["boxes"], data["scores"],
                                 data["labels"])
        keep = scores > args.score_threshold
        boxes, labels = boxes[keep], labels[keep]

        all_v, all_f, all_c = [], [], []
        base = 0
        mesh_file = os.path.join(scene_dir, scene + ".ply")
        if os.path.isfile(mesh_file):
            mv, mf = read_ply(mesh_file)
            if mv is not None and len(mv):
                all_v.append(mv)
                all_f.append(mf if mf is not None else
                             np.zeros((0, 3), np.int32))
                all_c.append(np.full((len(mv), 3), 190, np.uint8))
                base = len(mv)
        for box, label in zip(boxes, labels):
            # stored boxes carry gravity-center z; corners want bottom z
            b = box.copy()
            b[2] -= b[5] / 2
            corners = box_corners(b)
            color = PALETTE[int(label) % len(PALETTE)]
            for e0, e1 in EDGES:
                v, f = edge_quads(corners[e0], corners[e1])
                all_v.append(v)
                all_f.append(f + base)
                all_c.append(np.tile(color, (len(v), 1)))
                base += len(v)
        if not all_v:
            continue
        write_ply_mesh(os.path.join(scene_dir,
                                    scene + args.postfix + ".ply"),
                       np.concatenate(all_v), np.concatenate(all_f),
                       vertex_colors=np.concatenate(all_c))
        print(scene, f"{len(boxes)} boxes")


if __name__ == "__main__":
    main()
