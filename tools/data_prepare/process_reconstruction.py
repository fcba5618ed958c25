#!/usr/bin/env python
"""Convert predicted reconstruction meshes to point arrays.

Replaces reference ``data_prepare/process_reconstruction.py``: reads
``{result_path}/{scene}/{scene}.ply`` predicted meshes and writes
``{scene}_vert.npy`` (xyz + vertex normals) for FCAF3D-style training on
reconstructed geometry.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--result_path", required=True)
    p.add_argument("--output_path", required=True)
    args = p.parse_args()
    os.makedirs(args.output_path, exist_ok=True)

    from cnrma_tpu.utils.ply import read_ply

    for scene in sorted(os.listdir(args.result_path)):
        mesh_file = os.path.join(args.result_path, scene, scene + ".ply")
        if not os.path.isfile(mesh_file):
            continue
        verts, faces = read_ply(mesh_file)
        if verts is None or len(verts) == 0:
            print(scene, "empty mesh, skipped")
            continue
        # per-vertex normals from face normals
        normals = np.zeros_like(verts)
        if faces is not None and len(faces):
            v0, v1, v2 = (verts[faces[:, 0]], verts[faces[:, 1]],
                          verts[faces[:, 2]])
            fn = np.cross(v1 - v0, v2 - v0)
            for i in range(3):
                np.add.at(normals, faces[:, i], fn)
            norm = np.linalg.norm(normals, axis=1, keepdims=True)
            normals = normals / np.where(norm > 1e-12, norm, 1.0)
        out = np.hstack([verts, normals]).astype(np.float32)
        np.save(os.path.join(args.output_path, scene + "_vert.npy"), out)
        print(scene, len(out), "verts")


if __name__ == "__main__":
    main()
