#!/usr/bin/env python
"""Generate GT TSDF volumes (tsdf_04/08/16.npz + info.json) per scene.

Replaces the reference ``data_prepare/{scannet,arkit}/generate_tsdf.py``
(ray-actor multi-GPU fusion) with the jitted fusion kernel
(``cnrma_tpu.geometry.tsdf_fusion``) + a process pool over scenes.

Inputs (ScanNet layout): ``{data_path}/posed_images/{scene}/*.jpg`` with
matching ``*.png`` depth (mm), per-frame pose ``*.txt``, shared
``intrinsic.txt``.  Outputs: ``{save_path}/atlas_tsdf/{scene}/tsdf_XX.npz``
+ ``info.json`` frame index.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
from PIL import Image


def list_frames(scene_dir):
    ids = sorted(f[:-4] for f in os.listdir(scene_dir)
                 if f.endswith(".txt") and f != "intrinsic.txt")
    return ids


def process_scene(args, scene):
    from cnrma_tpu.geometry.tsdf_fusion import (
        depth_to_world_points, fuse_tsdf, volume_bounds_from_depths)

    scene_dir = os.path.join(args.data_path, "posed_images", scene)
    out_dir = os.path.join(args.save_path, "atlas_tsdf", scene)
    os.makedirs(out_dir, exist_ok=True)
    intrinsic = np.loadtxt(os.path.join(scene_dir, "intrinsic.txt"),
                           delimiter=" ")[:3, :3]
    frame_ids = list_frames(scene_dir)[::args.stride]

    depths, projections, cam2worlds = [], [], []
    img_info = []
    for fid in frame_ids:
        pose = np.loadtxt(os.path.join(scene_dir, fid + ".txt"))
        depth_file = os.path.join(scene_dir, fid + ".png")
        if not os.path.isfile(depth_file) or not \
                np.isfinite(pose).all():
            continue
        depth = np.asarray(Image.open(depth_file),
                           np.float32) / 1000.0
        depths.append(depth)
        cam2worlds.append(pose)
        projections.append(intrinsic @ np.linalg.inv(pose)[:3])
        img_info.append({
            "file_name_image": os.path.join("posed_images", scene,
                                            fid + ".jpg"),
            "file_name_depth": os.path.join("posed_images", scene,
                                            fid + ".png"),
            "id": fid})
    if not depths:
        print(f"{scene}: no valid frames")
        return

    # volume bounds from a subsampled backprojected cloud
    pts = []
    for i in range(0, len(depths), max(1, len(depths) // 50)):
        pts.append(depth_to_world_points(depths[i][::8, ::8],
                                         intrinsic / 8.0, cam2worlds[i],
                                         args.max_depth))
    pts = np.concatenate([p for p in pts if len(p)], axis=0)
    origin, dim4 = volume_bounds_from_depths(pts, args.voxel_size,
                                             args.margin)
    # pad dims to multiples of 4 so the 3 scales nest exactly
    dim4 = tuple(int(np.ceil(d / 4) * 4) for d in dim4)

    import jax.numpy as jnp
    depths_a = jnp.asarray(np.stack(depths))
    projs_a = jnp.asarray(np.stack(projections).astype(np.float32))
    ok = jnp.ones((len(depths),), bool)
    for scale in range(3):
        vs = args.voxel_size * (2 ** scale)
        dim = tuple(d // (2 ** scale) for d in dim4)
        tsdf, _ = fuse_tsdf(depths_a, projs_a, ok,
                            jnp.asarray(origin), dim, vs,
                            trunc_ratio=args.trunc_ratio,
                            max_depth=args.max_depth)
        np.savez_compressed(
            os.path.join(out_dir,
                         f"tsdf_{str(int(vs * 100)).zfill(2)}.npz"),
            origin=np.asarray(origin).reshape(1, 3),
            voxel_size=vs,
            tsdf=np.asarray(tsdf))
    with open(os.path.join(out_dir, "info.json"), "w") as f:
        json.dump({"scene": scene, "path": args.data_path,
                   "intrinsics": intrinsic.tolist(),
                   "images": img_info}, f)
    print("fused", scene, dim4)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--voxel_size", type=float, default=0.04)
    p.add_argument("--trunc_ratio", type=float, default=3.0)
    p.add_argument("--max_depth", type=float, default=3.0)
    p.add_argument("--margin", type=float, default=1.5)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--scenes", nargs="*", default=None)
    p.add_argument("--num_workers", type=int, default=1)
    args = p.parse_args()

    scenes = args.scenes or sorted(os.listdir(
        os.path.join(args.data_path, "posed_images")))
    if args.num_workers > 1:
        import multiprocessing as mp
        with mp.get_context("spawn").Pool(args.num_workers) as pool:
            pool.starmap(process_scene,
                         [(args, s) for s in scenes])
    else:
        for s in scenes:
            process_scene(args, s)


if __name__ == "__main__":
    main()
