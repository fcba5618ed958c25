#!/usr/bin/env python
"""Inference / result-dump entry point.

Mirrors the reference ``test.py`` + ``RayMarching.forward_test``
side-effects: per scene writes
  ``{save_path}/{scene}/{scene}.npz``            (predicted fine TSDF)
  ``{save_path}/{scene}/{scene}.ply``            (marching-cubes mesh)
  ``{save_path}/{scene}/{scene}_bbox_raw.npz``   (raw boxes + scores)
and, with ``--middle-save-path`` (or config ``middle_save_path``), the
stage-2 pretrain dumps ``{scene}_vert.npy`` (xyz + 32-dim weighted
features, subsampled to ``max_points``) like
``RayMarching.save_middle_result`` (``ray_marching.py:959-991``).

Offline scoring is then ``tools/nms_bbox.py`` + ``tools/evaluate_bbox.py``.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Run CN-RMA TPU inference")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--save-path")
    p.add_argument("--middle-save-path")
    p.add_argument("--middle-visualize-path",
                   help="also dump the ray-marched points as .ply")
    p.add_argument("--view-shard", action="store_true",
                   help="shard volume accumulation over views across all "
                        "visible devices (one psum over ICI) — the "
                        "multi-chip latency path for single-scene "
                        "inference (SURVEY.md §5)")
    p.add_argument("--max-scenes", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from cnrma_tpu.utils.comp_cache import (
        enable_persistent_cache, respect_jax_platforms_env)
    respect_jax_platforms_env()
    enable_persistent_cache()
    from cnrma_tpu.core.config import Config
    from cnrma_tpu.core.builder import build_model, build_dataset
    from cnrma_tpu.data.loader import SceneLoader
    from cnrma_tpu.geometry.tsdf import TSDF
    from cnrma_tpu.train.loop import device_batch
    from cnrma_tpu.train.state import TrainState, load_checkpoint
    from cnrma_tpu.utils.ply import write_ply_mesh, write_ply_points

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1)
                                    for kv in args.cfg_options))
    save_path = args.save_path or cfg.get("save_path", "./results")
    middle_path = args.middle_save_path or cfg.get("middle_save_path")
    middle_viz = (args.middle_visualize_path
                  or cfg.get("middle_visualize_path"))
    os.makedirs(save_path, exist_ok=True)
    if middle_path:
        os.makedirs(middle_path, exist_ok=True)
    if middle_viz:
        os.makedirs(middle_viz, exist_ok=True)

    dataset = build_dataset(cfg, "test", seed=args.seed)
    loader = SceneLoader(dataset, batch_size=1, shuffle=False,
                         num_workers=2)
    view_mesh = None
    if args.view_shard:
        devs = jax.devices()
        if len(devs) > 1:
            from jax.sharding import Mesh
            view_mesh = Mesh(np.asarray(devs), ("view",))
            print(f"view-sharding volume accumulation over "
                  f"{len(devs)} devices")
        else:
            print("WARNING: --view-shard needs >1 device; running "
                  "single-device")
    model = build_model(cfg, mode="test", view_mesh=view_mesh)

    sample = device_batch(next(iter(loader)))
    rng = jax.random.PRNGKey(args.seed)
    variables = jax.jit(lambda: model.init(
        {"params": rng, "sample": rng}, sample, train=False))()
    if args.checkpoint:
        import optax
        state = TrainState.create(variables["params"],
                                  variables.get("batch_stats", {}),
                                  optax.identity())
        state = load_checkpoint(args.checkpoint, state, weights_only=True)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

    @jax.jit
    def forward(batch):
        return model.apply(variables, batch, train=False,
                           rngs={"sample": jax.random.PRNGKey(0)})

    voxel_size = model.voxel_size
    t0 = time.time()
    n_done = 0
    for batch in loader:
        scene = batch["scene"][0]
        out = jax.device_get(forward(device_batch(batch)))
        try:
            tsdf_vol = out["tsdf"]["scene_tsdf_004"][0]
            offset = np.asarray(batch["offset"][0]).reshape(1, 3)
            tsdf = TSDF(voxel_size, offset, tsdf_vol)
            scene_dir = os.path.join(save_path, scene)
            os.makedirs(scene_dir, exist_ok=True)
            tsdf.save(os.path.join(scene_dir, scene + ".npz"))
            verts, faces, normals = tsdf.get_mesh()
            write_ply_mesh(os.path.join(scene_dir, scene + ".ply"),
                           verts, faces, vertex_normals=normals)
            if "bboxes" in out:
                valid = out["bbox_valid"][0]
                np.savez(os.path.join(scene_dir,
                                      scene + "_bbox_raw.npz"),
                         bboxes=out["bboxes"][0][valid],
                         scores=out["scores"][0][valid])
            if middle_path and "points" in out:
                pts = out["points"]
                pvalid = pts.valid[0]
                vert = np.concatenate(
                    [pts.xyz[0][pvalid], pts.feats[0][pvalid]], axis=1)
                np.save(os.path.join(middle_path, scene + "_vert.npy"),
                        vert.astype(np.float32))
                if middle_viz:
                    os.makedirs(os.path.join(middle_viz, scene),
                                exist_ok=True)
                    write_ply_points(
                        os.path.join(middle_viz, scene,
                                     scene + "_points.ply"),
                        vert[:, :3])
        except Exception as e:               # per-scene fault isolation,
            print(f"{scene} is invalid! ({e})")   # like ray_marching.py:517
        n_done += 1
        dt = time.time() - t0
        print(f"[{n_done}] {scene}  ({dt / n_done:.2f}s/scene)",
              flush=True)
        if args.max_scenes and n_done >= args.max_scenes:
            break


if __name__ == "__main__":
    main()
