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
    p.add_argument("--n-devices", type=int, default=1,
                   help="shard SCENES over the first N devices (the "
                        "reference's multi_gpu_test over the val split, "
                        "test.py:205-214): each step runs an N-scene "
                        "batch, one scene per device. Bit-identical to "
                        "sequential runs (per-scene subsample seeds).")
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

    n_dev = max(1, args.n_devices)
    if n_dev > 1 and args.view_shard:
        raise SystemExit("--n-devices (scene sharding) and --view-shard "
                         "(view sharding) are mutually exclusive")
    if n_dev > len(jax.devices()):
        print(f"WARNING: --n-devices {n_dev} > {len(jax.devices())} "
              "visible devices; clamping")
        n_dev = len(jax.devices())

    dataset = build_dataset(cfg, "test", seed=args.seed)
    loader = SceneLoader(dataset, batch_size=n_dev, shuffle=False,
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
    # init on a single-scene slice: parameters are batch-independent and
    # the b==1 trace is the fast `batch_map` shortcut
    sample1 = jax.tree_util.tree_map(lambda a: a[:1], sample)
    rng = jax.random.PRNGKey(args.seed)
    variables = jax.jit(lambda: model.init(
        {"params": rng, "sample": rng}, sample1, train=False))()
    if args.checkpoint:
        import optax
        state = TrainState.create(variables["params"],
                                  variables.get("batch_stats", {}),
                                  optax.identity())
        state = load_checkpoint(args.checkpoint, state, weights_only=True)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

    if n_dev > 1:
        from cnrma_tpu.parallel.mesh import make_mesh, shard_batch
        from cnrma_tpu.utils.batching import vmap_batch_mode
        mesh = make_mesh(n_dev)
        print(f"scene-sharding inference over {n_dev} devices")

        @jax.jit
        def forward(batch):
            # device-sharded batch axis: per-op partitioning (GSPMD), not
            # the lax.map all-gather pathology (doc/performance.md)
            with vmap_batch_mode(True):
                return model.apply(variables, batch, train=False,
                                   rngs={"sample": jax.random.PRNGKey(0)})

        put = lambda b: shard_batch(b, mesh)  # noqa: E731
    else:
        @jax.jit
        def forward(batch):
            return model.apply(variables, batch, train=False,
                               rngs={"sample": jax.random.PRNGKey(0)})

        put = lambda b: b  # noqa: E731

    def write_scene(scene, out, i, host_batch):
        """Write the reference-format artifacts for batch element i
        (per-scene fault isolation like ray_marching.py:503-519)."""
        try:
            tsdf_vol = out["tsdf"]["scene_tsdf_004"][i]
            offset = np.asarray(host_batch["offset"][i]).reshape(1, 3)
            tsdf = TSDF(model.voxel_size, offset, tsdf_vol)
            scene_dir = os.path.join(save_path, scene)
            os.makedirs(scene_dir, exist_ok=True)
            tsdf.save(os.path.join(scene_dir, scene + ".npz"))
            verts, faces, normals = tsdf.get_mesh()
            write_ply_mesh(os.path.join(scene_dir, scene + ".ply"),
                           verts, faces, vertex_normals=normals)
            if "bboxes" in out:
                valid = out["bbox_valid"][i]
                np.savez(os.path.join(scene_dir,
                                      scene + "_bbox_raw.npz"),
                         bboxes=out["bboxes"][i][valid],
                         scores=out["scores"][i][valid])
            if middle_path and "points" in out:
                pts = out["points"]
                pvalid = pts.valid[i]
                vert = np.concatenate(
                    [pts.xyz[i][pvalid], pts.feats[i][pvalid]], axis=1)
                np.save(os.path.join(middle_path, scene + "_vert.npy"),
                        vert.astype(np.float32))
                if middle_viz:
                    os.makedirs(os.path.join(middle_viz, scene),
                                exist_ok=True)
                    write_ply_points(
                        os.path.join(middle_viz, scene,
                                     scene + "_points.ply"),
                        vert[:, :3])
        except Exception as e:
            print(f"{scene} is invalid! ({e})")

    t0 = time.time()
    n_done = 0

    def prep(batch, base):
        """Host-side collation + ASYNC device placement of one batch."""
        scenes = list(batch["scene"])
        n_real = len(scenes)
        # per-scene subsample seed = global scene index (shuffle=False):
        # makes sharded and sequential runs draw identical subsamples
        batch["scene_seed"] = np.arange(base, base + n_real,
                                        dtype=np.int32)
        db = device_batch(batch)
        if n_dev > 1 and n_real < n_dev:      # pad the ragged last batch
            pad = n_dev - n_real
            db = jax.tree_util.tree_map(
                lambda a: np.concatenate(
                    [np.asarray(a)] + [np.asarray(a[-1:])] * pad), db)
        return scenes, batch, put(db)

    # Double-buffered streaming (BASELINE config 5 / SURVEY §2.8 PP row):
    # while the device runs scene k, the host already device_put the
    # scene k+1 image stack (``put`` dispatches the H2D copies
    # asynchronously), and the per-scene artifact writes (marching
    # cubes + npz/ply IO — host work) run on a writer thread instead of
    # serializing with the next dispatch.
    from concurrent.futures import ThreadPoolExecutor
    writer = ThreadPoolExecutor(max_workers=1)
    pending = []
    it = iter(loader)
    nxt = next(it, None)
    cur = prep(nxt, 0) if nxt is not None else None
    while cur is not None:
        scenes, host_batch, db = cur
        out_dev = forward(db)                 # async dispatch
        base = n_done + len(scenes)
        nxt = next(it, None)                  # host decode overlaps
        cur = prep(nxt, base) if nxt is not None else None
        out = jax.device_get(out_dev)         # sync point
        pending.append(writer.submit(
            lambda o=out, s=scenes, hb=host_batch: [
                write_scene(sc, o, i, hb) for i, sc in enumerate(s)]))
        if len(pending) > 2:                  # bound host memory
            pending.pop(0).result()
        n_done += len(scenes)
        dt = time.time() - t0
        print(f"[{n_done}] {scenes[-1]}  ({dt / n_done:.2f}s/scene)",
              flush=True)
        if args.max_scenes and n_done >= args.max_scenes:
            break
    for f in pending:
        f.result()
    writer.shutdown(wait=True)


if __name__ == "__main__":
    main()
