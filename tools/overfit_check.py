#!/usr/bin/env python
"""Learning-sanity check: overfit the detector on synthetic scenes.

Trains a tiny FCAF3DOnly on procedurally generated box scenes (points on
box surfaces + floor clutter, features correlated with class) and reports
the loss curve and mAP@0.25/0.5 of the trained model on the SAME scenes —
evidence that losses, the assigner, gradients, the optimizer, NMS, and
evaluation compose into a system that actually learns, without needing
the real datasets.

Usage: python tools/overfit_check.py [--steps 60] [--platform cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def make_scene(rng, n_classes=3, n_pts=1024, n_boxes=2):
    """Points on the surfaces of axis-aligned boxes + uniform clutter."""
    boxes, labels = [], []
    pts, feats = [], []
    for b in range(n_boxes):
        cls = rng.randint(n_classes)
        center = rng.rand(3) * 2.4 + np.array([0.8, 0.8, 0.4])
        size = rng.rand(3) * 0.5 + np.array([0.4, 0.4, 0.3])
        boxes.append([*center, *size, 0.0])
        labels.append(cls)
        n = n_pts // (n_boxes + 1)
        # sample on the box surface: pick a face per point
        u = rng.rand(n, 3) - 0.5
        face = rng.randint(3, size=n)
        sign = rng.choice([-0.5, 0.5], size=n)
        u[np.arange(n), face] = sign
        p = center[None] + u * size[None]
        pts.append(p)
        f = np.zeros((n, 8), np.float32)
        f[:, cls] = 1.0                      # class-correlated feature
        f[:, 3:] = rng.rand(n, 5) * 0.1
        feats.append(f)
    n_bg = n_pts - sum(len(p) for p in pts)
    bg = rng.rand(n_bg, 3) * 4.0
    bg[:, 2] *= 0.05                          # floor
    pts.append(bg)
    feats.append(rng.rand(n_bg, 8).astype(np.float32) * 0.1)
    return (np.concatenate(pts).astype(np.float32),
            np.concatenate(feats).astype(np.float32),
            np.asarray(boxes, np.float32), np.asarray(labels, np.int32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    from cnrma_tpu.utils.comp_cache import (
        enable_persistent_cache, respect_jax_platforms_env)
    respect_jax_platforms_env()
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import optax
    from cnrma_tpu.eval.indoor_eval import indoor_eval
    from cnrma_tpu.models.fcaf3d import DetectionCapacities
    from cnrma_tpu.models.fcaf3d_only import FCAF3DOnly
    from cnrma_tpu.ops.nms import multiclass_nms_np
    from cnrma_tpu.train.state import TrainState

    n_classes = 3
    rng_np = np.random.RandomState(0)
    scenes = [make_scene(rng_np, n_classes) for _ in range(args.scenes)]
    B, M = len(scenes), 4
    batch = {
        "points": jnp.asarray(np.stack([s[0] for s in scenes])),
        "point_feats": jnp.asarray(np.stack([s[1] for s in scenes])),
        "point_valid": jnp.ones((B, scenes[0][0].shape[0]), bool),
        "gt_boxes": jnp.zeros((B, M, 7), jnp.float32),
        "gt_labels": jnp.zeros((B, M), jnp.int32),
        "gt_valid": jnp.zeros((B, M), bool),
    }
    for i, (_, _, bx, lb) in enumerate(scenes):
        k = len(bx)
        batch["gt_boxes"] = batch["gt_boxes"].at[i, :k].set(bx)
        batch["gt_labels"] = batch["gt_labels"].at[i, :k].set(lb)
        batch["gt_valid"] = batch["gt_valid"].at[i, :k].set(True)

    model = FCAF3DOnly(
        n_classes=n_classes, voxel_size=0.08, pts_threshold=2000,
        assigner_limit=8, assigner_topk=6, nms_pre=64,
        capacities=DetectionCapacities.tiny(),
        use_feature_transform=False)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda: model.init(
        {"params": rng, "aug": rng}, batch, train=False))()
    tx = optax.adamw(2e-3)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)

    @jax.jit
    def step(state, rng):
        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, rngs={"aug": rng},
                mutable=["batch_stats"])
            return sum(out["losses"].values()), (out["losses"],
                                                 mut["batch_stats"])
        (loss, (losses, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, stats), loss

    t0 = time.time()
    first = None
    for i in range(args.steps):
        state, loss = step(state, jax.random.fold_in(rng, i))
        if i == 0:
            first = float(loss)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.4f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
    final = float(loss)

    # eval on the same scenes
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      batch, train=False)
    results, gts = [], []
    for i in range(B):
        v = np.asarray(out["bbox_valid"][i])
        bb, sc, lb = multiclass_nms_np(
            np.asarray(out["bboxes"][i])[v],
            np.asarray(out["scores"][i])[v],
            score_thr=0.05, iou_thr=0.5)
        bb = bb.copy()
        if len(bb):
            bb[:, 2] -= bb[:, 5] / 2          # gravity -> bottom z
        results.append({"boxes": bb, "scores": sc, "labels": lb})
        gb = np.asarray(scenes[i][2]).copy()
        gb[:, 2] -= gb[:, 5] / 2
        gts.append({"gt_boxes": gb, "labels": scenes[i][3]})
    # debug visibility: top predictions vs GT for scene 0
    order = np.argsort(-results[0]["scores"])[:4]
    for j in order:
        print("  pred", np.round(results[0]["boxes"][j], 2),
              f"s={results[0]['scores'][j]:.3f} "
              f"l={results[0]['labels'][j]}")
    for gb, gl in zip(gts[0]["gt_boxes"], gts[0]["labels"]):
        print("  gt  ", np.round(gb, 2), f"l={gl}")
    metrics = indoor_eval(gts, results, iou_thrs=(0.25, 0.5),
                          label2cat={i: f"c{i}" for i in range(n_classes)},
                          rotated=False)
    print(f"loss {first:.3f} -> {final:.3f};  "
          f"mAP@0.25 {metrics['mAP_0.25']:.3f}  "
          f"mAP@0.50 {metrics['mAP_0.50']:.3f}")
    ok = final < 0.5 * first and metrics["mAP_0.25"] >= 0.5
    print("overfit check:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
