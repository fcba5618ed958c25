#!/usr/bin/env python
"""Training-step throughput at the reference's ScanNet train setting.

One full jitted train step (forward + backward + AdamW + clip) of the
flagship CNRMA on 192x192x80 @ 4 cm, 40 views @ 480x640, 1 cm detector —
the per-GPU workload of the reference's 4-GPU stage-3 finetune
(``ray_marching_scannet.py:12-19,77``).  Reports scenes/sec/chip for
training; multiply by the data-mesh size for aggregate throughput (the
shard_map trainer is per-device this exact program).

``--view-shards N`` runs the step over a ``('data'=1,'view'=N)``
mesh (``make_train_step(view_axis='view')``): each scene's tower/volume
/ray-march work shards over views and the U-Net over X slabs across N
chips — the path that fits the medium (stage-3) workload on 16 GB v5e
parts, which it does not fit alone (doc/performance.md "Training
throughput").  Needs N visible devices.

Usage: python tools/bench_train.py [--scale medium|small] [--iters N]
                                   [--view-shards N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="medium",
                    choices=["small", "medium"])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--view-shards", type=int, default=0,
                    help="shard each scene over N devices "
                         "(('data','view') mesh train step)")
    args = ap.parse_args()

    from cnrma_tpu.utils.comp_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import optax
    from bench import build_bench
    from cnrma_tpu.train.loop import make_train_step
    from cnrma_tpu.train.state import TrainState

    model, batch = build_bench(args.scale)
    rng_np = np.random.RandomState(0)
    X, Y, Z = model.voxel_dim
    b = 1
    # train-mode targets: GT boxes + 3-scale TSDF supervision
    batch.update({
        "gt_boxes": np.tile(np.array(
            [[2.0, 2.0, 1.0, 1.0, 1.0, 1.0, 0.0]], np.float32),
            (b, 8, 1)),
        "gt_labels": np.zeros((b, 8), np.int32),
        "gt_valid": np.ones((b, 8), bool),
        "tsdf_list": {
            f"tsdf_gt_{s:03d}": (rng_np.rand(
                b, X >> i, Y >> i, Z >> i).astype(np.float32) * 2 - 1)
            for i, s in enumerate((4, 8, 16))
        },
    })
    batch = {k: jax.tree_util.tree_map(jnp.asarray, v)
             for k, v in batch.items()}

    rng = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}", flush=True)
    t0 = time.perf_counter()
    variables = jax.jit(lambda: model.init(
        {"params": rng, "sample": rng, "aug": rng}, batch,
        train=False))()
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adamw(1e-3, weight_decay=1e-4))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    if args.view_shards > 1:
        from cnrma_tpu.parallel.mesh import make_mesh, replicate, \
            shard_batch
        mesh = make_mesh(shape=(1, args.view_shards),
                         axis_names=("data", "view"))
        state = replicate(state, mesh)
        batch = shard_batch(batch, mesh)
        step = make_train_step(model, tx, mesh=mesh, view_axis="view")
        print(f"view-sharded step over {args.view_shards} devices",
              flush=True)
    else:
        step = make_train_step(model, tx)

    def force(s):
        jax.device_get(s.step)

    t0 = time.perf_counter()
    state, logs = step(state, batch, rng)
    force(state)
    print(f"compile+first-step: {time.perf_counter() - t0:.1f}s "
          f"total_loss={float(logs['total_loss']):.3f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, logs = step(state, batch, rng)
    force(state)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train step[{args.scale}]: {dt * 1000:.1f} ms/scene -> "
          f"{1.0 / dt:.3f} scenes/sec/chip (training)", flush=True)


if __name__ == "__main__":
    main()
