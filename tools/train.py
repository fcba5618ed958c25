#!/usr/bin/env python
"""Training entry point.

CLI mirrors the reference ``train.py`` (config positional, ``--work-dir``,
``--resume-from``, ``--seed``, ``--cfg-options``); distribution is a JAX
device mesh instead of ``torch.distributed.launch`` — run once per host,
all local devices are used automatically.

Usage:
    python tools/train.py configs/ray_marching_scannet.py \
        --work-dir ./work_dirs/scannet [--load-from ckpt] [--batch-size N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train a CN-RMA TPU model")
    p.add_argument("config")
    p.add_argument("--work-dir")
    p.add_argument("--load-from", help="checkpoint with weights only")
    p.add_argument("--resume-from",
                   help="checkpoint incl. optimizer/epoch")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=None,
                   help="scenes per step (default: one per device)")
    p.add_argument("--view-shards", type=int, default=1,
                   help="shard each scene across N devices on a "
                        "('data','view') mesh: views for the 2D tower/"
                        "volume/ray-march, X-slabs for the 3D U-Net — "
                        "fits the stage-3 finetune workload on chips it "
                        "exceeds alone (doc/performance.md)")
    p.add_argument("--max-steps", type=int, default=None,
                   help="stop after N optimizer steps (debug)")
    p.add_argument("--cfg-options", nargs="+", default=[],
                   help="override config: key=value ...")
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
    from cnrma_tpu.parallel.mesh import make_mesh
    from cnrma_tpu.train.loop import (
        device_batch, make_train_step, run_training, TextLogger)
    from cnrma_tpu.train.optim import (
        FROZEN_PREFIXES_FREEZE_AT_2, build_lr_schedule, build_optimizer)
    from cnrma_tpu.train.state import TrainState, load_checkpoint

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1)
                                    for kv in args.cfg_options))
    work_dir = args.work_dir or cfg.get("work_dir", "./work_dirs/default")
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "config_dump.py"), "w") as f:
        f.write(cfg.dump())

    n_all = len(__import__("jax").devices())
    vshards = max(1, args.view_shards)
    if vshards > 1:
        if n_all % vshards:
            raise SystemExit(f"--view-shards {vshards} must divide the "
                             f"{n_all} visible devices")
        mesh = make_mesh(shape=(n_all // vshards, vshards),
                         axis_names=("data", "view"))
        print(f"mesh: {n_all // vshards} data x {vshards} view shards "
              "(intra-scene sharded training)")
    else:
        mesh = make_mesh()
    n_dev = int(mesh.shape["data"] if "data" in mesh.shape else
                np.prod([d for d in mesh.devices.shape]))
    batch_size = args.batch_size or n_dev

    dataset = build_dataset(cfg, "train", seed=args.seed)
    loader = SceneLoader(dataset, batch_size=batch_size, shuffle=True,
                         num_workers=int(cfg.get("data", {}).get(
                             "workers_per_gpu", 2)) * 2,
                         seed=args.seed, drop_last=True)

    model = build_model(cfg, mode="train")
    steps_per_epoch = max(1, len(loader))
    lr_schedule = build_lr_schedule(cfg.get("lr_config", {}),
                                    cfg.optimizer["lr"], steps_per_epoch)
    grad_clip = (cfg.get("optimizer_config", {}) or {}).get(
        "grad_clip", {})
    clip = grad_clip.get("max_norm") if grad_clip else None

    # init params on a sample batch
    sample = device_batch(next(iter(
        SceneLoader(dataset, batch_size=batch_size, num_workers=1))))
    rng = jax.random.PRNGKey(args.seed)
    # jitted init: one compile (persistently cached) instead of eager
    # per-op dispatch through the whole pipeline trace
    variables = jax.jit(lambda: model.init(
        {"params": rng, "sample": rng, "aug": rng}, sample,
        train=False))()

    # reference parity: the FPN constructor auto-loads the Caffe2 R-50
    # backbone when backbone2d.pretrained is set (fpn.py:142-144); without
    # it from-scratch training saturates the TSDF tanh (frozen-at-init BN
    # with caffe2-scale inputs) and recon gradients vanish
    pre2d = (cfg.get("model", {}).get("backbone2d", {}) or {}).get(
        "pretrained")
    if pre2d:
        if os.path.isfile(pre2d):
            from tools.convert_checkpoint import (
                load_torch_pretrained, merge_pretrained)
            from flax.core import unfreeze
            p2, s2 = load_torch_pretrained(pre2d)
            variables = unfreeze(jax.device_get(variables))
            n = merge_pretrained(variables["params"], p2)
            n += merge_pretrained(variables.get("batch_stats", {}), s2)
            print(f"loaded {n} pretrained 2D-backbone arrays from {pre2d}")
        else:
            print(f"WARNING: backbone2d.pretrained={pre2d} not found — "
                  "training the 2D tower from scratch")

    tx = build_optimizer(cfg.optimizer, lr_schedule, grad_clip=clip,
                         params=variables["params"],
                         frozen_prefixes=FROZEN_PREFIXES_FREEZE_AT_2)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    start_epoch = 0
    if args.resume_from or cfg.get("resume_from"):
        resume_path = args.resume_from or cfg.resume_from
        state = load_checkpoint(resume_path, state, weights_only=False)
        meta_file = os.path.join(resume_path, "cnrma_meta.json")
        if os.path.isfile(meta_file):
            import json
            with open(meta_file) as f:
                start_epoch = int(json.load(f).get("epoch", 0))
    elif args.load_from or cfg.get("load_from"):
        state = load_checkpoint(args.load_from or cfg.load_from, state,
                                weights_only=True)

    # mid-training evaluation (reference `evaluation = dict(interval=...)`,
    # ray_marching_scannet.py:47): score the val split every `interval`
    # epochs and keep the best-val-loss checkpoint
    val_loader, eval_interval = None, 1
    eval_cfg = cfg.get("evaluation", {}) or {}
    eval_metric = str(eval_cfg.get("metric", "loss"))
    if eval_cfg and cfg.get("data", {}).get("val"):
        try:
            val_dataset = build_dataset(cfg, "val", seed=args.seed)
            # drop_last=False: validation must see every scene — with a
            # val split smaller than batch_size, drop_last would yield
            # zero batches and silently disable the best-checkpoint hook
            # (the partial final batch costs one extra eval-step compile)
            val_loader = SceneLoader(val_dataset, batch_size=batch_size,
                                     num_workers=1, drop_last=False)
            eval_interval = max(1, int(eval_cfg.get("interval", 1)))
        except Exception as e:
            print(f"WARNING: val split unavailable ({e}); "
                  "mid-training evaluation disabled")

    epochs = int(cfg.get("total_epochs", 1))
    run_training(
        model, tx, loader, epochs=epochs, state=state, work_dir=work_dir,
        lr_schedule=lr_schedule, seed=args.seed,
        log_interval=int(cfg.get("log_config", {}).get("interval", 10)),
        checkpoint_interval=int(cfg.get("checkpoint_config", {}).get(
            "interval", 10)),
        mesh=mesh, start_epoch=start_epoch, max_steps=args.max_steps,
        val_loader=val_loader, eval_interval=eval_interval,
        eval_metric=eval_metric,
        view_axis="view" if vshards > 1 else None)


if __name__ == "__main__":
    main()
