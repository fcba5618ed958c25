#!/usr/bin/env python
"""Substage timing of the FCAF3D detection stage (the pipeline's hot spot).

Splits the detector into voxelize / sparse ResNet34 backbone / neck+heads /
get_bboxes, jits each separately on bench-scale shapes, and times them on
the attached accelerator — so sparse-op optimization effort goes to the
actual wall, not a guess.

Usage: python tools/profile_detect.py [--scale small|medium|full] [--iters N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="small",
                   choices=["small", "medium", "full"])
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    from cnrma_tpu.utils.comp_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    from bench import build_bench
    from cnrma_tpu.utils.profiling import StageTimer, force_ready

    # sitecustomize pins jax_platforms via jax.config (wins over the env
    # var) — re-apply the env so JAX_PLATFORMS=cpu smoke runs work
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    model, batch = build_bench(args.scale)
    print(f"devices: {jax.devices()}", flush=True)

    # synthetic surface point cloud on the detection grid
    rng = np.random.RandomState(0)
    P = model.max_points
    xyz = rng.rand(1, P, 3).astype(np.float32) * np.array(
        [d * model.voxel_size for d in model.voxel_dim], np.float32)
    feats = rng.rand(1, P, model.feature_dim).astype(np.float32)
    valid = np.ones((1, P), bool)
    xyz, feats, valid = (jnp.asarray(xyz), jnp.asarray(feats),
                         jnp.asarray(valid))

    # init detector only (init of the full model is slow and irrelevant)
    from cnrma_tpu.models.fcaf3d import FCAF3DDetector
    detector = FCAF3DDetector(
        n_classes=model.n_classes, n_reg_outs=model.n_reg_outs,
        voxel_size=model.voxel_size_fcaf3d,
        pts_threshold=model.pts_threshold,
        assigner_limit=model.assigner_limit,
        assigner_topk=model.assigner_topk, with_yaw=model.with_yaw,
        nms_pre=model.nms_pre, capacities=model.capacities)
    t0 = time.perf_counter()
    dvars = jax.jit(lambda: detector.init(
        {"params": jax.random.PRNGKey(0)}, xyz, feats, valid,
        train=False))()
    force_ready(dvars)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    import cnrma_tpu.ops.sparse as sp
    from cnrma_tpu.models.fcaf3d import FCAF3DBackboneNet, FCAF3DHeadNet

    def f_voxelize(xyz, feats, valid):
        return jax.vmap(lambda p, f, v: sp.voxelize_points(
            p, f, v, detector.voxel_size,
            detector.capacities.voxelize))(xyz, feats, valid)

    backbone_mod = FCAF3DBackboneNet(depth=detector.depth,
                                     capacities=detector.capacities)
    head_mod = FCAF3DHeadNet(
        n_classes=detector.n_classes, n_reg_outs=detector.n_reg_outs,
        voxel_size=detector.voxel_size,
        pts_threshold=detector.pts_threshold,
        capacities=detector.capacities)

    def _sub(vars_, name):
        return {"params": vars_["params"][name],
                "batch_stats": vars_["batch_stats"][name]}

    def f_backbone(vars_, st):
        return backbone_mod.apply(_sub(vars_, "backbone"), st, False)

    def f_head(vars_, levels):
        return head_mod.apply(_sub(vars_, "head"), levels, False)

    def f_bboxes(vars_, outs):
        return detector.apply(vars_, outs, method=detector.get_bboxes)

    stages = {
        "1_voxelize": jax.jit(f_voxelize),
        "2_backbone": jax.jit(f_backbone),
        "3_neck_head": jax.jit(f_head),
        "4_get_bboxes": jax.jit(f_bboxes),
    }
    timer = StageTimer()
    import contextlib

    @contextlib.contextmanager
    def null(name):
        yield

    def run_all(time_it):
        ctx = timer.stage if time_it else null
        with ctx("1_voxelize"):
            st = stages["1_voxelize"](xyz, feats, valid)
            force_ready(st)
        with ctx("2_backbone"):
            levels = stages["2_backbone"](dvars, st)
            force_ready(levels)
        with ctx("3_neck_head"):
            outs = stages["3_neck_head"](dvars, levels)
            force_ready(outs)
        with ctx("4_get_bboxes"):
            bb = stages["4_get_bboxes"](dvars, outs)
            force_ready(bb)
        return bb

    t0 = time.perf_counter()
    run_all(False)
    print(f"compile+first-run: {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(args.iters):
        run_all(True)
    print(timer.summary())
    total = sum(timer.totals.values()) / max(args.iters, 1)
    print(f"detect total: {total * 1000:.1f} ms")

    # isolated kernel-map builds at this scale's coordinate-set sizes —
    # the searchsorted (or LUT) cost hidden inside backbone/neck above
    st = stages["1_voxelize"](xyz, feats, valid)
    st0 = jax.tree_util.tree_map(lambda x: x[0], st)
    offs = sp.kernel_offsets(3)
    km1 = jax.jit(lambda s: sp.kernel_map(s, offs))
    t = _time_one(km1, st0)
    print(f"kmap stride1 27x{st0.capacity}: {t * 1000:.1f} ms "
          f"(LUT budget {sp.LUT_CELL_BUDGET})", flush=True)
    # synthetic stride-8 tensor at the neck's stride-8 capacity
    cap8 = detector.capacities.neck[0]
    rng8 = np.random.RandomState(1)
    c8 = np.unique((rng8.randint(0, 120, (cap8, 3)) * 8), axis=0)
    k8 = np.asarray(sp.VoxelGrid().pack(jnp.asarray(c8)))
    order = np.argsort(k8)
    pad = cap8 - len(c8)
    keys8 = jnp.asarray(np.concatenate(
        [k8[order], np.full(pad, np.iinfo(np.int32).max, np.int32)]))
    coords8 = jnp.asarray(np.concatenate(
        [c8[order], np.zeros((pad, 3), np.int32)]))
    st8 = sp.SparseTensor(keys=keys8, coords=coords8,
                          feats=jnp.zeros((cap8, 1), jnp.float32),
                          stride=8)
    t = _time_one(km1, st8)
    print(f"kmap stride8 27x{cap8}: {t * 1000:.1f} ms", flush=True)


def _time_one(fn, *args, iters=3):
    from cnrma_tpu.utils.profiling import force_ready
    r = fn(*args)
    force_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    force_ready(r)
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    main()
