#!/usr/bin/env python
"""Per-stage timing of the CN-RMA pipeline on the attached accelerator.

Each stage (2D tower, volume accumulation, 3D U-Net + TSDF head, ray
marching, detection) is jitted separately and timed on realistic shapes, so
optimization effort goes where the time actually is.  The reference has no
profiling at all (SURVEY.md §5).

Usage:  python tools/profile_stages.py [--scale medium|full|small]
                                       [--trace-dir DIR] [--iters N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="medium",
                   choices=["small", "medium", "full"])
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--trace-dir", default=None,
                   help="also capture a jax.profiler trace of one full step")
    args = p.parse_args()

    from cnrma_tpu.utils.comp_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    from bench import build_bench
    from cnrma_tpu.utils.profiling import StageTimer, force_ready, trace

    model, batch = build_bench(args.scale)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}", flush=True)
    t0 = time.perf_counter()
    # jitted init: one cached compile instead of eager per-op dispatch
    variables = jax.jit(lambda: model.init(
        {"params": rng, "sample": rng}, batch, train=False))()
    from cnrma_tpu.utils.profiling import force_ready as _fr
    _fr(variables)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    # ---- stage functions (bound methods via Module.apply method=...) ----
    def f_tower(vars_, batch_):
        return model.apply(vars_, batch_["imgs"], False,
                           method=model.extract_2d)

    def f_volume(vars_, feats, batch_):
        return model.apply(vars_, feats, batch_["projection"],
                           batch_["view_valid"], method=model.build_volume)

    def f_recon(vars_, volume):
        return model.apply(vars_, volume, None, False,
                           method=model.reconstruct)[0]

    def f_raymarch(vars_, feats, batch_, tsdf):
        return model.apply(
            vars_, feats, batch_["projection"], batch_["view_valid"], tsdf,
            batch_["offset"], jax.random.PRNGKey(0),
            method=model.ray_march)

    def f_detect(vars_, xyz, pfeats, pvalid):
        def run(m):
            outs = m.detector(xyz, pfeats, pvalid, train=False)
            return m.detector.get_bboxes(outs)
        return model.apply(vars_, method=run)

    stages = {}
    stages["1_tower2d"] = jax.jit(f_tower)
    stages["2_volume"] = jax.jit(f_volume)
    stages["3_unet_tsdf"] = jax.jit(f_recon)
    stages["4_raymarch"] = jax.jit(f_raymarch)

    timer = StageTimer()

    # sequential: each stage feeds the next
    def run_all(time_it: bool):
        ctx = timer.stage if time_it else _null_stage
        with ctx("1_tower2d"):
            feats = stages["1_tower2d"](variables, batch)
            force_ready(feats)
        with ctx("2_volume"):
            vol, _ = stages["2_volume"](variables, feats, batch)
            force_ready(vol)
        with ctx("3_unet_tsdf"):
            tsdf_out = stages["3_unet_tsdf"](variables, vol)
            force_ready(tsdf_out)
        fine = tsdf_out["scene_tsdf_004"]
        with ctx("4_raymarch"):
            pts = stages["4_raymarch"](variables, feats, batch, fine)
            force_ready(pts)
        xyz = pts.xyz + batch["offset"][:, None, :]
        if "5_detect" not in stages:
            stages["5_detect"] = jax.jit(f_detect)
        with ctx("5_detect"):
            det = stages["5_detect"](variables, xyz, pts.feats, pts.valid)
            force_ready(det)
        return det

    import contextlib

    @contextlib.contextmanager
    def _null_stage(name):
        yield

    t0 = time.perf_counter()
    run_all(time_it=False)   # compile
    print(f"compile+first-run: {time.perf_counter() - t0:.1f}s", flush=True)

    for _ in range(args.iters):
        run_all(time_it=True)
    print(timer.summary())
    total = sum(timer.totals.values()) / max(args.iters, 1)
    print(f"total: {total * 1000:.1f} ms/scene -> "
          f"{1.0 / total:.3f} scenes/sec")

    if args.trace_dir:
        with trace(args.trace_dir):
            run_all(time_it=False)
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
