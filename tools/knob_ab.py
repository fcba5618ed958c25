#!/usr/bin/env python
"""Run the full-scale per-stage profile across the perf-knob matrix.

Each experiment is one subprocess running ``tools/profile_stages.py`` with
a single knob flipped (plus a combined candidate-default run), so wins are
attributable.  All knobs are output-exact by test (see
``doc/performance.md`` "Knobs"); this script only measures speed.

Usage:
    python tools/knob_ab.py [--scale full] [--only rect,lut,...]

Writes per-experiment logs next to --log-dir (default /tmp) and prints a
stage-by-stage comparison table at the end.
"""

import argparse
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

EXPERIMENTS = {
    # NOTE round 4 flipped the winners into the code defaults, so "base"
    # now measures the shipping combo; "r3defaults" restores the old
    # defaults for regression comparison.
    "base": {},
    "r3defaults": {"CNRMA_SPARSE_LUT_BUDGET": "0",
                   "CNRMA_DERIVED_KMAPS": "0",
                   "BENCH_RAY_COARSE": "4",
                   "BENCH_ACCUM_DTYPE": "float32"},
    "raycap98k": {"BENCH_RAYS_CAP": "98304"},
    "rect": {"BENCH_RECT": "24x32"},
    "lut": {"CNRMA_SPARSE_LUT_BUDGET": "67108864"},
    "derived": {"CNRMA_DERIVED_KMAPS": "1"},
    "raycoarse": {"BENCH_RAY_COARSE": "8"},
    "raycompact": {"CNRMA_RAY_COMPACT": "onehot"},
    "bf16accum": {"BENCH_ACCUM_DTYPE": "bfloat16"},
    "all": {"BENCH_RECT": "24x32",
            "CNRMA_SPARSE_LUT_BUDGET": "67108864",
            "CNRMA_DERIVED_KMAPS": "1",
            "BENCH_RAY_COARSE": "8",
            "CNRMA_RAY_COMPACT": "onehot"},
    # stride-2 lattice eligible: 1.07 GB transient table
    "all_bigbudget": {"BENCH_RECT": "24x32",
                      "CNRMA_SPARSE_LUT_BUDGET": "300000000",
                      "CNRMA_DERIVED_KMAPS": "1",
                      "BENCH_RAY_COARSE": "8",
                      "CNRMA_RAY_COMPACT": "onehot"},
    # round-4 TPU A/B winners; round 5 added the Pallas rect gather
    # (BENCH_RECT=32x32 + overflow 0.06) and the Pallas coarse-march
    # lookup (CNRMA_RAY_PALLAS) to the code defaults, so "base" now
    # measures the full shipping combo and "norect"/"raypallas_off"
    # isolate the round-5 wins OFF.
    "winners": {"CNRMA_SPARSE_LUT_BUDGET": "67108864",
                "CNRMA_DERIVED_KMAPS": "1",
                "BENCH_RAY_COARSE": "8",
                "BENCH_ACCUM_DTYPE": "bfloat16"},
    "norect": {"BENCH_RECT": "0x0"},
    # Pallas rect gather (ops/pallas_bp.py): BENCH_RECT shapes that are
    # kernel-eligible auto-route to the Pallas path on TPU.  Kernel
    # microbench (tools/pallas_bp_probe.py): 5.4-8.6 ms/view vs 12.7 ms
    # XLA row gather at the full rung, cheaper at smaller rects — but
    # smaller rects push more near-camera tiles to the overflow row
    # gather, so the sweep varies both rect size and overflow capacity.
    "plrect32x32": {"BENCH_RECT": "32x32"},
    "plrect32x48": {"BENCH_RECT": "32x48"},
    "plrect48x48": {"BENCH_RECT": "48x48"},
    "plrect64x64": {"BENCH_RECT": "64x64"},
    "plrect48x48of10": {"BENCH_RECT": "48x48",
                        "BENCH_OVERFLOW_FRAC": "0.10"},
    # round-5 follow-up: the first sweep showed smaller rects win
    # (32x32 710ms < 32x48 738 < 48x48 797 < row-gather 827) — push
    # smaller, and vary the overflow row-gather capacity that smaller
    # rects lean on harder.
    "plrect24x32": {"BENCH_RECT": "24x32"},
    "plrect16x32": {"BENCH_RECT": "16x32"},
    "plrect24x32of10": {"BENCH_RECT": "24x32",
                        "BENCH_OVERFLOW_FRAC": "0.10"},
    "plrect32x32of02": {"BENCH_RECT": "32x32",
                        "BENCH_OVERFLOW_FRAC": "0.02"},
    "plrect8x32": {"BENCH_RECT": "8x32"},
    "plrect16x32of02": {"BENCH_RECT": "16x32",
                        "BENCH_OVERFLOW_FRAC": "0.02"},
    "plrect16x16": {"BENCH_RECT": "16x16"},
    # exactness-safe overflow capacity: tools/rect_fit_probe.py measured
    # min exact overflow frac 0.062 at full/16x32 (0.02 clips HALF the
    # probed views; 0.05 clips the worst) — of07 is the exact-safe A/B
    "plrect16x32of07": {"BENCH_RECT": "16x32",
                        "BENCH_OVERFLOW_FRAC": "0.07"},
    "plrect32x32of03": {"BENCH_RECT": "32x32",
                        "BENCH_OVERFLOW_FRAC": "0.03"},
    # ray-march coarse pass routed through the pallas_ray one-hot
    # kernel is default-ON on TPU since r5 — isolate its OFF state
    "raypallas_off": {"CNRMA_RAY_PALLAS": "0"},
}

_LINE = re.compile(r"^(\d_\w+): .* ([0-9.]+)ms/call")


def parse_stages(text):
    out = {}
    for ln in text.splitlines():
        m = _LINE.match(ln.strip())
        if m:
            out[m.group(1)] = float(m.group(2))
        if ln.startswith("total:"):
            m2 = re.search(r"([0-9.]+) ms/scene", ln)
            if m2:
                out["total"] = float(m2.group(1))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="full")
    p.add_argument("--only", default="")
    p.add_argument("--timeout", type=int, default=2400)
    p.add_argument("--log-dir", default="/tmp")
    args = p.parse_args()
    names = ([n for n in args.only.split(",") if n] or
             list(EXPERIMENTS))

    results = {}
    for name in names:
        env = dict(os.environ)
        env.update(EXPERIMENTS[name])
        log = os.path.join(args.log_dir, f"knob_ab_{name}.log")
        print(f"=== {name}: {EXPERIMENTS[name] or 'defaults'} -> {log}",
              flush=True)
        with open(log, "w") as f:
            try:
                subprocess.run(
                    [sys.executable,
                     os.path.join(HERE, "profile_stages.py"),
                     "--scale", args.scale],
                    env=env, stdout=f, stderr=subprocess.STDOUT,
                    timeout=args.timeout)
            except subprocess.TimeoutExpired:
                print(f"    {name}: TIMEOUT after {args.timeout}s",
                      flush=True)
        results[name] = parse_stages(open(log).read())
        if results[name]:
            print(f"    {name}: " + "  ".join(
                f"{k}={v:.0f}ms" for k, v in results[name].items()),
                flush=True)

    stages = sorted({k for r in results.values() for k in r})
    if not stages:
        print("no results parsed"); return
    print("\n%-14s" % "experiment" + "".join(f"{s:>14}" for s in stages))
    for name in names:
        row = results.get(name, {})
        print("%-14s" % name + "".join(
            f"{row.get(s, float('nan')):>14.0f}" for s in stages))


if __name__ == "__main__":
    main()
