#!/usr/bin/env python
"""Cross-stage checkpoint surgery.

Replaces the reference ``data_prepare/combine_models.py`` (:9-132): merge a
stage-1 Atlas (recon) checkpoint and a stage-2 FCAF3DOnly (detector)
checkpoint into one combined CNRMA checkpoint for stage-3 finetuning.

Because all three stages share submodule names in this framework
(``tower2d`` / ``backbone3d`` / ``tsdf_head`` from Atlas, ``detector`` from
FCAF3DOnly), the surgery is a plain subtree merge — no key remapping
between repos needed.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def load_tree(path):
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--recon", required=True,
                   help="stage-1 Atlas checkpoint dir")
    p.add_argument("--detector", required=True,
                   help="stage-2 FCAF3DOnly checkpoint dir")
    p.add_argument("--output", required=True)
    args = p.parse_args()

    import orbax.checkpoint as ocp

    recon = load_tree(args.recon)
    det = load_tree(args.detector)

    merged = {"step": 0, "opt_state": None, "params": {}, "batch_stats": {}}
    for col in ("params", "batch_stats"):
        out = dict(recon.get(col, {}))
        for key in ("detector",):
            if key in det.get(col, {}):
                out[key] = det[col][key]
        merged[col] = out
    missing = [k for k in ("tower2d", "backbone3d", "tsdf_head",
                           "detector") if k not in merged["params"]]
    if missing:
        print(f"warning: combined checkpoint missing subtrees: {missing}")

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(args.output),
                   {"params": merged["params"],
                    "batch_stats": merged["batch_stats"]})
    print("wrote", args.output)


if __name__ == "__main__":
    main()
