#!/usr/bin/env python
"""Quantify the ray-march ``rays_per_view_cap`` truncation.

The reference keeps EVERY above-threshold NeuS sample per view
(``ray_marching.py:780-800``, unbounded ``torch.nonzero``); our
static-shape redesign keeps the ``capacity`` highest-weight samples
(``ops/ray_marching.py:_select_topk``).  This probe measures what that
cap actually clips on a procedurally varied family of room TSDFs at the
shipping ScanNet test setting (256x256x96 @ 4 cm, 120x160 rays, 300
samples, threshold 0.05, cap 32768):

* per-view above-threshold sample counts (the reference's dynamic size),
* the fraction of total kept-weight mass the cap preserves.

Run:  python tools/raycap_probe.py [--rooms 8] [--views 6] [--cap 32768]
Exits 0 iff every probed view keeps >= 99% of its weight mass at --cap.
The fast test lane pins the probe's mass accounting at reduced scale
(tests/test_ops.py::TestRayCapProbe); the full-scale verdict that drove
the shipping cap is recorded in doc/performance.md.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

VOXEL_DIM = (256, 256, 96)
VOXEL_SIZE = 0.04
N_SAMPLES = 300
HEIGHT, WIDTH = 120, 160       # 480x640 image at feature stride 4
THRESHOLD = 0.05
TRUNC = 3 * VOXEL_SIZE         # reference trunc_ratio=3 (generate_tsdf)


def _box_sdf(pts, lo, hi):
    """Signed distance to a solid axis-aligned box (negative inside)."""
    center = (lo + hi) / 2
    half = (hi - lo) / 2
    q = np.abs(pts - center) - half
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0.0)
    return outside + inside


def make_room_tsdf(rng, voxel_dim=VOXEL_DIM, voxel_size=VOXEL_SIZE,
                   n_boxes=8):
    """Procedural room: wall/floor/ceiling shell + random solid boxes.

    Returns a [X,Y,Z] float32 TSDF (clamped signed distance / TRUNC),
    mimicking the fused GT/predicted TSDFs the ray march consumes.
    """
    X, Y, Z = voxel_dim
    ext = np.array([X, Y, Z], np.float32) * voxel_size
    xs = (np.arange(X, dtype=np.float32) + 0.5) * voxel_size
    ys = (np.arange(Y, dtype=np.float32) + 0.5) * voxel_size
    zs = (np.arange(Z, dtype=np.float32) + 0.5) * voxel_size
    pts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"),
                   axis=-1).reshape(-1, 3)

    wall = 0.08                               # shell thickness (m)
    solids = [
        (np.array([0, 0, 0], np.float32),                  # floor
         np.array([ext[0], ext[1], wall], np.float32)),
        (np.array([0, 0, ext[2] - wall], np.float32),      # ceiling
         np.array([ext[0], ext[1], ext[2]], np.float32)),
        (np.zeros(3, np.float32),                          # 4 walls
         np.array([wall, ext[1], ext[2]], np.float32)),
        (np.array([ext[0] - wall, 0, 0], np.float32), ext.copy()),
        (np.zeros(3, np.float32),
         np.array([ext[0], wall, ext[2]], np.float32)),
        (np.array([0, ext[1] - wall, 0], np.float32), ext.copy()),
    ]
    for _ in range(n_boxes):                  # furniture-ish clutter
        size = rng.uniform([0.3, 0.3, 0.3], [1.8, 1.8, 1.4])
        lo_xy = rng.uniform([wall + 0.2] * 2,
                            ext[:2] - wall - 0.2 - size[:2])
        lo = np.array([lo_xy[0], lo_xy[1], wall], np.float32)
        solids.append((lo, (lo + size).astype(np.float32)))

    sdf = np.full(pts.shape[0], np.inf, np.float32)
    for lo, hi in solids:
        sdf = np.minimum(sdf, _box_sdf(pts, lo, hi))
    return np.clip(sdf / TRUNC, -1.0, 1.0).reshape(X, Y, Z)


def make_view(rng, voxel_dim=VOXEL_DIM, voxel_size=VOXEL_SIZE,
              height=HEIGHT, width=WIDTH):
    """Random interior camera looking into the room -> [3,4] projection
    at the feature stride (K already divided by 4 like the model does)."""
    ext = np.array(voxel_dim, np.float32) * voxel_size
    pos = rng.uniform([0.6, 0.6, 1.2], [ext[0] - 0.6, ext[1] - 0.6, 1.9])
    target = rng.uniform([0.6, 0.6, 0.3], [ext[0] - 0.6, ext[1] - 0.6,
                                           1.6])
    fwd = target - pos
    n = np.linalg.norm(fwd)
    if n < 0.5:
        fwd = np.array([1.0, 0.0, -0.2])
        n = np.linalg.norm(fwd)
    fwd = fwd / n
    up = np.array([0.0, 0.0, 1.0], np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    # camera-to-world: x right, y down, z forward (OpenCV convention)
    E = np.eye(4, dtype=np.float32)
    E[:3, 0], E[:3, 1], E[:3, 2], E[:3, 3] = right, down, fwd, pos
    f = 577.87 / 4.0                       # ScanNet intrinsics / stride
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                 np.float32)
    return (K @ np.linalg.inv(E)[:3]).astype(np.float32)


def view_cap_stats(tsdf, projection, cap, threshold=THRESHOLD,
                   voxel_dim=VOXEL_DIM, voxel_size=VOXEL_SIZE,
                   height=HEIGHT, width=WIDTH, n_samples=N_SAMPLES):
    """Dense (no skipping, no cap) weight field for one view ->
    {n_above, mass_total, mass_kept_at_cap, frac_kept}."""
    import jax.numpy as jnp
    from cnrma_tpu.ops.ray_marching import (get_ray_parameters,
                                            neus_weights, _sample_tsdf)
    import math

    X, Y, Z = voxel_dim
    HW = height * width
    o, d = get_ray_parameters(jnp.asarray(projection), height, width)
    t_one = math.sqrt(X * X + Y * Y + Z * Z) * voxel_size / n_samples
    ts = jnp.arange(n_samples, dtype=jnp.float32) * t_one
    places = o[None, None, :] + d[:, None, :] * ts[None, :, None]
    vals, valid = _sample_tsdf(jnp.asarray(tsdf),
                               places.reshape(HW * n_samples, 3),
                               jnp.zeros(3, jnp.float32), voxel_size)
    w = neus_weights(vals.reshape(HW, n_samples))
    keep = np.asarray(valid.reshape(HW, n_samples)
                      & (w >= threshold))
    w = np.asarray(jnp.where(keep, w, 0.0)).reshape(-1)
    n_above = int(keep.sum())
    mass_total = float(w.sum())
    if n_above > cap:
        kept = np.partition(w, len(w) - cap)[len(w) - cap:]
        mass_kept = float(kept.sum())
    else:
        mass_kept = mass_total
    frac = mass_kept / mass_total if mass_total > 0 else 1.0
    return {"n_above": n_above, "mass_total": mass_total,
            "mass_kept": mass_kept, "frac_kept": frac}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rooms", type=int, default=8)
    p.add_argument("--views", type=int, default=6)
    p.add_argument("--cap", type=int, default=32768)
    p.add_argument("--boxes", type=int, default=None,
                   help="clutter boxes per room (default: vary 2..14)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms",
                      os.environ.get("JAX_PLATFORMS", "cpu"))

    rng = np.random.default_rng(args.seed)
    all_stats = []
    for ri in range(args.rooms):
        n_boxes = (args.boxes if args.boxes is not None
                   else int(rng.integers(2, 15)))
        tsdf = make_room_tsdf(rng, n_boxes=n_boxes)
        for vi in range(args.views):
            proj = make_view(rng)
            s = view_cap_stats(tsdf, proj, args.cap)
            all_stats.append(s)
            print(f"room {ri} (boxes={n_boxes:2d}) view {vi}: "
                  f"above-threshold {s['n_above']:>7d}  "
                  f"mass kept @cap {args.cap}: {s['frac_kept']:.4%}",
                  flush=True)

    n = np.array([s["n_above"] for s in all_stats])
    f = np.array([s["frac_kept"] for s in all_stats])
    print(f"\nviews: {len(all_stats)}  cap: {args.cap}")
    print(f"above-threshold counts: min {n.min()}  median "
          f"{int(np.median(n))}  max {n.max()}")
    print(f"views over cap: {(n > args.cap).sum()}/{len(n)}")
    print(f"weight-mass kept: min {f.min():.4%}  mean {f.mean():.4%}")
    ok = f.min() >= 0.99
    print("CAP OK (>=99% mass kept on every view)" if ok
          else "CAP INSUFFICIENT (<99% mass kept on some view)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
