#!/usr/bin/env python
"""Rect/overflow tile-capacity occupancy probe for the volume gather.

The rect-footprint accumulation (``ops/backproject.py:_accum_impl_rect``)
is EXACT only while each view's tile classes fit their static caps:
``bp_rect_frac`` x n_tiles rect-fit tiles and ``bp_overflow_frac`` x
n_tiles oversized-footprint tiles; beyond-capacity tiles are dropped
(their views' contributions lost).  This probe measures the actual
per-view counts over procedurally varied rooms at a target rung —
interior + exterior camera poses, varying room size/height — so a
shipping (rect, overflow_frac) pair can be chosen with measured margin
(same methodology as ``tools/raycap_probe.py`` for the ray cap).

Usage:
    python tools/rect_fit_probe.py [--scale full] [--rect 16x32]
        [--views 32] [--rooms 8]

Prints per-class max/quantile counts and the minimal fracs that keep
every probed view exact.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


SCALES = {
    "full": dict(voxel_dim=(256, 256, 96), voxel_size=0.04, h=120, w=160),
    "medium": dict(voxel_dim=(192, 192, 80), voxel_size=0.04, h=120,
                   w=160),
}


def look_at(eye, target, up=(0.0, 0.0, 1.0)):
    fwd = np.asarray(target, np.float64) - np.asarray(eye, np.float64)
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    E = np.eye(4)
    E[:3, 0], E[:3, 1], E[:3, 2], E[:3, 3] = right, down, fwd, eye
    return E


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="full", choices=list(SCALES))
    ap.add_argument("--rect", default="16x32")
    ap.add_argument("--tile", type=int, default=8)
    ap.add_argument("--views", type=int, default=32)
    ap.add_argument("--rooms", type=int, default=8)
    args = ap.parse_args()

    cfg = SCALES[args.scale]
    X, Y, Z = cfg["voxel_dim"]
    vs = cfg["voxel_size"]
    h, w = cfg["h"], cfg["w"]
    t = args.tile
    rh, rw = (int(v) for v in args.rect.split("x"))
    n_tiles = (X // t) * (Y // t) * (Z // t)
    # stride-4 intrinsics like the model's scaled projection
    fx = 0.9 * (w * 4) / 4.0
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]])

    rng = np.random.RandomState(0)
    fits_counts, over_counts = [], []

    # numpy re-statement of ops/backproject.py:_project_pixels_tiled
    # (probe-only — keeps the tool independent of the jax backend)
    nx, ny, nz = X // t, Y // t, Z // t
    xs = (np.arange(X) * vs).reshape(nx, 1, 1, t, 1, 1)
    ys = (np.arange(Y) * vs).reshape(1, ny, 1, 1, t, 1)
    zs = (np.arange(Z) * vs).reshape(1, 1, nz, 1, 1, t)
    n_shape = (nx * ny * nz, t * t * t)

    def proj_fn(P):
        cam = [P[k, 0] * xs + P[k, 1] * ys + P[k, 2] * zs + P[k, 3]
               for k in range(3)]
        pz = cam[2]
        inv_z = np.where(pz != 0, 1.0 / np.where(pz != 0, pz, 1.0), 0.0)
        px = np.rint(cam[0] * inv_z).astype(np.int64)
        py = np.rint(cam[1] * inv_z).astype(np.int64)
        valid = ((px >= 0) & (py >= 0) & (px < w) & (py < h) & (pz > 0))
        return (np.clip(px, 0, w - 1).reshape(n_shape),
                np.clip(py, 0, h - 1).reshape(n_shape),
                valid.reshape(n_shape))

    for room in range(args.rooms):
        # room extent inside the grid, origin at 0
        ext = np.array([X * vs, Y * vs, Z * vs])
        scale = 0.5 + 0.5 * rng.rand()          # partially filled rooms
        center = ext * 0.5
        for v in range(args.views):
            ang = 2 * np.pi * (v / args.views) + rng.rand() * 0.2
            r = (0.15 + 0.85 * rng.rand()) * min(ext[0], ext[1]) * \
                0.5 * scale
            eye = center + np.array([r * np.cos(ang), r * np.sin(ang),
                                     (rng.rand() - 0.3) * ext[2] * 0.4])
            tgt = center + (rng.rand(3) - 0.5) * ext * 0.3
            E = look_at(eye, tgt)
            P = (K @ np.linalg.inv(E)[:3]).astype(np.float32)
            px, py, valid = proj_fn(P.astype(np.float64))
            big = 1 << 20
            pxm = np.where(valid, px, big).min(axis=1)
            pxM = np.where(valid, px, -1).max(axis=1)
            pym = np.where(valid, py, big).min(axis=1)
            pyM = np.where(valid, py, -1).max(axis=1)
            pxm = (pxm // 16) * 16
            pym = (pym // 4) * 4
            has = valid.any(axis=1)
            fits = has & (pxM - pxm < rw) & (pyM - pym < rh)
            fits_counts.append(int(fits.sum()))
            over_counts.append(int((has & ~fits).sum()))

    fits_counts = np.array(fits_counts)
    over_counts = np.array(over_counts)

    def stats(a):
        return (f"max {a.max()}  p99 {int(np.quantile(a, 0.99))}  "
                f"median {int(np.median(a))}")

    print(f"scale={args.scale} rect={rh}x{rw} tile={t} "
          f"n_tiles={n_tiles} views={len(fits_counts)}")
    print(f"rect-fit tiles/view:  {stats(fits_counts)}  "
          f"(min exact bp_rect_frac = {fits_counts.max() / n_tiles:.3f})")
    print(f"overflow tiles/view:  {stats(over_counts)}  "
          f"(min exact bp_overflow_frac = "
          f"{over_counts.max() / n_tiles:.3f})")


if __name__ == "__main__":
    main()
