"""Isosurface extraction on the host (replaces skimage marching_cubes_lewiner).

The reference extracts meshes with ``skimage.measure.marching_cubes_lewiner``
(``datasets/tsdf.py:109``).  skimage is not available in this environment, so
we implement vectorized *marching tetrahedra*: each cube is split into 6
tetrahedra around the 0-6 diagonal and each tetrahedron emits 0-2 triangles
with vertices linearly interpolated on edges.  The extracted surface is the
same zero-level set (identical vertex placement on cube edges); only the
triangulation differs from MC, which is irrelevant for the mesh metrics
(``post_process/evaluate_mesh.py``: point-to-surface distances).

Host-side numpy only — mesh extraction is not in the training path.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# Cube corner offsets (x, y, z), corner ids 0..7.
_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], dtype=np.int64)

# 6 tetrahedra sharing the 0-6 cube diagonal (a standard decomposition).
_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
], dtype=np.int64)


def _tet_case_table():
    """case id (4-bit inside mask) -> list of triangles, each 3 edges (i,j).

    Derived from first principles: 1 inside vertex -> 1 triangle; 2 inside ->
    2 triangles (quad); 3 inside -> complement of 1.
    """
    table = [[] for _ in range(16)]
    for case in range(1, 15):
        inside = [i for i in range(4) if case & (1 << i)]
        outside = [i for i in range(4) if not case & (1 << i)]
        if len(inside) == 1:
            i = inside[0]
            j, k, l = outside
            table[case] = [[(i, j), (i, k), (i, l)]]
        elif len(inside) == 3:
            i = outside[0]
            j, k, l = inside
            table[case] = [[(i, j), (i, l), (i, k)]]
        else:
            i, j = inside
            k, l = outside
            table[case] = [
                [(i, k), (i, l), (j, l)],
                [(i, k), (j, l), (j, k)],
            ]
    return table


_CASE_TABLE = _tet_case_table()


def marching_cubes(volume: np.ndarray, level: float = 0.0,
                   mask: np.ndarray | None = None
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract the `level` isosurface of a 3D scalar volume.

    Args:
        volume: [X, Y, Z] float array.
        level: iso value.
        mask: optional [X, Y, Z] bool; cubes with any unmasked corner are
            skipped.

    Returns:
        (vertices [N,3] float32 in voxel index space, faces [M,3] int32,
         normals [N,3] float32 — volume-gradient based, pointing towards
         increasing values).
    """
    volume = np.asarray(volume, dtype=np.float32)
    if volume.ndim != 3 or min(volume.shape) < 2:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
                np.zeros((0, 3), np.float32))
    X, Y, Z = volume.shape

    # corner values for every cube: [8, nx, ny, nz]
    vals = np.stack([
        volume[dx:X - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz]
        for dx, dy, dz in _CORNERS
    ], axis=0)
    inside = vals < level

    any_in = inside.any(axis=0)
    all_in = inside.all(axis=0)
    active = any_in & ~all_in
    if mask is not None:
        m = np.stack([
            mask[dx:X - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz]
            for dx, dy, dz in _CORNERS
        ], axis=0)
        active &= m.all(axis=0)
    idx = np.argwhere(active)  # [Nc, 3] cube base coords
    if len(idx) == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
                np.zeros((0, 3), np.float32))

    cube_vals = vals[:, active]          # [8, Nc]
    cube_in = inside[:, active]          # [8, Nc]
    base = idx.astype(np.float32)        # [Nc, 3]
    corner_pos = base[None, :, :] + _CORNERS[:, None, :].astype(np.float32)

    tris = []
    for tet in _TETS:
        tvals = cube_vals[tet]           # [4, Nc]
        tin = cube_in[tet]               # [4, Nc]
        case = (tin[0].astype(np.int32) | (tin[1] << 1)
                | (tin[2] << 2) | (tin[3] << 3))
        tpos = corner_pos[tet]           # [4, Nc, 3]
        for c in range(1, 15):
            sel = case == c
            if not sel.any():
                continue
            for tri_edges in _CASE_TABLE[c]:
                pts = []
                for (i, j) in tri_edges:
                    va = tvals[i][sel]
                    vb = tvals[j][sel]
                    denom = vb - va
                    t = np.where(np.abs(denom) > 1e-12,
                                 (level - va) / np.where(denom == 0, 1, denom),
                                 0.5)
                    t = np.clip(t, 0.0, 1.0)[:, None]
                    pa = tpos[i][sel]
                    pb = tpos[j][sel]
                    pts.append(pa + t * (pb - pa))
                tris.append(np.stack(pts, axis=1))  # [n, 3, 3]
    if not tris:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
                np.zeros((0, 3), np.float32))
    tri_pts = np.concatenate(tris, axis=0)          # [M, 3, 3]

    # weld duplicate vertices (quantized) so faces share vertices
    flat = tri_pts.reshape(-1, 3)
    key = np.round(flat * 4096.0).astype(np.int64)
    _, first, inv = np.unique(key, axis=0, return_index=True,
                              return_inverse=True)
    verts = flat[first].astype(np.float32)
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    faces = faces[ok]

    normals = _gradient_normals(volume, verts)
    return verts, faces, normals


def _gradient_normals(volume: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Trilinearly-sampled central-difference gradient at vertex positions."""
    gx, gy, gz = np.gradient(volume)
    out = np.empty_like(verts)
    for a, g in enumerate((gx, gy, gz)):
        out[:, a] = _trilinear(g, verts)
    norm = np.linalg.norm(out, axis=1, keepdims=True)
    return (out / np.where(norm > 1e-12, norm, 1.0)).astype(np.float32)


def _trilinear(vol: np.ndarray, pts: np.ndarray) -> np.ndarray:
    X, Y, Z = vol.shape
    p = np.clip(pts, 0, np.array([X - 1, Y - 1, Z - 1], np.float32) - 1e-4)
    p0 = np.floor(p).astype(np.int64)
    f = p - p0
    x0, y0, z0 = p0[:, 0], p0[:, 1], p0[:, 2]
    x1, y1, z1 = (np.minimum(x0 + 1, X - 1), np.minimum(y0 + 1, Y - 1),
                  np.minimum(z0 + 1, Z - 1))
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    c000 = vol[x0, y0, z0]; c100 = vol[x1, y0, z0]
    c010 = vol[x0, y1, z0]; c110 = vol[x1, y1, z0]
    c001 = vol[x0, y0, z1]; c101 = vol[x1, y0, z1]
    c011 = vol[x0, y1, z1]; c111 = vol[x1, y1, z1]
    return ((c000 * (1 - fx) + c100 * fx) * (1 - fy)
            + (c010 * (1 - fx) + c110 * fx) * fy) * (1 - fz) + \
           ((c001 * (1 - fx) + c101 * fx) * (1 - fy)
            + (c011 * (1 - fx) + c111 * fx) * fy) * fz
