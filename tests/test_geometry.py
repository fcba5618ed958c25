import numpy as np
import pytest

from cnrma_tpu.geometry.tsdf import TSDF, coordinates_grid
from cnrma_tpu.geometry.boxes import DepthBoxes
from cnrma_tpu.utils.marching_cubes import marching_cubes
from cnrma_tpu.utils.ply import write_ply_mesh, read_ply


def make_sphere_tsdf(n=32, radius=0.4, voxel_size=0.05, trunc=3):
    """Analytic sphere TSDF centered in the volume.

    Atlas/CN-RMA sign convention (``data_prepare/scannet/tsdf.py``:
    dist = pz - depth): negative in observed empty space, positive behind
    the surface (here: inside the sphere), +1 = unknown.
    """
    origin = np.zeros((1, 3), np.float32)
    idx = coordinates_grid((n, n, n)).astype(np.float32)
    world = idx * voxel_size
    center = np.full((3, 1), n * voxel_size / 2, np.float32)
    dist = radius - np.linalg.norm(world - center, axis=0)
    tsdf = np.clip(dist / (trunc * voxel_size), -1, 1)
    return TSDF(voxel_size, origin, tsdf.reshape(n, n, n))


class TestTSDF:
    def test_save_load_roundtrip(self, tmp_path):
        t = make_sphere_tsdf()
        p = str(tmp_path / "t.npz")
        t.save(p)
        t2 = TSDF.load(p)
        assert t2.voxel_size == t.voxel_size
        np.testing.assert_allclose(t2.origin, t.origin)
        np.testing.assert_allclose(t2.tsdf_vol, t.tsdf_vol)
        # format is reference-compatible: raw npz keys
        with np.load(p) as data:
            assert set(data.keys()) == {"origin", "voxel_size", "tsdf"}

    def test_mesh_sphere(self):
        t = make_sphere_tsdf()
        verts, faces, normals = t.get_mesh()
        assert len(verts) > 100 and len(faces) > 100
        center = np.full(3, 32 * 0.05 / 2)
        r = np.linalg.norm(verts - center, axis=1)
        # the dominant sheet is the true surface at r=0.4; a second interior
        # sheet at the truncation boundary is expected (the reference's
        # unknown->empty replacement closes unknown regions there too)
        near = np.abs(r - 0.4) < 0.05
        assert near.mean() > 0.5
        np.testing.assert_allclose(r[near], 0.4, atol=0.05)

    @pytest.mark.parametrize("angle,origin", [
        (0.0, None), (0.0, [0.1, 0.0, 0.05]), (0.7, [0.2, -0.1, 0.0])])
    def test_transform_matches_torch_grid_sample(self, angle, origin):
        """Golden parity with the reference's torch grid_sample chain
        (``datasets/tsdf.py:117-178``), including its normalize-by-(dim-1)
        + align_corners=False quirk — the transform is deliberately NOT
        identity-preserving."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        t = make_sphere_tsdf()
        T = np.eye(4, dtype=np.float32)
        c, s = np.cos(angle), np.sin(angle)
        T[:2, :2] = [[c, -s], [s, c]]
        voxel_dim = [24, 28, 32]
        ours = t.transform(T, voxel_dim=voxel_dim, origin=origin)

        # replicate the reference computation with torch
        vol = torch.tensor(t.tsdf_vol)
        old_dim = list(vol.shape)
        og = torch.tensor(t.origin if origin is None else
                          np.asarray(origin, np.float32).reshape(1, 3))
        coords = torch.tensor(coordinates_grid(voxel_dim)).float()
        world = coords * t.voxel_size + og.T
        world = torch.cat((world, torch.ones_like(world[:1])), dim=0)
        world = torch.tensor(T)[:3, :] @ world
        coords = (world - torch.tensor(t.origin).T) / t.voxel_size
        coords = 2 * coords / (torch.tensor(old_dim) - 1).view(3, 1) - 1
        coords = coords[[2, 1, 0]].T.view([1] + voxel_dim + [3])
        near = F.grid_sample(vol.view([1, 1] + old_dim), coords,
                             mode="nearest", align_corners=False).squeeze()
        bil = F.grid_sample(vol.view([1, 1] + old_dim), coords,
                            mode="bilinear", align_corners=False).squeeze()
        mask = near.abs() < 1
        ref = near.clone()
        ref[mask] = bil[mask]
        ref[(coords.abs() >= 1).squeeze(0).any(3)] = 1
        np.testing.assert_allclose(ours.tsdf_vol, ref.numpy(), atol=2e-6)

    def test_transform_oob_is_empty(self):
        t = make_sphere_tsdf()
        far = t.transform(np.eye(4), voxel_dim=[8, 8, 8],
                          origin=[100.0, 100.0, 100.0])
        np.testing.assert_allclose(far.tsdf_vol, 1.0)


class TestMarchingCubes:
    def test_plane(self):
        # f = z - 3.5 -> zero surface at z=3.5
        vol = np.broadcast_to(
            (np.arange(8, dtype=np.float32) - 3.5)[None, None, :],
            (8, 8, 8)).copy()
        verts, faces, _ = marching_cubes(vol, 0.0)
        assert len(faces) > 0
        np.testing.assert_allclose(verts[:, 2], 3.5, atol=1e-5)

    def test_empty(self):
        vol = np.ones((8, 8, 8), np.float32)
        verts, faces, _ = marching_cubes(vol, 0.0)
        assert len(verts) == 0 and len(faces) == 0


class TestTSDFFusion:
    def test_two_frame_golden(self):
        """Fuse two 1x1 depth maps down a single voxel column and compare
        against a hand-computed volume following the reference integrate
        rules (tsdf.py:436-446): near-surface (dist > -1) observations
        average with weight; clamped free-space (dist == -1) observations
        are weightless and read out as -1 only when nothing near-surface
        was ever seen; occluded (dist >= 1) observations are skipped."""
        import jax.numpy as jnp
        from cnrma_tpu.geometry.tsdf_fusion import fuse_tsdf

        # camera at origin looking down +z, 1x1 image, unit intrinsics:
        # voxel (0,0,k*0.1) projects to pixel (0,0) with pz = k*0.1
        proj = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]],
                        np.float32)
        projections = jnp.asarray(np.stack([proj, proj]))
        depths = jnp.asarray(np.array([[[0.65]], [[0.45]]], np.float32))
        tsdf, weight = fuse_tsdf(
            depths, projections, jnp.ones(2, bool),
            jnp.zeros(3, jnp.float32), (1, 1, 9), 0.1,
            trunc_ratio=3.0, max_depth=3.0)
        tsdf = np.asarray(tsdf).reshape(-1)
        weight = np.asarray(weight).reshape(-1)
        # hand-computed per z = 0.0 .. 0.8 (trunc margin 0.3):
        #   frame A (d=0.65): dist = clamp((z-0.65)/0.3, -1)
        #   frame B (d=0.45): dist = clamp((z-0.45)/0.3, -1); z=0.8 -> 1.17
        #   occluded (skipped)
        exp_tsdf = np.array([
            1.0,        # z=0.0: pz=0, out of view -> unknown
            -1.0,       # z=0.1: free in both frames -> -1, weight 0
            -0.833333,  # z=0.2: A free, B near
            -0.5,       # z=0.3: A free, B near
            -0.5,       # z=0.4: mean(-0.8333, -0.1667)
            -0.166667,  # z=0.5: mean(-0.5, 0.1667)
            0.166667,   # z=0.6: mean(-0.1667, 0.5)
            0.5,        # z=0.7: mean(0.1667, 0.8333)
            0.5,        # z=0.8: A only (B occluded)
        ], np.float32)
        exp_weight = np.array([0, 0, 1, 1, 2, 2, 2, 2, 1], np.float32)
        np.testing.assert_allclose(tsdf, exp_tsdf, atol=1e-5)
        np.testing.assert_allclose(weight, exp_weight)


class TestPLY:
    def test_roundtrip(self, tmp_path):
        verts = np.random.RandomState(0).rand(10, 3).astype(np.float32)
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        p = str(tmp_path / "m.ply")
        write_ply_mesh(p, verts, faces)
        v2, f2 = read_ply(p)
        np.testing.assert_allclose(v2, verts, atol=1e-6)
        np.testing.assert_array_equal(f2, faces)


class TestDepthBoxes:
    def test_origin_shift_and_gravity_center(self):
        # box with gravity-center origin input
        b = DepthBoxes([[1, 2, 3, 2, 2, 2, 0]], box_dim=7, with_yaw=True,
                       origin=(0.5, 0.5, 0.5))
        np.testing.assert_allclose(b.tensor[0, :3], [1, 2, 2])  # bottom z
        np.testing.assert_allclose(b.gravity_center[0], [1, 2, 3])
        np.testing.assert_allclose(b.volume, [8.0])

    def test_rotate_yaw(self):
        b = DepthBoxes([[1, 0, 0, 2, 1, 1, 0]], box_dim=7, with_yaw=True,
                       origin=(0.5, 0.5, 0))
        b.rotate(np.pi / 2)
        np.testing.assert_allclose(b.tensor[0, :2], [0, 1], atol=1e-6)
        np.testing.assert_allclose(b.tensor[0, 6], np.pi / 2)

    def test_rotate_no_yaw_enclosing(self):
        b = DepthBoxes([[0, 0, 0, 2, 1, 1]], box_dim=6, with_yaw=False)
        b.rotate(np.pi / 2)
        # enclosing box of the rotated 2x1 rect at 90deg = 1x2
        np.testing.assert_allclose(b.tensor[0, 3:5], [1, 2], atol=1e-6)

    def test_flip(self):
        b = DepthBoxes([[1, 2, 0, 1, 1, 1, 0.3]], box_dim=7, with_yaw=True,
                       origin=(0.5, 0.5, 0))
        b.flip("horizontal")
        np.testing.assert_allclose(b.tensor[0, 0], -1)
        np.testing.assert_allclose(b.tensor[0, 6], np.pi - 0.3)
