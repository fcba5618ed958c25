import os
import pickle

import numpy as np
import pytest
from PIL import Image

from cnrma_tpu.data import transforms as T
from cnrma_tpu.data.loader import SceneLoader, collate_scenes
from cnrma_tpu.data.scannet import AtlasScanNetDataset
from cnrma_tpu.geometry.boxes import DepthBoxes
from cnrma_tpu.geometry.tsdf import TSDF


def make_synthetic_scannet(root, n_scenes=2, n_frames=6):
    """Write a minimal ScanNet-layout dataset (reference on-disk formats)."""
    rng = np.random.RandomState(0)
    infos = []
    for s in range(n_scenes):
        scene = f"scene{s:04d}_00"
        posed = os.path.join(root, "posed_images", scene)
        os.makedirs(posed, exist_ok=True)
        K = np.array([[600.0, 0, 648], [0, 600.0, 484], [0, 0, 1]])
        np.savetxt(os.path.join(posed, "intrinsic.txt"),
                   np.pad(K, ((0, 1), (0, 1))), delimiter=" ")
        ids = []
        for i in range(n_frames):
            fid = str(i).zfill(5)
            Image.fromarray(
                rng.randint(0, 255, (968, 1296, 3), np.uint8)).save(
                os.path.join(posed, fid + ".jpg"))
            # camera above the voxel grid looking straight down so rays
            # actually traverse the volume (x right, y flipped, -z view)
            pose = np.eye(4)
            pose[:3, :3] = np.diag([1.0, -1.0, -1.0])
            pose[:3, 3] = [1.0 + 0.02 * i, 1.0, 2.5]
            np.savetxt(os.path.join(posed, fid + ".txt"), pose)
            ids.append(i)
        tsdf_dir = os.path.join(root, "atlas_tsdf", scene)
        os.makedirs(tsdf_dir, exist_ok=True)
        for k, vs in ((4, 0.04), (8, 0.08), (16, 0.16)):
            dim = (64 * 4 // k, 64 * 4 // k, 32 * 4 // k)
            np.savez_compressed(
                os.path.join(tsdf_dir, f"tsdf_{str(k).zfill(2)}.npz"),
                origin=np.zeros((1, 3), np.float32), voxel_size=vs,
                tsdf=rng.rand(*dim).astype(np.float32) * 2 - 1)
        infos.append({
            "scene": scene,
            "total_image_ids": ids,
            "annos": {
                "gt_num": 2,
                "gt_boxes_upright_depth": np.array(
                    [[1, 1, 0.5, 1, 1, 1], [2, 2, 0.5, 1, 1, 1]],
                    np.float32),
                "class": np.array([3, 5]),
                "axis_align_matrix": np.eye(4, dtype=np.float32),
            }})
    ann = os.path.join(root, "scannet_infos_train.pkl")
    with open(ann, "wb") as f:
        pickle.dump(infos, f)
    return ann


class TestTransforms:
    def test_resize_rescales_intrinsics(self):
        img = Image.new("RGB", (1296, 968))
        K = np.array([[600.0, 0, 648], [0, 600.0, 484], [0, 0, 1]],
                     np.float32)
        arr, k2 = T.resize_image(img, K, (640, 480))
        assert arr.shape == (480, 640, 3)
        # after the 968->972 pad, cy becomes 486 then scales by 480/972
        np.testing.assert_allclose(k2[0, 0], 600 * 640 / 1296, rtol=1e-5)
        np.testing.assert_allclose(k2[1, 2], 486 * 480 / 972, rtol=1e-5)

    def test_projection_from(self):
        K = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]],
                     np.float32)
        E = np.eye(4, dtype=np.float32)
        E[:3, 3] = [1, 2, 3]
        P = T.projection_from(K, E)
        assert P.shape == (3, 4)
        # projecting the camera center gives zero depth
        c = P @ np.array([1, 2, 3, 1.0])
        np.testing.assert_allclose(c[2], 0, atol=1e-5)

    def test_select_frames_unit(self):
        ids = T.select_frames(list(range(100)), 10, "unit")
        assert len(ids) == 10
        assert ids == sorted(ids)

    def test_space_transform_detection_modes(self):
        tsdf_dict = {
            f"tsdf_gt_{k}": TSDF(vs, np.array([[1.0, 2.0, 0.0]]),
                                 np.random.RandomState(0).rand(
                                     64 // f, 64 // f, 32 // f) * 2 - 1)
            for k, vs, f in (("004", 0.04, 1), ("008", 0.08, 2),
                             ("016", 0.16, 4))}
        boxes = DepthBoxes(np.array([[1, 1, 0.5, 1, 1, 1]], np.float32),
                           box_dim=6, with_yaw=False,
                           origin=(0.5, 0.5, 0.5))
        ext = [np.eye(4, dtype=np.float32)]
        new_ext, new_tsdf, new_boxes, offset = T.space_transform_detection(
            ext, tsdf_dict, boxes, (48, 48, 32), test=True, mode="origin")
        assert new_tsdf["tsdf_gt_004"].tsdf_vol.shape == (48, 48, 32)
        assert new_tsdf["tsdf_gt_008"].tsdf_vol.shape == (24, 24, 16)
        # test mode: boxes unchanged, offset restores world frame
        np.testing.assert_allclose(new_boxes.tensor, boxes.tensor)
        # origin mode: t = floor(.5/vs)*vs - origin = 0.48 - [1,2,0]
        np.testing.assert_allclose(offset, [1 - 0.48, 2 - 0.48, -0.48],
                                   atol=1e-6)

    def test_space_transform_train_translates_boxes(self):
        tsdf_dict = {
            f"tsdf_gt_{k}": TSDF(vs, np.zeros((1, 3)),
                                 np.zeros((64 // f, 64 // f, 32 // f)))
            for k, vs, f in (("004", 0.04, 1), ("008", 0.08, 2),
                             ("016", 0.16, 4))}
        boxes = DepthBoxes(np.array([[1, 1, 0.5, 1, 1, 1]], np.float32),
                           box_dim=6, with_yaw=False,
                           origin=(0.5, 0.5, 0.5))
        _, _, new_boxes, offset = T.space_transform_detection(
            [np.eye(4, dtype=np.float32)], tsdf_dict, boxes,
            (48, 48, 32), test=False, mode="middle")
        np.testing.assert_allclose(offset, [0, 0, 0])
        assert not np.allclose(new_boxes.tensor[:, :3],
                               boxes.tensor[:, :3])


class TestScanNetDataset:
    def test_load_and_pack(self, tmp_path):
        root = str(tmp_path)
        ann = make_synthetic_scannet(root)
        ds = AtlasScanNetDataset(
            data_root=root, ann_file=ann, num_frames=4,
            voxel_dim=(48, 48, 32), test_mode=False, seed=0,
            max_gt_boxes=8)
        assert len(ds) == 2
        s = ds[0]
        assert s["imgs"].shape == (4, 480, 640, 3)
        assert s["projection"].shape == (4, 3, 4)
        assert s["view_valid"].all()
        assert s["tsdf_gt_004"].shape == (48, 48, 32)
        assert s["tsdf_gt_016"].shape == (12, 12, 8)
        assert s["gt_valid"].sum() == 2
        # gravity z = bottom + h/2
        np.testing.assert_allclose(s["gt_boxes"][0, 5], 1.0)

    def test_recon_random_mode(self, tmp_path):
        """Stage-1 pretrain path (reference atlas_transforms.py:132-205):
        space_mode='recon_random' must dispatch to the recon transform
        (round-1 bug: it raised ValueError)."""
        root = str(tmp_path)
        ann = make_synthetic_scannet(root)
        ds = AtlasScanNetDataset(
            data_root=root, ann_file=ann, num_frames=4,
            voxel_dim=(48, 48, 32), test_mode=False, seed=0,
            space_mode="recon_random",
            recon_pipeline=dict(random_rotation=True,
                                random_translation=True,
                                padding_xy=0.2, padding_z=0.1))
        s = ds[0]
        assert s["imgs"].shape == (4, 480, 640, 3)
        assert s["tsdf_gt_004"].shape == (48, 48, 32)
        assert s["tsdf_gt_016"].shape == (12, 12, 8)
        assert np.isfinite(s["offset"]).all()
        # two draws with an rng differ (random rotation/translation applied)
        s2 = ds[0]
        assert not np.allclose(s["offset"], s2["offset"])

    def test_recon_test_mode(self, tmp_path):
        """space_mode='recon_test' -> deterministic half-meter-aligned
        shift (reference atlas_transforms.py:207-227)."""
        root = str(tmp_path)
        ann = make_synthetic_scannet(root)
        ds = AtlasScanNetDataset(
            data_root=root, ann_file=ann, num_frames=4,
            voxel_dim=(48, 48, 32), test_mode=True, seed=0,
            space_mode="recon_test")
        s = ds[0]
        assert s["tsdf_gt_004"].shape == (48, 48, 32)
        s2 = ds[0]
        np.testing.assert_allclose(s["offset"], s2["offset"])

    def test_loader_batching(self, tmp_path):
        root = str(tmp_path)
        ann = make_synthetic_scannet(root)
        ds = AtlasScanNetDataset(
            data_root=root, ann_file=ann, num_frames=4,
            voxel_dim=(48, 48, 32), seed=0)
        loader = SceneLoader(ds, batch_size=2, num_workers=2)
        batches = list(loader)
        assert len(batches) == 1
        b = batches[0]
        assert b["imgs"].shape == (2, 4, 480, 640, 3)
        assert b["tsdf_list"]["tsdf_gt_004"].shape == (2, 48, 48, 32)
        assert b["scene"] == ["scene0000_00", "scene0001_00"]


class TestIndoorEval:
    def test_perfect_predictions(self):
        from cnrma_tpu.eval.indoor_eval import indoor_eval
        gt = [{"gt_boxes": np.array([[0, 0, 0, 1, 1, 1],
                                     [3, 3, 0, 1, 1, 1]], np.float32),
               "labels": np.array([0, 1])}]
        res = [{"boxes": np.array([[0, 0, 0, 1, 1, 1],
                                   [3, 3, 0, 1, 1, 1]], np.float32),
                "scores": np.array([0.9, 0.8]),
                "labels": np.array([0, 1])}]
        m = indoor_eval(gt, res, iou_thrs=(0.25,), logger=None)
        assert m["mAP_0.25"] == pytest.approx(1.0)

    def test_false_positive_lowers_ap(self):
        from cnrma_tpu.eval.indoor_eval import indoor_eval
        gt = [{"gt_boxes": np.array([[0, 0, 0, 1, 1, 1]], np.float32),
               "labels": np.array([0])}]
        res = [{"boxes": np.array([[5, 5, 5, 1, 1, 1],
                                   [0, 0, 0, 1, 1, 1]], np.float32),
                "scores": np.array([0.95, 0.9]),
                "labels": np.array([0, 0])}]
        m = indoor_eval(gt, res, iou_thrs=(0.25,), logger=None)
        assert 0 < m["mAP_0.25"] < 1.0


class TestMeshEval:
    def test_identical_clouds(self):
        from cnrma_tpu.eval.mesh_eval import eval_mesh_metrics
        pts = np.random.RandomState(0).rand(500, 3).astype(np.float32)
        m = eval_mesh_metrics(pts, pts)
        assert m["fscore"] == pytest.approx(1.0)
        assert m["dist1"] < 0.02   # within downsample voxel

    def test_offset_clouds(self):
        from cnrma_tpu.eval.mesh_eval import eval_mesh_metrics
        pts = np.random.RandomState(0).rand(500, 3).astype(np.float32)
        far = pts + 1.0
        m = eval_mesh_metrics(pts, far)
        assert m["fscore"] < 0.2

    def test_native_voxel_downsample_matches_numpy(self):
        from cnrma_tpu.eval.mesh_eval import voxel_downsample
        from cnrma_tpu.utils import native
        pts = np.random.RandomState(0).rand(1000, 3).astype(np.float32)
        out = voxel_downsample(pts, 0.1)
        # same number of occupied voxels regardless of backend
        keys = np.unique(np.floor(pts / 0.1).astype(np.int64), axis=0)
        assert len(out) == len(keys)


class TestConfigBuilder:
    def test_load_reference_configs(self):
        from cnrma_tpu.core.config import Config
        from cnrma_tpu.core.builder import build_model
        cfg = Config.fromfile("configs/ray_marching_scannet.py")
        model = build_model(cfg, mode="train")
        assert model.voxel_dim == (192, 192, 80)
        assert model.n_classes == 18
        assert not model.with_yaw
        model_t = build_model(cfg, mode="test")
        assert model_t.voxel_dim == (256, 256, 96)

        cfg_a = Config.fromfile("configs/ray_marching_arkit.py")
        model_a = build_model(cfg_a, mode="test")
        assert model_a.with_yaw and model_a.n_reg_outs == 8
        assert model_a.voxel_dim == (192, 192, 80)

    def test_cfg_options_merge(self):
        from cnrma_tpu.core.config import Config
        cfg = Config.fromfile("configs/ray_marching_scannet.py")
        cfg.merge_from_options({"model.voxel_size": "0.02",
                                "total_epochs": "7"})
        assert cfg.model["voxel_size"] == 0.02
        assert cfg.total_epochs == 7

    def test_fcaf3d_only_config(self):
        from cnrma_tpu.core.config import Config
        from cnrma_tpu.core.builder import build_model
        cfg = Config.fromfile("configs/fcaf3d_middle_scannet.py")
        model = build_model(cfg)
        assert model.n_classes == 18


class TestVisualizeTools:
    def test_generate_gt_writes_npz_schema(self, tmp_path):
        import sys
        sys.path.insert(0, "tools")
        from visualize_results import generate_gt, box_corners

        scene = "scene0000_00"
        (tmp_path / "results" / scene).mkdir(parents=True)
        gt_dir = tmp_path / "gt"
        gt_dir.mkdir()
        arr = np.array([[1.0, 2.0, 0.5, 1.0, 1.0, 1.0, 0.0, 3],
                        [0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.2, 5]],
                       np.float32)
        np.save(gt_dir / f"{scene}_aligned_bbox.npy", arr)
        generate_gt(str(tmp_path / "results"), str(gt_dir), "_gt_bbox")
        out = np.load(tmp_path / "results" / scene
                      / f"{scene}_gt_bbox.npz")
        assert out["boxes"].shape == (2, 7)
        np.testing.assert_allclose(out["scores"], 1.0)
        assert list(out["labels"]) == [3, 5]
        # corners helper: unit box at origin spans +-0.5 in xy, 0..1 in z
        c = box_corners(np.array([0, 0, 0, 1, 1, 1, 0.0]))
        assert c.shape == (8, 3)
        np.testing.assert_allclose(sorted(set(c[:, 2])), [0.0, 1.0])
