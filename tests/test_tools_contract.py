"""End-to-end contract test for the offline post-processing chain.

Guards the z-convention contract (reference ``post_process/nms_bbox.py:58-66``
-> ``evaluate_bbox.py:63-66``): the raw per-scene dump carries gravity-center
z, ``tools/nms_bbox.py`` must write the NMS survivors UNCHANGED (still
gravity-center), and ``tools/evaluate_bbox.py`` converts once to bottom-z for
``indoor_eval``.  Round-1 bug: the nms tool double-added dz/2, lifting every
prediction half its height above GT.
"""

import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")
sys.path.insert(0, os.path.dirname(TOOLS))


def _write_scene(result_root, gt_dir, scene, boxes_gravity, labels,
                 n_classes=18):
    """Write a raw bbox dump + matching GT npy for one synthetic scene."""
    os.makedirs(os.path.join(result_root, scene), exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    n = len(boxes_gravity)
    scores = np.full((n, n_classes), 0.001, np.float32)
    scores[np.arange(n), labels] = 0.9
    np.savez(os.path.join(result_root, scene, scene + "_bbox_raw.npz"),
             bboxes=boxes_gravity.astype(np.float32), scores=scores)
    # GT npy layout: [cx, cy, cz(gravity), dx, dy, dz, nyu40_cat_id]
    from tools.evaluate_bbox import SCANNET_CAT_IDS
    cats = np.array([SCANNET_CAT_IDS[l] for l in labels], np.float32)
    gt = np.concatenate([boxes_gravity.astype(np.float32),
                         cats[:, None]], axis=1)
    np.save(os.path.join(gt_dir, scene + "_aligned_bbox.npy"), gt)


def _run_chain(tmp_path, monkeypatch):
    from tools import evaluate_bbox, nms_bbox

    result_root = str(tmp_path / "results")
    data_path = str(tmp_path / "data")
    gt_dir = os.path.join(data_path, "scannet_instance_data")

    boxes = np.array([
        [1.0, 1.0, 0.8, 0.8, 0.6, 1.6],   # chair-sized
        [3.5, 1.0, 0.4, 1.6, 2.0, 0.8],   # bed-sized, different height
        [1.0, 4.0, 1.2, 2.0, 0.9, 2.4],   # bookshelf-sized
    ], np.float32)
    labels = np.array([2, 1, 7])
    _write_scene(result_root, gt_dir, "scene0000_00", boxes, labels)

    monkeypatch.setattr(sys, "argv",
                        ["nms_bbox.py", "--result_path", result_root])
    nms_bbox.main()

    monkeypatch.setattr(sys, "argv",
                        ["evaluate_bbox.py", "--dataset", "scannet",
                         "--data_path", data_path,
                         "--result_path", result_root])
    return evaluate_bbox.main(), result_root, boxes


class TestNmsEvalChain:
    def test_perfect_predictions_score_map_1(self, tmp_path, monkeypatch):
        metrics, result_root, boxes = _run_chain(tmp_path, monkeypatch)
        assert metrics["mAP_0.25"] == pytest.approx(1.0)
        assert metrics["mAP_0.50"] == pytest.approx(1.0)

    def test_nms_output_stays_gravity_center(self, tmp_path, monkeypatch):
        _, result_root, boxes = _run_chain(tmp_path, monkeypatch)
        out = np.load(os.path.join(result_root, "scene0000_00",
                                   "scene0000_00_atlas_bbox.npz"))
        # every written box must equal one of the raw gravity-center boxes
        for b in out["boxes"]:
            d = np.abs(boxes - b[None, :6]).max(axis=1)
            assert d.min() < 1e-5, f"box {b} shifted vs raw dump"


class TestInferenceEntry:
    """Drives ``tools/test.py`` (the reference ``test.py`` analog) end to
    end on the synthetic ScanNet fixture with a shrunken model and checks
    it writes every reference-format artifact: ``{scene}.npz`` (TSDF),
    ``{scene}.ply`` (mesh), ``{scene}_bbox_raw.npz`` (boxes + per-class
    scores), and the stage-2 middle dump ``{scene}_vert.npy`` (xyz + 32
    weighted features; reference ``save_middle_result``,
    ``ray_marching.py:959-991``)."""

    @pytest.mark.slow
    def test_writes_reference_artifacts(self, tmp_path):
        import subprocess

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_data import make_synthetic_scannet

        repo = os.path.dirname(TOOLS)
        fix = str(tmp_path / "fix")
        make_synthetic_scannet(fix, n_scenes=1, n_frames=4)
        out_dir = str(tmp_path / "results")
        mid_dir = str(tmp_path / "middle")
        caps = ("{'voxelize':256,'stride2':128,'stride4':64,"
                "'levels':(32,16,8,8),'neck':(64,32,16)}")
        cmd = [
            sys.executable, os.path.join(TOOLS, "test.py"),
            os.path.join(repo, "configs", "ray_marching_scannet.py"),
            "--save-path", out_dir, "--middle-save-path", mid_dir,
            "--max-scenes", "1", "--cfg-options",
            f"data.test.data_root={fix}",
            f"data.test.ann_file={fix}/scannet_infos_train.pkl",
            "data.test.num_frames=4",
            "model.voxel_dim_test=(48,48,32)",
            "data.test.voxel_dim=(48,48,32)",
            "model.ray_samples=16", "model.rays_per_view_cap=256",
            "model.max_points=512",
            "model.detection_head.pts_threshold=256",
            "model.detection_head.test_cfg.nms_pre=16",
            # untrained model -> near-zero predicted TSDF -> NeuS weights
            # all below the production 0.05 threshold; lower it so the
            # middle dump has survivors to assert on
            "model.neus_threshold=1e-4",
            f"model.capacities={caps}",
        ]
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=1500, env=env)
        assert r.returncode == 0, r.stderr[-3000:]
        scene = "scene0000_00"
        sdir = os.path.join(out_dir, scene)
        # TSDF npz: reference container layout
        tsdf = np.load(os.path.join(sdir, scene + ".npz"))
        assert tsdf["tsdf"].shape == (48, 48, 32)
        assert float(tsdf["voxel_size"]) == pytest.approx(0.04)
        # mesh exists and is a ply
        with open(os.path.join(sdir, scene + ".ply"), "rb") as f:
            assert f.read(3) == b"ply"
        # raw bbox dump: [N, 6] boxes + [N, 18] per-class scores
        raw = np.load(os.path.join(sdir, scene + "_bbox_raw.npz"))
        assert raw["bboxes"].ndim == 2 and raw["bboxes"].shape[1] == 6
        assert raw["scores"].shape == (raw["bboxes"].shape[0], 18)
        # middle dump: xyz + 32-dim weighted features
        vert = np.load(os.path.join(mid_dir, scene + "_vert.npy"))
        assert vert.ndim == 2 and vert.shape[1] == 35
        assert vert.shape[0] > 0


class TestMEOffsetOracle:
    def test_enumerations_match_oracle(self):
        """Pin ``ops.sparse.kernel_offsets`` and the decoder's child
        enumeration to the transcribed ME RegionIterator semantics
        (``tools/me_offset_oracle.py``) — the checkpoint converter's
        kernel-row order assumption (``convert_checkpoint.py:14-17``)."""
        from tools.me_offset_oracle import self_check
        self_check()
