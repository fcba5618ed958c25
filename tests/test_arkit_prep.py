"""ARKitScenes annotation-extraction tests (tools/data_prepare/arkit_boxes
+ load_arkit_data) — reference semantics from data_prepare/arkit/
{box_utils,rotation,load_arkit_data}.py."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tools.data_prepare.arkit_boxes import (  # noqa: E402
    box3d_iou, boxes_to_corners_3d, compute_box_3d, corners_to_boxes,
    get_heading_angle, get_size, points_in_boxes)


class TestBoxUtils:
    def test_corners_box_roundtrip(self):
        rng = np.random.RandomState(0)
        boxes = np.concatenate([
            rng.randn(5, 3) * 2,                       # centers
            rng.rand(5, 3) * 2 + 0.3,                  # sizes
            (rng.rand(5, 1) - 0.5) * np.pi], axis=1)   # headings
        corners = boxes_to_corners_3d(boxes)
        back = corners_to_boxes(corners)
        np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-9)
        # heading modulo pi-wrap equivalence not needed in (-pi/2, pi/2)
        np.testing.assert_allclose(back[:, 6], boxes[:, 6], atol=1e-9)

    def test_compute_box_3d_upright(self):
        """obbAligned (axes-rows Rz) -> corners -> box recovers the
        centroid/axesLengths and a heading that round-trips."""
        theta = 0.4
        c, s = np.cos(theta), np.sin(theta)
        N = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        size = [1.2, 0.8, 2.0]
        center = [1.0, -2.0, 0.5]
        corners = compute_box_3d(size, center, N)
        np.testing.assert_allclose(get_size(corners), size, atol=1e-9)
        np.testing.assert_allclose(corners.mean(axis=0), center, atol=1e-9)
        box = corners_to_boxes(corners[None])[0]
        np.testing.assert_allclose(boxes_to_corners_3d(box[None])[0],
                                   corners, atol=1e-9)

    def test_heading_is_clockwise_convention(self):
        """A box whose world x-axis is the local x rotated CCW by theta
        stores heading = +theta in the reference's clockwise convention
        (get_heading_angle, box_utils.py:26-37)."""
        theta = 0.3
        c, s = np.cos(theta), np.sin(theta)
        N = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        corners = compute_box_3d([1, 1, 1], [0, 0, 0], N)
        assert get_heading_angle(corners) == pytest.approx(theta)

    def test_points_in_boxes(self):
        corners = boxes_to_corners_3d(
            np.array([[0, 0, 0, 2, 2, 2, 0.0],
                      [5, 5, 5, 1, 1, 1, np.pi / 4]]))
        pts = np.array([[0, 0, 0], [0.9, 0.9, 0.9], [1.1, 0, 0],
                        [5, 5, 5], [5.6, 5.6, 5.0]])
        mask = points_in_boxes(pts, corners)
        assert mask[:, 0].tolist() == [True, True, False, False, False]
        # corner of the rotated unit box at 45deg reaches sqrt(2)/2~0.707
        # along each diagonal, so (5.6,5.6) (0.85 away) is outside
        assert mask[:, 1].tolist() == [False, False, False, True, False]

    def test_box3d_iou(self):
        b = np.array([[0, 0, 0, 2, 1, 1, 0.3]])
        c1 = boxes_to_corners_3d(b)[0]
        assert box3d_iou(c1, c1) == pytest.approx(1.0, abs=1e-3)
        b2 = np.array([[10, 0, 0, 2, 1, 1, 0.0]])
        assert box3d_iou(c1, boxes_to_corners_3d(b2)[0]) == pytest.approx(
            0.0, abs=1e-6)


def _write_annotation(path, items):
    data = []
    for label, centroid, size, theta in items:
        c, s = np.cos(theta), np.sin(theta)
        N = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        data.append({
            "label": label,
            "uid": f"uid-{len(data)}",
            "segments": {"obbAligned": {
                "centroid": list(centroid),
                "axesLengths": list(size),
                "normalizedAxes": [x for row in N for x in row]}}})
    with open(path, "w") as f:
        json.dump({"skipped": False, "data": data}, f)


class TestLoadArkitData:
    def test_parse_annotation(self, tmp_path):
        from tools.data_prepare.load_arkit_data import parse_annotation
        jf = str(tmp_path / "anno.json")
        _write_annotation(jf, [
            ("chair", (1, 2, 0.5), (0.5, 0.6, 1.0), 0.2),
            ("wild thing", (0, 0, 0), (1, 1, 1), 0.0),   # unknown: dropped
            ("tv monitor", (3, 3, 1), (1.2, 0.2, 0.7), -0.4),
        ])
        arr = parse_annotation(jf)
        assert arr.shape == (2, 8)
        np.testing.assert_allclose(arr[0, :3], [1, 2, 0.5], atol=1e-9)
        np.testing.assert_allclose(arr[0, 3:6], [0.5, 0.6, 1.0], atol=1e-9)
        assert arr[0, 6] == pytest.approx(0.2)
        assert int(arr[0, 7]) == 13          # chair
        assert int(arr[1, 7]) == 15          # tv monitor -> tv_monitor

    def test_export_one_scan(self, tmp_path):
        from tools.data_prepare.load_arkit_data import export_one_scan
        scene = "41069021"
        scan = tmp_path / scene
        scan.mkdir()
        # tiny ascii ply with colors
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [2, 2, 2]],
                         np.float32)
        lines = ["ply", "format ascii 1.0",
                 f"element vertex {len(verts)}",
                 "property float x", "property float y", "property float z",
                 "property uchar red", "property uchar green",
                 "property uchar blue", "end_header"]
        for i, v in enumerate(verts):
            lines.append(f"{v[0]} {v[1]} {v[2]} {i * 10} {i * 20} {i * 30}")
        (scan / f"{scene}_3dod_mesh.ply").write_text("\n".join(lines) + "\n")
        _write_annotation(str(scan / f"{scene}_3dod_annotation.json"),
                          [("bed", (0.5, 0.5, 0.5), (1, 1, 1), 0.0)])
        out = tmp_path / "out"
        out.mkdir()
        ok = export_one_scan(scene, str(scan), str(out / scene),
                             max_num_point=None,
                             rng=np.random.RandomState(0))
        assert ok
        v = np.load(out / f"{scene}_vert.npy")
        assert v.shape == (4, 6)
        np.testing.assert_allclose(v[1], [1, 0, 0, 10, 20, 30])
        bb = np.load(out / f"{scene}_aligned_bbox.npy")
        assert bb.shape == (1, 8)
        assert int(bb[0, 7]) == 4            # bed
        assert (np.load(out / f"{scene}_axis_align_matrix.npy")
                == np.eye(4)).all()
        assert np.load(out / f"{scene}_sem_label.npy").shape == (4,)
