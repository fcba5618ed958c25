import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnrma_tpu.models.resnet_fpn import ResNetFPN2D
from cnrma_tpu.models.unet3d import UNet3D
from cnrma_tpu.models.tsdf_head import TSDFHead
from cnrma_tpu.models.fcaf3d import (
    DetectionCapacities, FCAF3DDetector, decode_bbox)
from cnrma_tpu.models.assigner import compute_centerness, fcaf3d_assign


class Test2DTower:
    def test_shapes_and_stride(self):
        model = ResNetFPN2D()
        x = jnp.zeros((2, 64, 96, 3))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(vars_, x, train=False)
        assert out.shape == (2, 16, 24, 32)   # stride 4, 32 channels

    def test_train_updates_batch_stats(self):
        model = ResNetFPN2D()
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
        out, mutated = model.apply(vars_, x, train=True,
                                   mutable=["batch_stats"])
        assert out.shape == (2, 8, 8, 32)
        # unfrozen stage stats moved; frozen stem stats untouched
        old = vars_["batch_stats"]["resnet"]["res5_block0"]["conv1"]["norm"]
        new = mutated["batch_stats"]["resnet"]["res5_block0"]["conv1"][
            "norm"]
        assert not np.allclose(np.asarray(old["mean"]),
                               np.asarray(new["mean"]))
        stem_old = vars_["batch_stats"]["resnet"]["stem"]["norm"]
        stem_new = mutated["batch_stats"]["resnet"]["stem"]["norm"]
        np.testing.assert_array_equal(np.asarray(stem_old["mean"]),
                                      np.asarray(stem_new["mean"]))


class TestUpsampleLinear:
    def test_shift_kernel_matches_resize(self):
        # factor-2 path is the shift-based kernel (layers.py:_up2_linear_axis,
        # shipped for its cheaper backward); must equal
        # jax.image.resize('linear') half-pixel semantics bit-for-fp32.
        from cnrma_tpu.models.layers import upsample_linear
        rng = np.random.RandomState(0)
        for shape in [(1, 5, 7, 3), (2, 4, 6, 8, 5), (1, 1, 1, 1, 2)]:
            x = jnp.asarray(rng.randn(*shape).astype(np.float32))
            got = upsample_linear(x, 2)
            new = tuple(s * 2 for s in shape[1:-1])
            want = jax.image.resize(
                x, (shape[0],) + new + (shape[-1],), "linear")
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5)

    def test_grad_matches_resize(self):
        from cnrma_tpu.models.layers import upsample_linear
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 6, 4, 3))
        g1 = jax.grad(lambda v: jnp.sum(jnp.sin(upsample_linear(v, 2))))(x)
        g2 = jax.grad(lambda v: jnp.sum(jnp.sin(jax.image.resize(
            v, (1, 8, 12, 8, 3), "linear"))))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-5)


class TestUNet3D:
    def test_multiscale_outputs(self):
        model = UNet3D(channels=(8, 16, 32, 64), layers_down=(1, 1, 1, 1),
                       layers_up=(1, 1, 1))
        x = jnp.zeros((1, 16, 16, 8, 8))
        vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
        outs = model.apply(vars_, x, train=False)
        assert len(outs) == 3
        assert outs[0].shape == (1, 4, 4, 2, 32)    # 1/4
        assert outs[1].shape == (1, 8, 8, 4, 16)    # 1/2
        assert outs[2].shape == (1, 16, 16, 8, 8)   # 1/1

    def test_zero_init_residual_identity(self):
        model = UNet3D(channels=(4, 8), layers_down=(1, 1),
                       layers_up=(1,))
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8, 4))
        vars_ = model.init(jax.random.PRNGKey(1), x, train=False)
        # bn2 zero-scale => block output == relu(identity) at init
        bn2 = vars_["params"]["down0_block0"]["bn2"]
        np.testing.assert_array_equal(np.asarray(bn2["scale"]), 0.0)


class TestTSDFHead:
    def _make(self):
        head = TSDFHead(input_channels=(4, 8, 16), voxel_size=0.04)
        xs = [jnp.ones((1, 4, 4, 2, 16)), jnp.ones((1, 8, 8, 4, 8)),
              jnp.ones((1, 16, 16, 8, 4))]
        return head, xs

    def test_output_keys_and_ranges(self):
        head, xs = self._make()
        vars_ = head.init(jax.random.PRNGKey(0), xs)
        out, losses = head.apply(vars_, xs)
        assert set(out) == {"scene_tsdf_016", "scene_tsdf_008",
                            "scene_tsdf_004"}
        assert out["scene_tsdf_004"].shape == (1, 16, 16, 8)
        assert float(jnp.abs(out["scene_tsdf_016"]).max()) <= 1.05

    def test_losses_with_targets(self):
        head, xs = self._make()
        targets = {
            "tsdf_gt_016": jnp.zeros((1, 4, 4, 2)),
            "tsdf_gt_008": jnp.zeros((1, 8, 8, 4)),
            "tsdf_gt_004": jnp.zeros((1, 16, 16, 8)),
        }
        vars_ = head.init(jax.random.PRNGKey(0), xs, targets)
        out, losses = head.apply(vars_, xs, targets)
        assert set(losses) == {"tsdf_loss_016", "tsdf_loss_008",
                               "tsdf_loss_004"}
        for v in losses.values():
            assert np.isfinite(float(v))

    def test_sparsification_clamps(self):
        head = TSDFHead(input_channels=(4, 8, 16), voxel_size=0.04,
                        sparse_threshold=(0.0, 0.0, 0.0))  # everything far
        xs = [jnp.ones((1, 2, 2, 2, 16)), jnp.ones((1, 4, 4, 4, 8)),
              jnp.ones((1, 8, 8, 8, 4))]
        vars_ = head.init(jax.random.PRNGKey(0), xs)
        out, _ = head.apply(vars_, xs)
        # with threshold 0 nothing is near-surface -> finer scales clamped
        assert np.allclose(np.abs(np.asarray(out["scene_tsdf_008"])),
                           0.999)


class TestAssigner:
    def _points_grid(self, n=6, spacing=0.5):
        g = np.arange(n) * spacing
        pts = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                       -1).reshape(-1, 3)
        return jnp.asarray(pts.astype(np.float32))

    def test_inside_box_assignment(self):
        pts = self._points_grid()
        p = pts.shape[0]
        boxes = jnp.array([[1.25, 1.25, 1.25, 1.6, 1.6, 1.6, 0.0]])
        res = fcaf3d_assign(
            pts, jnp.zeros((p,), jnp.int32), jnp.ones((p,), bool),
            boxes, jnp.array([3], jnp.int32), jnp.array([True]),
            n_scales=1, limit=1, topk=200)  # topk > #inside: no cap
        labels = np.asarray(res.labels)
        inside = (np.abs(np.asarray(pts) - 1.25) < 0.8).all(1)
        assert (labels[inside] == 3).all()
        assert (labels[~inside] == -1).all()

    def test_rotated_box_membership(self):
        # thin box rotated 45deg: point on the rotated long axis is inside,
        # same point is outside the unrotated box.  (Two extra far points
        # supply the strictly-greater topk threshold — with a single
        # candidate the reference's `centerness > kth` also assigns none.)
        # NOTE the reference's derotation (mmdet3d-0.15
        # ``rotation_3d_in_axis``) applies the TRANSPOSED rotation matrix,
        # so for yaw=+45deg the box's long (w, x) axis lies along the
        # (+x,-y) diagonal — verified bit-for-bit against the reference's
        # own torch assigner by tools/detection_parity.py.
        pts = jnp.array([[0.7, -0.7, 0.0], [9.0, 9.0, 9.0],
                         [-9.0, -9.0, -9.0]])
        mk = lambda yaw: jnp.array([[0, 0, 0, 2.4, 0.4, 1.0, yaw]])
        common = dict(n_scales=1, limit=1, topk=5)
        sid = jnp.zeros((3,), jnp.int32)
        ok = jnp.ones((3,), bool)
        res_rot = fcaf3d_assign(pts, sid, ok, mk(np.pi / 4),
                                jnp.array([1], jnp.int32),
                                jnp.array([True]), **common)
        res_axis = fcaf3d_assign(pts, sid, ok, mk(0.0),
                                 jnp.array([1], jnp.int32),
                                 jnp.array([True]), **common)
        assert int(res_rot.labels[0]) == 1
        assert int(res_axis.labels[0]) == -1

    def test_topk_limits_positives(self):
        pts = self._points_grid(8, 0.25)
        p = pts.shape[0]
        boxes = jnp.array([[0.875, 0.875, 0.875, 1.8, 1.8, 1.8, 0.0]])
        res = fcaf3d_assign(
            pts, jnp.zeros((p,), jnp.int32), jnp.ones((p,), bool),
            boxes, jnp.array([0], jnp.int32), jnp.array([True]),
            n_scales=1, limit=1, topk=5)
        assert (np.asarray(res.labels) >= 0).sum() <= 5

    def test_no_boxes_all_background(self):
        pts = self._points_grid()
        p = pts.shape[0]
        res = fcaf3d_assign(
            pts, jnp.zeros((p,), jnp.int32), jnp.ones((p,), bool),
            jnp.zeros((1, 7)), jnp.zeros((1,), jnp.int32),
            jnp.array([False]), n_scales=1, limit=1, topk=5)
        assert (np.asarray(res.labels) == -1).all()

    def test_centerness_center_is_one(self):
        c = compute_centerness(*[jnp.array([1.0])] * 6)
        np.testing.assert_allclose(float(c[0]), 1.0, atol=1e-6)


class TestDecodeBBox:
    def test_6dof(self):
        pts = jnp.array([[1.0, 2.0, 3.0]])
        pred = jnp.array([[0.5, 1.5, 1.0, 1.0, 0.25, 0.75]])
        box = np.asarray(decode_bbox(pts, pred))
        np.testing.assert_allclose(box[0],
                                   [1.5, 2.0, 3.25, 2.0, 2.0, 1.0])

    def test_fcaf3d_yaw_roundtrip(self):
        # zero angle: p6=0 => alpha=0, q=1 => w = l = scale/2
        pts = jnp.array([[0.0, 0.0, 0.0]])
        pred = jnp.array([[1.0, 1.0, 1.0, 1.0, 0.5, 0.5, 0.0, 0.0]])
        box = np.asarray(decode_bbox(pts, pred, "fcaf3d"))
        np.testing.assert_allclose(box[0], [0, 0, 0, 2, 2, 1, 0],
                                   atol=1e-6)


class TestFCAF3DDetector:
    def _toy_scene(self, key, p=256):
        k1, k2 = jax.random.split(key)
        pts = jax.random.uniform(k1, (1, p, 3)) * 2.0
        feats = jax.random.normal(k2, (1, p, 8)) * 0.1
        valid = jnp.ones((1, p), bool)
        return pts, feats, valid

    def test_forward_and_loss(self):
        det = FCAF3DDetector(n_classes=4, n_reg_outs=6, voxel_size=0.05,
                             pts_threshold=1000, assigner_limit=3,
                             assigner_topk=4, nms_pre=32,
                             capacities=DetectionCapacities.tiny())
        pts, feats, valid = self._toy_scene(jax.random.PRNGKey(0))
        vars_ = jax.jit(lambda: det.init(
            jax.random.PRNGKey(1), pts, feats, valid, train=False))()
        outs = jax.jit(lambda v: det.apply(
            v, pts, feats, valid, train=False))(vars_)
        assert len(outs) == 4
        gt_boxes = jnp.array([[[1.0, 1.0, 1.0, 0.8, 0.8, 0.8, 0.0]]])
        gt_labels = jnp.array([[2]], jnp.int32)
        gt_valid = jnp.array([[True]])
        losses = det.loss(outs, gt_boxes, gt_labels, gt_valid)
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
        assert float(losses["loss_cls"]) > 0

    def test_get_bboxes_shapes(self):
        det = FCAF3DDetector(n_classes=4, n_reg_outs=6, voxel_size=0.05,
                             pts_threshold=1000, nms_pre=16,
                             capacities=DetectionCapacities.tiny())
        pts, feats, valid = self._toy_scene(jax.random.PRNGKey(2))
        vars_ = jax.jit(lambda: det.init(
            jax.random.PRNGKey(1), pts, feats, valid, train=False))()
        outs = jax.jit(lambda v: det.apply(
            v, pts, feats, valid, train=False))(vars_)
        bboxes, scores, bvalid = det.get_bboxes(outs)
        assert bboxes.shape[0] == 1 and bboxes.shape[2] == 6
        assert scores.shape[2] == 4
        assert bboxes.shape[1] == scores.shape[1] == bvalid.shape[1]

    @pytest.mark.slow
    def test_bf16_compute_close_to_f32(self):
        """compute_dtype=bfloat16 runs the sparse stack in bf16 (MXU fast
        path) but must track the fp32 result closely: fp32 accumulation,
        fp32 norm statistics, fp32 head math."""
        kw = dict(n_classes=4, n_reg_outs=6, voxel_size=0.05,
                  pts_threshold=1000, assigner_limit=3, assigner_topk=4,
                  nms_pre=32, capacities=DetectionCapacities.tiny())
        det32 = FCAF3DDetector(**kw)
        det16 = FCAF3DDetector(compute_dtype=jnp.bfloat16, **kw)
        pts, feats, valid = self._toy_scene(jax.random.PRNGKey(3))
        vars_ = det32.init(jax.random.PRNGKey(1), pts, feats, valid,
                           train=False)
        o32 = jax.jit(lambda v: det32.apply(
            v, pts, feats, valid, train=False))(vars_)
        o16 = jax.jit(lambda v: det16.apply(
            v, pts, feats, valid, train=False))(vars_)
        for a, b in zip(o32, o16):
            assert a.cls_scores.dtype == b.cls_scores.dtype == jnp.float32
            np.testing.assert_array_equal(np.asarray(a.valid),
                                          np.asarray(b.valid))
            m = np.asarray(a.valid)
            d = np.abs(np.asarray(a.cls_scores) - np.asarray(b.cls_scores))
            scale = max(1.0, float(np.abs(np.asarray(a.cls_scores)).max()))
            assert d[m].max() / scale < 0.08, d[m].max()

    def test_train_mode_grads_finite(self):
        det = FCAF3DDetector(n_classes=2, n_reg_outs=6, voxel_size=0.05,
                             pts_threshold=500, assigner_limit=2,
                             assigner_topk=3,
                             capacities=DetectionCapacities.tiny())
        pts, feats, valid = self._toy_scene(jax.random.PRNGKey(3), p=128)
        vars_ = det.init(jax.random.PRNGKey(1), pts, feats, valid,
                         train=False)
        gt_boxes = jnp.array([[[1.0, 1.0, 1.0, 1.2, 1.2, 1.2, 0.0]]])
        gt_labels = jnp.array([[1]], jnp.int32)
        gt_valid = jnp.array([[True]])

        def loss_fn(params):
            outs, _ = det.apply(
                {"params": params,
                 "batch_stats": vars_["batch_stats"]},
                pts, feats, valid, train=True, mutable=["batch_stats"])
            l = det.loss(outs, gt_boxes, gt_labels, gt_valid)
            return sum(l.values())

        g = jax.jit(jax.grad(loss_fn))(vars_["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        assert any(np.abs(np.asarray(x)).sum() > 0 for x in leaves)


class TestBuildVolumeKnobGating:
    """bp_rect / bp_tile wiring: the model must pass the rect kwargs only
    when the tile gate engages (>= 4096 tiles) AND the Pallas rect
    kernel would serve the shapes/backend (round 5: the pure-XLA rect
    formulation measured slower than row gathers, so ineligible setups
    fall back to the tiled path), with capacities derived from
    bp_rect_frac / bp_overflow_frac."""

    def _capture(self, model):
        import cnrma_tpu.models.cn_rma as m
        captured = {}
        orig = m.accumulate_views

        def spy(p, f, v, dim, vs, origin, **kw):
            captured.update(kw)
            return orig(p, f, v, dim, vs, origin, **kw)

        return captured, spy

    def _run(self, monkeypatch, voxel_dim, feat_hw=(8, 8), **model_kw):
        import jax
        import jax.numpy as jnp
        import numpy as np
        import cnrma_tpu.models.cn_rma as m
        from cnrma_tpu.models.cn_rma import CNRMA
        model = CNRMA(voxel_dim=voxel_dim, voxel_size=0.04,
                      detection=False, **model_kw)
        captured, spy = self._capture(model)
        monkeypatch.setattr(m, "accumulate_views", spy)
        v = 1
        fh, fw = feat_hw
        feats = jnp.zeros((1, v, fh, fw, 32), jnp.float32)
        proj = jnp.asarray(
            np.broadcast_to(np.eye(3, 4, dtype=np.float32), (1, v, 3, 4)))
        valid = jnp.ones((1, v), bool)
        jax.eval_shape(lambda: model.build_volume(feats, proj, valid))
        return captured

    def test_rect_on_when_tile_gate_engages(self, monkeypatch):
        # kernel-eligible feature shape + interpret-mode Pallas decision
        monkeypatch.setenv("CNRMA_BP_PALLAS", "interpret")
        cap = self._run(monkeypatch, (256, 256, 96), feat_hw=(32, 32),
                        bp_rect_h=24, bp_rect_w=32, bp_rect_frac=0.5,
                        bp_overflow_frac=0.05)
        n_tiles = (256 // 8) * (256 // 8) * (96 // 8)
        assert cap["tile"] == 8
        assert cap["rect"] == (24, 32)
        assert cap["rect_capacity"] == round(0.5 * n_tiles)
        assert cap["tile_capacity"] == round(0.05 * n_tiles)

    def test_rect_default_on_when_eligible(self, monkeypatch):
        # round-5 default: 32x32 rect engages by itself when eligible
        monkeypatch.setenv("CNRMA_BP_PALLAS", "interpret")
        cap = self._run(monkeypatch, (256, 256, 96), feat_hw=(32, 32))
        n_tiles = (256 // 8) * (256 // 8) * (96 // 8)
        assert cap["rect"] == (32, 32)
        assert cap["tile_capacity"] == round(0.06 * n_tiles)

    def test_rect_off_on_small_grids(self, monkeypatch):
        monkeypatch.setenv("CNRMA_BP_PALLAS", "interpret")
        cap = self._run(monkeypatch, (16, 16, 8),
                        bp_rect_h=24, bp_rect_w=32)
        assert cap["tile"] == 0 and cap["rect"] == (0, 0)

    def test_rect_off_when_pallas_ineligible(self, monkeypatch):
        # non-TPU backend (auto mode on CPU) -> the rect kwargs must NOT
        # reach the accumulate call even though rect is configured: the
        # XLA rect formulation loses to the row-gather tiled path
        monkeypatch.delenv("CNRMA_BP_PALLAS", raising=False)
        cap = self._run(monkeypatch, (256, 256, 96), feat_hw=(32, 32),
                        bp_rect_h=24, bp_rect_w=32)
        assert cap["rect"] == (0, 0)
        assert cap["tile"] == 8
