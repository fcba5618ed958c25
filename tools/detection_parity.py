#!/usr/bin/env python
"""Detection-math parity against the reference's own torch code.

Most of the reference's detection numerics are pure torch, not
MinkowskiEngine: box decoding (``fcaf3d_head.py:300-349``), centerness
(``:395-402``), the FCAF3D label assigner (``:405-484``) and the loss
assembly (``:141-214``).  This tool imports the reference's
``fcaf3d_head.py`` with the mm registries and MinkowskiEngine stubbed,
runs those functions on random inputs under plain torch, and compares
them against our JAX counterparts (``cnrma_tpu/models/fcaf3d.py`` /
``assigner.py`` / ``ops/losses.py``).

What is and is not oracle-grade here:

* ``_bbox_pred_to_bbox``, ``compute_centerness``, ``FCAF3DAssigner.assign``
  and ``FCAF3DHead._loss_single`` execute the REFERENCE'S OWN code.
* Two external mmdet3d-0.15 helpers the reference calls are not
  installable in this sandbox and are re-derived faithfully below:
  ``rotation_3d_in_axis`` (whose einsum applies the transposed rotation
  matrix — clockwise for +angle; self-checked at import) and a minimal
  ``DepthInstance3DBoxes`` (gravity center, zero-yaw padding, origin
  shift).  The loss functions (mmcv sigmoid focal / BCE / fcaf3d's
  axis-aligned IoU3DLoss) are likewise faithful torch re-derivations.

Run:  python tools/detection_parity.py          (exits nonzero on FAIL)
The fast test lane runs the same checks via tests/test_detection_parity.py.
"""

import argparse
import os
import sys
import types

# pure math checks — never grab the TPU tunnel (the env pins
# JAX_PLATFORMS=axon globally, so an unconditional override is needed)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import torch

REF = "/root/reference"
TOL = 1e-4


# ---------------------------------------------------------------------------
# faithful re-derivations of the two mmdet3d-0.15 helpers the assigner uses
# ---------------------------------------------------------------------------

def rotation_3d_in_axis(points, angles, axis=0):
    """mmdet3d 0.15 ``rotation_3d_in_axis`` semantics (z-axis case).

    The original computes ``einsum('aij,jka->aik', points, rot_mat_T)``
    with rot_mat_T rows ``[cos, -sin, 0], [sin, cos, 0], [0, 0, 1]`` —
    i.e. it multiplies by the TRANSPOSE of the standard rotation matrix,
    rotating points clockwise for a positive angle (the well-known
    pre-1.0 mmdet3d convention; flipped in the 1.0 coordinate refactor).
    """
    assert axis == 2
    c, s = torch.cos(angles), torch.sin(angles)
    # out = points @ [[c, -s], [s, c]]  (per batch element a)
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    out_x = x * c[:, None] + y * s[:, None]
    out_y = -x * s[:, None] + y * c[:, None]
    return torch.stack([out_x, out_y, z], dim=-1)


def _self_check_rotation():
    p = torch.tensor([[[1.0, 0.0, 0.0]]])
    a = torch.tensor([np.pi / 2], dtype=torch.float32)
    out = rotation_3d_in_axis(p, a, axis=2)[0, 0]
    # clockwise: +x axis rotated by +90deg lands on -y
    assert torch.allclose(out, torch.tensor([0.0, -1.0, 0.0]), atol=1e-6), out


class DepthInstance3DBoxes:
    """Minimal mmdet3d-0.15 DepthInstance3DBoxes: [N, 6|7] raw boxes with
    configurable origin, stored bottom-centered, zero-yaw padded."""

    def __init__(self, tensor, box_dim=7, with_yaw=True,
                 origin=(0.5, 0.5, 0)):
        t = torch.as_tensor(tensor, dtype=torch.float32).clone()
        if t.numel() == 0:
            t = t.reshape(0, box_dim)
        if not with_yaw and t.shape[-1] == 6:
            t = torch.cat([t, t.new_zeros(t.shape[0], 1)], dim=-1)
        if tuple(origin) != (0.5, 0.5, 0):
            dst = t.new_tensor((0.5, 0.5, 0))
            src = t.new_tensor(origin)
            t[:, :3] += t[:, 3:6] * (dst - src)
        self.tensor = t
        self.with_yaw = with_yaw

    def __len__(self):
        return self.tensor.shape[0]

    @property
    def volume(self):
        return (self.tensor[:, 3] * self.tensor[:, 4] * self.tensor[:, 5])

    @property
    def gravity_center(self):
        g = self.tensor[:, :3].clone()
        g[:, 2] += self.tensor[:, 5] * 0.5
        return g

    def to(self, device):
        return self

    def convert_to(self, mode):
        return self


# ---------------------------------------------------------------------------
# faithful torch re-derivations of the reference's loss functions
# (mmcv sigmoid_focal_loss, mmdet CrossEntropyLoss(use_sigmoid),
#  fcaf3d IoU3DLoss axis-aligned branch)
# ---------------------------------------------------------------------------

def torch_focal_loss(pred, target, avg_factor, gamma=2.0, alpha=0.25):
    n, c = pred.shape
    onehot = torch.zeros_like(pred)
    posm = target >= 0
    onehot[posm] = torch.nn.functional.one_hot(
        target[posm].long(), c).float()
    p = torch.sigmoid(pred)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        pred, onehot, reduction="none")
    p_t = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    return (alpha_t * (1 - p_t) ** gamma * ce).sum() / avg_factor


def torch_bce_loss(pred, target, avg_factor):
    return torch.nn.functional.binary_cross_entropy_with_logits(
        pred, target.float(), reduction="none").sum() / avg_factor


def torch_aligned_iou3d_loss(pred, target, weight, avg_factor):
    """fcaf3d IoU3DLoss, axis-aligned branch: 1 - IoU3D on (c, d) boxes."""
    t = target[:, :6]
    pmin, pmax = pred[:, :3] - pred[:, 3:6] / 2, pred[:, :3] + pred[:, 3:6] / 2
    tmin, tmax = t[:, :3] - t[:, 3:6] / 2, t[:, :3] + t[:, 3:6] / 2
    inter = (torch.minimum(pmax, tmax)
             - torch.maximum(pmin, tmin)).clamp(min=0).prod(dim=1)
    vol_p = pred[:, 3:6].prod(dim=1)
    vol_t = t[:, 3:6].prod(dim=1)
    iou = inter / (vol_p + vol_t - inter).clamp(min=1e-7)
    return ((1 - iou) * weight).sum() / avg_factor


# ---------------------------------------------------------------------------
# stub the mm/ME import surface and load the reference module
# ---------------------------------------------------------------------------

class _Registry:
    def register_module(self, *a, **k):
        if a and isinstance(a[0], type):
            return a[0]

        def deco(cls):
            return cls
        return deco


def _identity_decorator(*a, **k):
    def deco(fn):
        return fn
    return deco


def load_reference_head(ref_path=REF):
    _self_check_rotation()
    mods = {}

    def new(name):
        m = types.ModuleType(name)
        mods[name] = m
        return m

    me = new("MinkowskiEngine")
    me.SparseTensor = object
    mmcv = new("mmcv")
    runner = new("mmcv.runner")
    runner.auto_fp16 = _identity_decorator
    runner.force_fp32 = _identity_decorator
    cnn = new("mmcv.cnn")

    class Scale(torch.nn.Module):
        def __init__(self, scale=1.0):
            super().__init__()
            self.scale = torch.nn.Parameter(torch.tensor(float(scale)))

        def forward(self, x):
            return x * self.scale

    cnn.Scale = Scale
    cnn.bias_init_with_prob = lambda p: float(-np.log((1 - p) / p))
    mmcv.runner, mmcv.cnn = runner, cnn

    mmdet = new("mmdet")
    core = new("mmdet.core")
    core.BaseAssigner = object
    core.reduce_mean = lambda x: x
    core.build_assigner = lambda cfg: None
    bbox = new("mmdet.core.bbox")
    bbox_builder = new("mmdet.core.bbox.builder")
    bbox_builder.BBOX_ASSIGNERS = _Registry()
    bbox.builder = bbox_builder
    core.bbox = bbox
    models = new("mmdet.models")
    builder = new("mmdet.models.builder")
    builder.HEADS = _Registry()
    builder.build_loss = lambda cfg: None
    models.builder = builder
    mmdet.core, mmdet.models = core, models

    mmdet3d = new("mmdet3d")
    d3core = new("mmdet3d.core")
    d3bbox = new("mmdet3d.core.bbox")
    d3bbox.DepthInstance3DBoxes = DepthInstance3DBoxes
    d3structs = new("mmdet3d.core.bbox.structures")
    d3structs.rotation_3d_in_axis = rotation_3d_in_axis
    d3bbox.structures = d3structs
    d3core.bbox = d3bbox
    d3ops = new("mmdet3d.ops")
    d3nms = new("mmdet3d.ops.pcdet_nms")
    d3nms.pcdet_nms_gpu = None
    d3nms.pcdet_nms_normal_gpu = None
    d3ops.pcdet_nms = d3nms
    mmdet3d.core, mmdet3d.ops = d3core, d3ops

    for name, m in mods.items():
        sys.modules[name] = m

    # package-chain with __path__ only so the leaf imports without the
    # reference package __init__ (same trick as tools/activation_parity.py)
    sub = ref_path
    for name in ["projects", "projects.mvsdetection",
                 "projects.mvsdetection.models"]:
        sub = os.path.join(sub, name.rsplit(".", 1)[-1])
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [sub]
            sys.modules[name] = mod
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    import projects.mvsdetection.models.fcaf3d_head as ref_head
    return ref_head


# ---------------------------------------------------------------------------
# checks
# ---------------------------------------------------------------------------

def check_decode(ref_head, rng):
    """_bbox_pred_to_bbox (ref fcaf3d_head.py:300-349) vs decode_bbox."""
    from cnrma_tpu.models.fcaf3d import decode_bbox
    import jax.numpy as jnp

    n = 257
    points = rng.normal(0, 2, (n, 3)).astype(np.float32)
    worst = {}
    for yp, cols in [("none", 6), ("naive", 7), ("sin-cos", 8),
                     ("fcaf3d", 8)]:
        bp = np.concatenate([
            np.exp(rng.normal(0, 0.5, (n, 6))).astype(np.float32),
            rng.normal(0, 1, (n, cols - 6)).astype(np.float32)], axis=1)
        shim = types.SimpleNamespace(
            yaw_parametrization=yp if yp != "none" else "fcaf3d")
        ref = ref_head.FCAF3DHead._bbox_pred_to_bbox(
            shim, torch.from_numpy(points), torch.from_numpy(bp)).numpy()
        ours = np.asarray(decode_bbox(
            jnp.asarray(points), jnp.asarray(bp),
            yp if yp != "none" else "fcaf3d"))
        worst[yp] = float(np.abs(ref - ours).max())
    return worst


def check_centerness(ref_head, rng):
    """compute_centerness (ref fcaf3d_head.py:395-402) vs ours."""
    from cnrma_tpu.models.assigner import compute_centerness
    n = 513
    bt = np.concatenate([
        np.exp(rng.normal(0, 0.7, (n, 6))).astype(np.float32),
        rng.normal(0, 1, (n, 1)).astype(np.float32)], axis=1)
    ref = ref_head.compute_centerness(torch.from_numpy(bt)).numpy()
    ours = np.asarray(compute_centerness(*[bt[:, i] for i in range(6)]))
    return float(np.abs(ref - ours).max())


def _make_assign_case(rng, m, level_sizes, with_yaw, extent=6.0):
    points = [rng.uniform(0, extent, (ni, 3)).astype(np.float32)
              for ni in level_sizes]
    centers = rng.uniform(1.0, extent - 1.0, (m, 3)).astype(np.float32)
    dims = rng.uniform(0.5, 2.5, (m, 3)).astype(np.float32)
    yaw = (rng.uniform(-np.pi, np.pi, (m, 1)).astype(np.float32)
           if with_yaw else np.zeros((m, 1), np.float32))
    boxes_raw = np.concatenate([centers, dims] + ([yaw] if with_yaw else []),
                               axis=1)
    labels = rng.integers(0, 18, m).astype(np.int64)
    return points, boxes_raw, labels


def _ref_assign(ref_head, points, boxes_raw, labels, with_yaw,
                limit, topk, n_scales):
    gt = DepthInstance3DBoxes(
        boxes_raw, box_dim=boxes_raw.shape[-1], with_yaw=with_yaw,
        origin=(0.5, 0.5, 0.5))
    assigner = ref_head.FCAF3DAssigner(limit=limit, topk=topk,
                                       n_scales=n_scales)
    ct, bt, lb = assigner.assign(
        [torch.from_numpy(p) for p in points], gt,
        torch.from_numpy(labels))
    return ct.numpy(), bt.numpy(), lb.numpy()


def _our_assign(points, boxes_raw, labels, limit, topk, n_scales,
                pad_points=0, pad_boxes=0):
    import jax.numpy as jnp
    from cnrma_tpu.models.assigner import fcaf3d_assign
    pts = np.concatenate(points, axis=0)
    sid = np.concatenate([np.full(len(p), i, np.int32)
                          for i, p in enumerate(points)])
    valid = np.ones(len(pts), bool)
    if pad_points:
        pts = np.concatenate([pts, np.zeros((pad_points, 3), np.float32)])
        sid = np.concatenate([sid, np.zeros(pad_points, np.int32)])
        valid = np.concatenate([valid, np.zeros(pad_points, bool)])
    g = np.zeros((len(boxes_raw), 7), np.float32)
    g[:, :boxes_raw.shape[1]] = boxes_raw          # gravity z == raw center z
    lab = labels.astype(np.int32)
    gv = np.ones(len(g), bool)
    if pad_boxes:
        g = np.concatenate([g, np.zeros((pad_boxes, 7), np.float32)])
        lab = np.concatenate([lab, np.zeros(pad_boxes, np.int32)])
        gv = np.concatenate([gv, np.zeros(pad_boxes, bool)])
    res = fcaf3d_assign(jnp.asarray(pts), jnp.asarray(sid),
                        jnp.asarray(valid), jnp.asarray(g),
                        jnp.asarray(lab), jnp.asarray(gv),
                        n_scales=n_scales, limit=limit, topk=topk)
    n = sum(len(p) for p in points)
    return (np.asarray(res.centerness_targets)[:n],
            np.asarray(res.bbox_targets)[:n],
            np.asarray(res.labels)[:n])


def check_assigner(ref_head, rng, with_yaw, limit=27, topk=18,
                   level_sizes=(1200, 500, 220, 80), m=7, pad=False):
    """FCAF3DAssigner.assign (ref fcaf3d_head.py:405-484) vs fcaf3d_assign."""
    points, boxes_raw, labels = _make_assign_case(
        rng, m, level_sizes, with_yaw)
    rct, rbt, rlb = _ref_assign(ref_head, points, boxes_raw, labels,
                                with_yaw, limit, topk, len(level_sizes))
    oct_, obt, olb = _our_assign(points, boxes_raw, labels, limit, topk,
                                 len(level_sizes),
                                 pad_points=173 if pad else 0,
                                 pad_boxes=5 if pad else 0)
    out = {}
    out["labels_mismatch"] = int((rlb != olb).sum())
    pos = rlb >= 0
    out["n_pos"] = int(pos.sum())
    out["centerness"] = (float(np.abs(rct[pos] - oct_[pos]).max())
                         if pos.any() else 0.0)
    out["bbox_targets"] = (float(np.abs(rbt[pos] - obt[pos]).max())
                           if pos.any() else 0.0)
    return out


def check_loss(ref_head, rng, limit=9, topk=6,
               level_sizes=(600, 260, 120, 48), m=6, n_classes=18):
    """Loss assembly (ref fcaf3d_head.py:141-214) vs FCAF3DDetector.loss —
    ScanNet setting (6-DoF, axis-aligned IoU)."""
    import jax.numpy as jnp
    from cnrma_tpu.models.fcaf3d import FCAF3DDetector, LevelOut

    points, boxes_raw, labels = _make_assign_case(
        rng, m, level_sizes, with_yaw=False)
    cen = [rng.normal(0, 1, (ni, 1)).astype(np.float32)
           for ni in level_sizes]
    bp = [np.exp(rng.normal(-0.5, 0.5, (ni, 6))).astype(np.float32)
          for ni in level_sizes]
    cls = [rng.normal(-2, 1, (ni, n_classes)).astype(np.float32)
           for ni in level_sizes]

    # ---- reference side: FCAF3DHead._loss_single on a shim self ----
    shim = types.SimpleNamespace(
        assigner=ref_head.FCAF3DAssigner(limit=limit, topk=topk,
                                         n_scales=len(level_sizes)),
        loss_cls=lambda p, t, avg_factor: torch_focal_loss(
            p, t, avg_factor),
        loss_centerness=lambda p, t, avg_factor: torch_bce_loss(
            p, t, avg_factor),
        loss_bbox=lambda p, t, weight, avg_factor:
            torch_aligned_iou3d_loss(p, t, weight, avg_factor),
        yaw_parametrization="fcaf3d")
    shim._bbox_pred_to_bbox = types.MethodType(
        ref_head.FCAF3DHead._bbox_pred_to_bbox, shim)
    gt = DepthInstance3DBoxes(boxes_raw, box_dim=6, with_yaw=False,
                              origin=(0.5, 0.5, 0.5))
    rc, rb, rcl = ref_head.FCAF3DHead._loss_single(
        shim,
        centernesses=[torch.from_numpy(c) for c in cen],
        bbox_preds=[torch.from_numpy(b) for b in bp],
        cls_scores=[torch.from_numpy(c) for c in cls],
        points=[torch.from_numpy(p) for p in points],
        gt_bboxes=gt, gt_labels=torch.from_numpy(labels))
    ref_losses = {"loss_centerness": float(rc), "loss_bbox": float(rb),
                  "loss_cls": float(rcl)}

    # ---- our side: LevelOut batch of 1 ----
    det = FCAF3DDetector(n_classes=n_classes, n_reg_outs=6,
                         with_yaw=False, assigner_limit=limit,
                         assigner_topk=topk)
    louts = [LevelOut(centerness=jnp.asarray(c[None, :, 0]),
                      bbox_pred=jnp.asarray(b[None]),
                      cls_scores=jnp.asarray(s[None]),
                      points=jnp.asarray(p[None]),
                      valid=jnp.ones((1, len(p)), bool))
             for c, b, s, p in zip(cen, bp, cls, points)]
    g = np.zeros((1, m, 7), np.float32)
    g[0, :, :6] = boxes_raw
    ours = det.loss(louts, jnp.asarray(g),
                    jnp.asarray(labels[None].astype(np.int32)),
                    jnp.ones((1, m), bool))
    out = {}
    for k in ref_losses:
        out[k] = abs(ref_losses[k] - float(ours[k]))
    out["_ref"] = ref_losses
    return out


def run_all(verbose=True):
    rng = np.random.default_rng(0)
    ref_head = load_reference_head()
    failures = []

    def report(name, val, tol=TOL):
        ok = val <= tol
        if not ok:
            failures.append(name)
        if verbose:
            print(f"  {name:<42s} {val:.3e}  {'OK' if ok else 'FAIL'}")

    if verbose:
        print("decode (_bbox_pred_to_bbox vs decode_bbox):")
    for yp, v in check_decode(ref_head, rng).items():
        report(f"decode[{yp}]", v)

    if verbose:
        print("centerness:")
    report("compute_centerness", check_centerness(ref_head, rng))

    for with_yaw, name in [(False, "scannet(yaw=0)"), (True, "arkit(yaw)")]:
        for pad in ([False, True] if not with_yaw else [False]):
            tag = f"assign[{name}{'+pad' if pad else ''}]"
            if verbose:
                print(f"{tag}:")
            r = check_assigner(ref_head, rng, with_yaw, pad=pad)
            report(f"{tag}.labels_mismatch", float(r["labels_mismatch"]),
                   tol=0)
            report(f"{tag}.centerness", r["centerness"])
            report(f"{tag}.bbox_targets", r["bbox_targets"])
            if verbose:
                print(f"    ({r['n_pos']} positives)")

    if verbose:
        print("loss scalars (scannet 6-DoF):")
    r = check_loss(ref_head, rng)
    for k in ("loss_centerness", "loss_bbox", "loss_cls"):
        report(f"loss.{k}", r[k], tol=2e-4)
    if verbose:
        print(f"    (reference values: {r['_ref']})")

    return failures


def main():
    argparse.ArgumentParser(description=__doc__).parse_args()
    failures = run_all()
    if failures:
        print(f"FAILED: {failures}")
        sys.exit(1)
    print("ALL DETECTION-MATH PARITY CHECKS OK")


if __name__ == "__main__":
    main()
