#!/usr/bin/env python
"""Per-stage activation parity against the reference torch modules.

Runs the reference's own 2D tower (FPNDetectron + AtlasFPNFeature), 3D
U-Net (AtlasBackbone3D) and TSDF head (AtlasTSDFHead) under plain torch
(mm registries stubbed), converts their state dict with
``tools/convert_checkpoint.py`` mappings, runs our flax models on the same
inputs, and reports per-stage max-abs differences.  This validates both
the weight mapping AND the numerical semantics (padding, frozen BN,
bilinear/nearest upsampling) end to end.

Modes:
* ``--pth ckpt.pth``: load a real reference checkpoint into the reference
  modules first (full-pipeline parity on real weights);
* default: randomly initialized reference modules (self-contained — used
  by the CI-style check in this sandbox, where no checkpoint ships).

The ME sparse detection nets cannot run here (MinkowskiEngine is not a
dependency of this harness); their mapping is covered structurally by
``convert_checkpoint.py --self-test``.

Reference call stacks: ray_marching.py:419-436 (tower), atlas.py /
backbone3d.py:175 (U-Net), atlas_head.py:34-60 (TSDF head).
"""

import argparse
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

TOL = 5e-4


def _stub_mm_modules():
    """Install minimal mmcv/mmdet stand-ins so the reference model files
    import under plain torch."""
    class _Registry:
        def register_module(self, *a, **k):
            # handles both @REG.register_module and @REG.register_module()
            if a and isinstance(a[0], type):
                return a[0]

            def deco(cls):
                return cls
            return deco

    def _identity_decorator(*a, **k):
        def deco(fn):
            return fn
        return deco

    mmcv = types.ModuleType("mmcv")
    runner = types.ModuleType("mmcv.runner")
    runner.auto_fp16 = _identity_decorator
    runner.force_fp32 = _identity_decorator
    mmcv.runner = runner
    mmdet = types.ModuleType("mmdet")
    mmodels = types.ModuleType("mmdet.models")
    mmodels.BACKBONES = _Registry()
    mmodels.HEADS = _Registry()
    mmdet.models = mmodels
    sys.modules.setdefault("mmcv", mmcv)
    sys.modules.setdefault("mmcv.runner", runner)
    sys.modules.setdefault("mmdet", mmdet)
    sys.modules.setdefault("mmdet.models", mmodels)


def _stub_reference_packages(ref_path: str):
    """Register the reference's package chain with __path__ only, so leaf
    model modules import WITHOUT executing the package __init__ (which
    drags in skimage/mmdet3d datasets we don't need)."""
    chain = ["projects", "projects.mvsdetection",
             "projects.mvsdetection.models"]
    sub = ref_path
    for name in chain:
        sub = os.path.join(sub, name.rsplit(".", 1)[-1])
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [sub]
            sys.modules[name] = mod


def build_reference_modules(ref_path: str):
    """Instantiate the reference 2D/3D modules with the published config
    args (projects/configs/mvsdetection/ray_marching_scannet.py:133-180)."""
    _stub_mm_modules()
    _stub_reference_packages(ref_path)
    sys.path.insert(0, ref_path)
    from projects.mvsdetection.models.atlas_head import AtlasTSDFHead
    from projects.mvsdetection.models.backbone2d import AtlasFPNFeature
    from projects.mvsdetection.models.backbone3d import AtlasBackbone3D
    from projects.mvsdetection.models.fpn import FPNDetectron

    fpn = FPNDetectron(
        bottom_up_cfg=dict(
            input_channels=3, norm="BN", depth=50,
            out_features=["res2", "res3", "res4", "res5"], num_groups=1,
            width_per_group=64, stride_in_1x1=True, res5_dilation=1,
            res2_out_channels=256, stem_out_channels=64, freeze_at=2),
        in_features=["res2", "res3", "res4", "res5"], out_channels=256,
        norm="BN", fuse_type="sum", pretrained=None)
    feature_2d = AtlasFPNFeature(
        feature_strides={"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64},
        feature_channels={k: 256 for k in ("p2", "p3", "p4", "p5", "p6")},
        output_dim=32, output_stride=4, norm="BN")
    backbone3d = AtlasBackbone3D(
        channels=[32, 64, 128, 256], layers_down=[1, 2, 3, 4],
        layers_up=[3, 2, 1], drop=0.0, zero_init_residual=True,
        cond_proj=False, norm="BN")
    tsdf_head = AtlasTSDFHead(
        input_channels=[32, 64, 128], n_scales=3, voxel_size=0.04,
        label_smoothing=1.05, sparse_threshold=[0.99, 0.99, 0.99])
    return fpn, feature_2d, backbone3d, tsdf_head


def randomize_(module, seed):
    """Perturb all parameters/buffers so parity is non-trivial (fresh
    init leaves zero-init residual BNs and unit BN stats everywhere)."""
    import torch
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=g))
        for name, b in module.named_buffers():
            if name.endswith("running_mean"):
                b.add_(0.1 * torch.randn(b.shape, generator=g))
            elif name.endswith("running_var"):
                b.mul_(
                    (0.5 + torch.rand(b.shape, generator=g)).clamp_(0.1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ref-path", default="/root/reference",
                   help="reference repo root (for its model code)")
    p.add_argument("--pth", default=None, help="real checkpoint to load")
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--voxels", type=int, nargs=3, default=(32, 32, 16))
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import torch
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tools.convert_checkpoint import convert_state_dict

    torch.manual_seed(0)
    fpn, feature_2d, backbone3d, tsdf_head = build_reference_modules(
        args.ref_path)
    mods = {"fpn": fpn, "feature_2d": feature_2d,
            "backbone3d": backbone3d, "tsdf_head": tsdf_head}
    if args.pth:
        ckpt = torch.load(args.pth, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        for name, mod in mods.items():
            sub = {k[len(name) + 1:]: v for k, v in sd.items()
                   if k.startswith(name + ".")}
            missing, unexpected = mod.load_state_dict(sub, strict=False)
            print(f"{name}: loaded ({len(missing)} missing, "
                  f"{len(unexpected)} unexpected)")
    else:
        for i, mod in enumerate(mods.values()):
            randomize_(mod, seed=100 + i)
    for mod in mods.values():
        mod.eval()

    # ---- torch forward ---------------------------------------------------
    h, w = args.height, args.width
    X, Y, Z = args.voxels
    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, h, w).astype(np.float32)
    vol = rng.randn(1, 32, X, Y, Z).astype(np.float32)

    with torch.no_grad():
        feats = fpn(torch.from_numpy(img))
        t_feat2d = feature_2d(feats).numpy()           # [1,32,h/4,w/4]
        t_xs = backbone3d(torch.from_numpy(vol))       # coarse->fine list
        t_tsdf, _ = tsdf_head([x for x in t_xs], None)
        t_xs = [x.numpy() for x in t_xs]
        t_tsdf = {k: v.numpy() for k, v in t_tsdf.items()}

    # ---- convert weights + flax forward ----------------------------------
    sd_all = {}
    for name, mod in mods.items():
        for k, v in mod.state_dict().items():
            if v.dtype in (torch.float32, torch.float64):
                sd_all[f"{name}.{k}"] = v.numpy()
    params, stats = convert_state_dict(sd_all)

    from cnrma_tpu.models.resnet_fpn import ResNetFPN2D
    from cnrma_tpu.models.tsdf_head import TSDFHead
    from cnrma_tpu.models.unet3d import UNet3D

    tower = ResNetFPN2D()
    j_feat2d = tower.apply(
        {"params": params["tower2d"], "batch_stats": stats["tower2d"]},
        jnp.asarray(np.transpose(img, (0, 2, 3, 1))), train=False)
    j_feat2d = np.transpose(np.asarray(j_feat2d), (0, 3, 1, 2))

    unet = UNet3D()
    j_xs = unet.apply(
        {"params": params["backbone3d"],
         "batch_stats": stats["backbone3d"]},
        jnp.asarray(np.transpose(vol, (0, 2, 3, 4, 1))), train=False)

    head = TSDFHead(voxel_size=0.04, n_scales=3)
    j_tsdf, _ = head.apply({"params": params["tsdf_head"]}, j_xs, None)

    # ---- compare ----------------------------------------------------------
    failures = []

    def check(name, torch_arr, jax_arr_nchw):
        d = float(np.abs(torch_arr - jax_arr_nchw).max())
        r = float(np.abs(torch_arr).max())
        status = "OK " if d <= TOL * max(1.0, r) else "FAIL"
        print(f"{status} {name:<24} max|diff|={d:.3e} (ref max {r:.3e})")
        if status == "FAIL":
            failures.append(name)

    check("tower2d(feature_2d)", t_feat2d, j_feat2d)
    for i, (t, j) in enumerate(zip(t_xs, j_xs)):
        check(f"backbone3d.xs[{i}]", t,
              np.transpose(np.asarray(j), (0, 4, 1, 2, 3)))
    for k in t_tsdf:
        check(f"tsdf_head.{k}", t_tsdf[k],
              np.asarray(j_tsdf[k])[:, None, ...])
    if failures:
        print("ACTIVATION PARITY FAILED:", failures)
        sys.exit(1)
    print("activation parity: ALL STAGES OK")


if __name__ == "__main__":
    main()
