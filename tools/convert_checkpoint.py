#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.pth) into this framework's
parameter tree (orbax).

Covers the published CN-RMA checkpoints (reference state-dict naming from
``models/ray_marching.py`` module attributes: ``fpn.*`` = detectron
R50+FPN, ``feature_2d.*`` = pyramid fuse, ``backbone3d.*`` = 3D U-Net,
``tsdf_head.decoders.*``, ``detection_backbone.*`` / ``detection_head.*``
= ME sparse nets) and the bare Caffe2 ``R-50.pth`` backbone.

Weight layout notes:
* torch Conv2d [Cout,Cin,kh,kw] -> flax [kh,kw,Cin,Cout];
  Conv3d [Cout,Cin,kd,kh,kw] -> [kd,kh,kw,Cin,Cout];
* ME sparse kernels are already [K,Cin,Cout]; ME enumerates kernel offsets
  with the first coordinate fastest, the same order as
  ``ops.sparse.kernel_offsets`` — pass ``--me-offset-order zyx`` if a
  checkpoint disagrees (verifiable via activation parity on one scene).

Run with ``--self-test`` to validate the mapping against a synthetically
named state dict derived from a freshly initialized model.
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def t2f_conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def t2f_conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def set_in(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value)


class Converter:
    """reference state-dict -> {params, batch_stats} trees."""

    def __init__(self, me_offset_order: str = "xyz"):
        self.params = {}
        self.stats = {}
        self.unused = []
        self.me_offset_order = me_offset_order

    # -- helpers -----------------------------------------------------------
    def conv_bn(self, sd, src, dst, conv3d=False, conv_name="conv",
                norm_name="norm"):
        """torch Conv+BN pair at ``src{.weight,.norm.*}`` -> our ConvBN."""
        w = sd.get(f"{src}.weight")
        if w is None:
            return False
        tr = t2f_conv3d if conv3d else t2f_conv2d
        set_in(self.params, dst + (conv_name, "kernel"), tr(w))
        if f"{src}.bias" in sd:
            set_in(self.params, dst + (conv_name, "bias"),
                   sd[f"{src}.bias"])
        for suffix in ("norm", ""):  # detectron fuses norm into conv.norm
            base = f"{src}.{suffix}" if suffix else src
            if f"{base}.running_mean" in sd:
                set_in(self.params, dst + (norm_name, "scale"),
                       sd[f"{base}.weight"] if suffix else
                       sd[f"{base}.norm.weight"])
                set_in(self.params, dst + (norm_name, "bias"),
                       sd[f"{base}.bias"])
                set_in(self.stats, dst + (norm_name, "mean"),
                       sd[f"{base}.running_mean"])
                set_in(self.stats, dst + (norm_name, "var"),
                       sd[f"{base}.running_var"])
                break
        return True

    def plain_bn(self, sd, src, dst):
        if f"{src}.running_mean" not in sd:
            return False
        set_in(self.params, dst + ("scale",), sd[f"{src}.weight"])
        set_in(self.params, dst + ("bias",), sd[f"{src}.bias"])
        set_in(self.stats, dst + ("mean",), sd[f"{src}.running_mean"])
        set_in(self.stats, dst + ("var",), sd[f"{src}.running_var"])
        return True

    def me_kernel(self, sd, src, dst, name="kernel"):
        w = sd.get(f"{src}.kernel")
        if w is None:
            return False
        w = np.asarray(w)
        if w.ndim == 2:                       # 1x1 conv stored [Cin,Cout]
            w = w[None]
        if self.me_offset_order == "zyx" and w.shape[0] in (8, 27):
            k = round(w.shape[0] ** (1 / 3))
            w = w.reshape(k, k, k, *w.shape[1:])
            w = np.transpose(w, (2, 1, 0, 3, 4)).reshape(-1, *w.shape[3:])
        set_in(self.params, dst + (name,), w)
        if f"{src}.bias" in sd:
            bias_name = "bias" if name == "kernel" else f"{name}_bias"
            set_in(self.params, dst + (bias_name,), sd[f"{src}.bias"])
        return True

    # -- component mappings ------------------------------------------------
    def convert_2d_tower(self, sd, prefix="fpn."):
        res = ("tower2d", "resnet")
        self.conv_bn(sd, f"{prefix}bottom_up.stem.conv1", res + ("stem",))
        stage_sizes = {2: 3, 3: 4, 4: 6, 5: 3}
        for s, n in stage_sizes.items():
            for b in range(n):
                base = f"{prefix}bottom_up.res{s}.{b}"
                dst = res + (f"res{s}_block{b}",)
                for conv in ("conv1", "conv2", "conv3"):
                    self.conv_bn(sd, f"{base}.{conv}", dst + (conv,))
                self.conv_bn(sd, f"{base}.shortcut", dst + ("shortcut",))
        for s in range(2, 6):
            self.conv_bn(sd, f"{prefix}fpn_lateral{s}",
                         ("tower2d", "fpn", f"lateral{s}"))
            self.conv_bn(sd, f"{prefix}fpn_output{s}",
                         ("tower2d", "fpn", f"output{s}"))

    def convert_fuse(self, sd, prefix="feature_2d."):
        # AtlasFPNFeature scale heads: p2 has 1 conv; p3..p5 have 1..3
        # convs each followed by an upsample (sequential indices 0,2,4)
        for i, name in enumerate(["p2", "p3", "p4", "p5"]):
            n_convs = max(1, i)
            for k in range(n_convs):
                self.conv_bn(sd, f"{prefix}{name}.{k * 2}",
                             ("tower2d", "fuse", f"{name}_head{k}"))

    def convert_unet3d(self, sd, prefix="backbone3d."):
        dst0 = ("backbone3d",)

        def block(src, d):
            # BasicBlock3d names its norms bn1/bn2 as separate modules
            # (backbone3d.py:61-66), unlike detectron's fused conv.norm
            w = sd.get(f"{src}.conv1.weight")
            if w is not None:
                set_in(self.params, d + ("conv1", "conv", "kernel"),
                       t2f_conv3d(w))
            self.plain_bn(sd, f"{src}.bn1", d + ("conv1", "norm"))
            w = sd.get(f"{src}.conv2.weight")
            if w is not None:
                set_in(self.params, d + ("conv2", "kernel"), t2f_conv3d(w))
            self.plain_bn(sd, f"{src}.bn2", d + ("bn2",))

        # encoder: layers_down.0 = blocks only; layers_down.i>=1 =
        # [conv,bn,drop,relu] + blocks
        layers_down = [1, 2, 3, 4]
        for b in range(layers_down[0]):
            block(f"{prefix}layers_down.0.{b}", dst0 + (f"down0_block{b}",))
        for i in range(1, 4):
            src = f"{prefix}layers_down.{i}"
            w = sd.get(f"{src}.0.weight")
            if w is not None:
                set_in(self.params,
                       dst0 + (f"down{i}_stride", "conv", "kernel"),
                       t2f_conv3d(w))
            self.plain_bn(sd, f"{src}.1",
                          dst0 + (f"down{i}_stride", "norm"))
            for b in range(layers_down[i]):
                block(f"{src}.{4 + b}", dst0 + (f"down{i}_block{b}",))
        # decoder
        layers_up = [3, 2, 1]
        for i in range(3):
            w = sd.get(f"{prefix}layers_up_conv.{i}.weight")
            if w is not None:
                set_in(self.params, dst0 + (f"up{i + 1}_conv", "kernel"),
                       t2f_conv3d(w))
            w = sd.get(f"{prefix}proj.{i}.conv.weight")
            if w is not None:
                set_in(self.params, dst0 + (f"up{i + 1}_proj", "kernel"),
                       t2f_conv3d(w))
            self.plain_bn(sd, f"{prefix}proj.{i}.norm",
                          dst0 + (f"up{i + 1}_proj_norm",))
            for b in range(layers_up[i]):
                block(f"{prefix}layers_up_res.{i}.{b}",
                      dst0 + (f"up{i + 1}_block{b}",))

    def convert_tsdf_head(self, sd, prefix="tsdf_head."):
        for i in range(3):
            w = sd.get(f"{prefix}decoders.{i}.weight")
            if w is not None:
                set_in(self.params,
                       ("tsdf_head", f"decoder{i}", "kernel"),
                       t2f_conv3d(w))

    def convert_detection(self, sd, bprefix="detection_backbone.",
                          hprefix="detection_head."):
        det = ("detector",)
        bb = det + ("backbone",)
        # stem: conv1.0 = MEConv, conv1.1 = InstanceNorm (scale/bias only)
        self.me_kernel(sd, f"{bprefix}conv1.0", bb + ("stem",))
        if f"{bprefix}conv1.1.weight" in sd:
            set_in(self.params, bb + ("stem", "norm", "scale"),
                   sd[f"{bprefix}conv1.1.weight"])
            set_in(self.params, bb + ("stem", "norm", "bias"),
                   sd[f"{bprefix}conv1.1.bias"])
        layers = [3, 4, 6, 3]
        for li, n in enumerate(layers):
            for b in range(n):
                base = f"{bprefix}layer{li + 1}.{b}"
                dst = bb + (f"layer{li + 1}_block{b}",)
                for conv, norm in (("conv1", "norm1"), ("conv2", "norm2")):
                    self.me_kernel(sd, f"{base}.{conv}", dst + (conv,))
                    self.plain_bn(sd, f"{base}.{norm}",
                                  dst + (conv, "norm"))
                self.me_kernel(sd, f"{base}.downsample.0",
                               dst + ("downsample",))
                self.plain_bn(sd, f"{base}.downsample.1.bn",
                              dst + ("downsample", "norm")) or \
                    self.plain_bn(sd, f"{base}.downsample.1",
                                  dst + ("downsample", "norm"))
        head = det + ("head",)
        for i in range(1, 4):
            base = f"{hprefix}up_block_{i}"
            dst = head + (f"up_block_{i}",)
            self.me_kernel(sd, f"{base}.0", dst, name="up_kernel")
            self.plain_bn(sd, f"{base}.1.bn", dst + ("norm1",))
            self.me_kernel(sd, f"{base}.3", dst + ("conv",))
            self.plain_bn(sd, f"{base}.4.bn", dst + ("conv", "norm"))
        for i in range(4):
            base = f"{hprefix}out_block_{i}"
            dst = head + (f"out_block_{i}",)
            self.me_kernel(sd, f"{base}.0", dst)
            self.plain_bn(sd, f"{base}.1.bn", dst + ("norm",))
        for name in ("centerness_conv", "reg_conv", "cls_conv"):
            self.me_kernel(sd, f"{hprefix}{name}", head, name=name)
        if f"{hprefix}cls_conv.bias" in sd:
            set_in(self.params, head + ("cls_bias",),
                   sd[f"{hprefix}cls_conv.bias"])
            self._get(head).pop("cls_conv_bias", None)
        for i in range(4):
            w = sd.get(f"{hprefix}scales.{i}.scale")
            if w is not None:
                set_in(self.params, head + (f"scale_{i}",),
                       np.asarray(w).reshape(()))

    def _get(self, path):
        node = self.params
        for k in path:
            node = node.setdefault(k, {})
        return node


def convert_state_dict(sd, me_offset_order="xyz"):
    sd = {k: np.asarray(v) for k, v in sd.items()}
    c = Converter(me_offset_order)
    if any(k.startswith("bottom_up.") for k in sd):
        # bare R-50 FPN checkpoint (loaded inside FPN in the reference)
        c.convert_2d_tower(sd, prefix="")
    else:
        c.convert_2d_tower(sd, prefix="fpn.")
        c.convert_fuse(sd)
        c.convert_unet3d(sd)
        c.convert_tsdf_head(sd)
        c.convert_detection(sd)
    return c.params, c.stats


def load_torch_pretrained(path: str, me_offset_order: str = "xyz"):
    """.pth checkpoint -> (params, batch_stats) trees via the mapping."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_state_dict(sd, me_offset_order)


def merge_pretrained(dst: dict, src: dict, path: str = "") -> int:
    """Overwrite dst leaves with matching src leaves (in place).

    Returns the number of leaves copied; src keys missing from dst are
    reported (shape mismatches raise).
    """
    n = 0
    for k, v in src.items():
        here = f"{path}/{k}"
        if k not in dst:
            print(f"pretrained: no target for {here} (skipped)")
            continue
        if isinstance(v, dict):
            n += merge_pretrained(dst[k], v, here)
        else:
            if np.asarray(dst[k]).shape != np.asarray(v).shape:
                raise ValueError(
                    f"pretrained shape mismatch at {here}: "
                    f"{np.asarray(dst[k]).shape} vs {np.asarray(v).shape}")
            dst[k] = np.asarray(v)
            n += 1
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", help=".pth checkpoint")
    p.add_argument("--output", help="orbax output dir")
    p.add_argument("--me-offset-order", default="xyz",
                   choices=["xyz", "zyx"])
    p.add_argument("--self-test", action="store_true")
    args = p.parse_args()

    if args.self_test:
        self_test()
        return

    import torch
    ckpt = torch.load(args.input, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()
          if hasattr(v, "numpy")}
    params, stats = convert_state_dict(sd, args.me_offset_order)

    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(args.output),
                   {"params": params, "batch_stats": stats})
    print("wrote", args.output)


def self_test():
    """Validate the FULL mapping (2D tower, fuse, U-Net, TSDF head,
    detector) against freshly initialized model subtrees: for every one of
    our parameters, a synthetically named torch entry is emitted via the
    INVERSE mapping, converted back, and compared name-by-name/value-by-
    value in both directions (missing or extra keys fail)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp
    from cnrma_tpu.models.resnet_fpn import ResNetFPN2D

    model = ResNetFPN2D()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)

    # build a synthetic torch-style state dict from our resnet/fpn tree
    sd = {}
    res = v["params"]["resnet"]
    stats = v["batch_stats"]["resnet"]

    def put_convbn(src, p, s):
        k = np.asarray(p["conv"]["kernel"])
        sd[f"{src}.weight"] = np.transpose(k, (3, 2, 0, 1))
        sd[f"{src}.norm.weight"] = np.asarray(p["norm"]["scale"])
        sd[f"{src}.norm.bias"] = np.asarray(p["norm"]["bias"])
        sd[f"{src}.norm.running_mean"] = np.asarray(s["norm"]["mean"])
        sd[f"{src}.norm.running_var"] = np.asarray(s["norm"]["var"])

    put_convbn("fpn.bottom_up.stem.conv1", res["stem"], stats["stem"])
    for ss, n in {2: 3, 3: 4, 4: 6, 5: 3}.items():
        for b in range(n):
            blk = res[f"res{ss}_block{b}"]
            sblk = stats[f"res{ss}_block{b}"]
            for conv in ("conv1", "conv2", "conv3"):
                put_convbn(f"fpn.bottom_up.res{ss}.{b}.{conv}",
                           blk[conv], sblk[conv])
            if "shortcut" in blk:
                put_convbn(f"fpn.bottom_up.res{ss}.{b}.shortcut",
                           blk["shortcut"], sblk["shortcut"])
    fpn = v["params"]["fpn"]
    sfpn = v["batch_stats"]["fpn"]
    for ss in range(2, 6):
        put_convbn(f"fpn.fpn_lateral{ss}", fpn[f"lateral{ss}"],
                   sfpn[f"lateral{ss}"])
        put_convbn(f"fpn.fpn_output{ss}", fpn[f"output{ss}"],
                   sfpn[f"output{ss}"])
    fuse = v["params"]["fuse"]
    sfuse = v["batch_stats"]["fuse"]
    for i, name in enumerate(["p2", "p3", "p4", "p5"]):
        for k in range(max(1, i)):
            put_convbn(f"feature_2d.{name}.{k * 2}",
                       fuse[f"{name}_head{k}"], sfuse[f"{name}_head{k}"])

    # ---- 3D U-Net + TSDF head ------------------------------------------
    from cnrma_tpu.models.tsdf_head import TSDFHead
    from cnrma_tpu.models.unet3d import UNet3D

    unet = UNet3D()
    vu = unet.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 8, 32)),
                   train=False)
    pu, su = vu["params"], vu["batch_stats"]

    def put_plainbn(src, p, s):
        sd[f"{src}.weight"] = np.asarray(p["scale"])
        sd[f"{src}.bias"] = np.asarray(p["bias"])
        sd[f"{src}.running_mean"] = np.asarray(s["mean"])
        sd[f"{src}.running_var"] = np.asarray(s["var"])

    def put_conv3d(src, kernel):
        sd[f"{src}.weight"] = np.transpose(np.asarray(kernel),
                                           (4, 3, 0, 1, 2))

    def put_block(src, name):
        put_conv3d(f"{src}.conv1", pu[name]["conv1"]["conv"]["kernel"])
        put_plainbn(f"{src}.bn1", pu[name]["conv1"]["norm"],
                    su[name]["conv1"]["norm"])
        put_conv3d(f"{src}.conv2", pu[name]["conv2"]["kernel"])
        put_plainbn(f"{src}.bn2", pu[name]["bn2"], su[name]["bn2"])

    layers_down, layers_up = [1, 2, 3, 4], [3, 2, 1]
    for b in range(layers_down[0]):
        put_block(f"backbone3d.layers_down.0.{b}", f"down0_block{b}")
    for i in range(1, 4):
        put_conv3d(f"backbone3d.layers_down.{i}.0",
                   pu[f"down{i}_stride"]["conv"]["kernel"])
        put_plainbn(f"backbone3d.layers_down.{i}.1",
                    pu[f"down{i}_stride"]["norm"],
                    su[f"down{i}_stride"]["norm"])
        for b in range(layers_down[i]):
            put_block(f"backbone3d.layers_down.{i}.{4 + b}",
                      f"down{i}_block{b}")
    for i in range(3):
        put_conv3d(f"backbone3d.layers_up_conv.{i}",
                   pu[f"up{i + 1}_conv"]["kernel"])
        put_conv3d(f"backbone3d.proj.{i}.conv",
                   pu[f"up{i + 1}_proj"]["kernel"])
        put_plainbn(f"backbone3d.proj.{i}.norm",
                    pu[f"up{i + 1}_proj_norm"], su[f"up{i + 1}_proj_norm"])
        for b in range(layers_up[i]):
            put_block(f"backbone3d.layers_up_res.{i}.{b}",
                      f"up{i + 1}_block{b}")

    head_model = TSDFHead(voxel_size=0.04, n_scales=3)
    xs = [jnp.zeros((1, 4, 4, 2, 128)), jnp.zeros((1, 8, 8, 4, 64)),
          jnp.zeros((1, 16, 16, 8, 32))]
    vt = head_model.init(jax.random.PRNGKey(2), xs, None)
    pt = vt["params"]
    for i in range(3):
        put_conv3d(f"tsdf_head.decoders.{i}", pt[f"decoder{i}"]["kernel"])

    # ---- sparse detector -----------------------------------------------
    from cnrma_tpu.models.fcaf3d import DetectionCapacities, FCAF3DDetector

    det = FCAF3DDetector(
        n_classes=6, n_reg_outs=6, voxel_size=0.04, pts_threshold=2000,
        assigner_limit=3, assigner_topk=6, with_yaw=False, nms_pre=64,
        capacities=DetectionCapacities.tiny())
    rng = np.random.RandomState(0)
    vd = det.init({"params": jax.random.PRNGKey(3)},
                  jnp.asarray(rng.rand(1, 512, 3), jnp.float32),
                  jnp.asarray(rng.rand(1, 512, 32), jnp.float32),
                  jnp.ones((1, 512), bool), train=False)
    pd, sdt = vd["params"], vd["batch_stats"]

    def put_me(src, kernel):
        k = np.asarray(kernel)
        # ME stores 1x1 kernels as [Cin,Cout]
        sd[f"{src}.kernel"] = k[0] if k.shape[0] == 1 else k

    bbp, bbs = pd["backbone"], sdt["backbone"]
    put_me("detection_backbone.conv1.0", bbp["stem"]["kernel"])
    sd["detection_backbone.conv1.1.weight"] = np.asarray(
        bbp["stem"]["norm"]["scale"])
    sd["detection_backbone.conv1.1.bias"] = np.asarray(
        bbp["stem"]["norm"]["bias"])
    for li, n in enumerate([3, 4, 6, 3]):
        for b in range(n):
            name = f"layer{li + 1}_block{b}"
            if name not in bbp:
                continue
            blk, sblk = bbp[name], bbs[name]
            base = f"detection_backbone.layer{li + 1}.{b}"
            for conv, norm in (("conv1", "norm1"), ("conv2", "norm2")):
                put_me(f"{base}.{conv}", blk[conv]["kernel"])
                put_plainbn(f"{base}.{norm}", blk[conv]["norm"],
                            sblk[conv]["norm"])
            if "downsample" in blk:
                put_me(f"{base}.downsample.0",
                       blk["downsample"]["kernel"])
                put_plainbn(f"{base}.downsample.1.bn",
                            blk["downsample"]["norm"],
                            sblk["downsample"]["norm"])
    hp, hs = pd["head"], sdt["head"]
    for i in range(1, 4):
        base = f"detection_head.up_block_{i}"
        blk, sblk = hp[f"up_block_{i}"], hs[f"up_block_{i}"]
        put_me(f"{base}.0", blk["up_kernel"])
        put_plainbn(f"{base}.1.bn", blk["norm1"], sblk["norm1"])
        put_me(f"{base}.3", blk["conv"]["kernel"])
        put_plainbn(f"{base}.4.bn", blk["conv"]["norm"],
                    sblk["conv"]["norm"])
    for i in range(4):
        base = f"detection_head.out_block_{i}"
        blk, sblk = hp[f"out_block_{i}"], hs[f"out_block_{i}"]
        put_me(f"{base}.0", blk["kernel"])
        put_plainbn(f"{base}.1.bn", blk["norm"], sblk["norm"])
    for name in ("centerness_conv", "reg_conv"):
        put_me(f"detection_head.{name}", hp[name])
    put_me("detection_head.cls_conv", hp["cls_conv"])
    sd["detection_head.cls_conv.bias"] = np.asarray(hp["cls_bias"])
    for i in range(4):
        sd[f"detection_head.scales.{i}.scale"] = np.asarray(
            hp[f"scale_{i}"]).reshape(1)

    params, bstats = convert_state_dict(sd)

    def compare(ours, converted, path="", direction="MISSING"):
        ok = True
        for key in ours:
            if key not in converted:
                print(direction, path + "/" + key)
                ok = False
                continue
            a, b = ours[key], converted[key]
            if isinstance(a, dict) != isinstance(b, dict):
                print("TYPE", path + "/" + key)
                ok = False
            elif isinstance(a, dict):
                ok &= compare(a, b, path + "/" + key, direction)
            else:
                if np.asarray(a).shape != np.asarray(b).shape:
                    print("SHAPE", path + "/" + key,
                          np.asarray(a).shape, np.asarray(b).shape)
                    ok = False
                elif not np.allclose(np.asarray(a), np.asarray(b)):
                    print("VALUE", path + "/" + key)
                    ok = False
        return ok

    def check(label, ours, converted):
        fwd = compare(ours, converted, label)
        rev = compare(converted, ours, label, direction="EXTRA")
        assert fwd and rev, f"{label} mapping mismatch"
        print(f"convert_checkpoint self-test: {label} OK")

    check("tower2d.params",
          {"resnet": v["params"]["resnet"], "fpn": v["params"]["fpn"],
           "fuse": v["params"]["fuse"]}, params["tower2d"])
    check("tower2d.stats", {"resnet": stats, "fpn": sfpn, "fuse": sfuse},
          bstats["tower2d"])
    check("backbone3d.params", pu, params["backbone3d"])
    check("backbone3d.stats", su, bstats["backbone3d"])
    check("tsdf_head.params", pt, params["tsdf_head"])
    check("detector.params", pd, params["detector"])
    check("detector.stats", sdt, bstats["detector"])
    print("convert_checkpoint self-test: ALL subtrees OK")


if __name__ == "__main__":
    main()
