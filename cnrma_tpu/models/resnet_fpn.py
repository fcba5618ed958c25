"""2D feature tower: Detectron-style ResNet-50 + FPN + pyramid fuse.

Covers three reference components in one flax module
(SURVEY.md §2.1):
* ``ResNetDetectron`` (``models/resnet.py``) — R-50, caffe2 layout
  (stride_in_1x1), stem 7x7/2 + maxpool 3x3/2, stages res2..res5;
* ``FPNDetectron`` (``models/fpn.py``) — 1x1 laterals + 3x3 outputs with BN,
  nearest top-down, p6 = stride-2 maxpool of p5;
* ``AtlasFPNFeature`` (``models/backbone2d.py``) — collapses p2..p5 into one
  stride-4, 32-channel map via conv+BN+ReLU heads with bilinear x2 ups.

TPU notes: NHWC everywhere, explicit torch-convention padding so converted
R-50 checkpoints are bit-compatible; the whole tower jits into one XLA
program over the flattened (scene x view) batch axis.
``freeze_at=2`` semantics: stem/res2 use frozen BN here; excluding their
params from the optimizer is handled by ``train/optim.py`` path masks.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cnrma_tpu.models.layers import (
    BatchNorm, ConvBN, upsample_linear, upsample_nearest)

relu = jax.nn.relu


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 with stride in the first 1x1 (caffe2 style)."""
    bottleneck: int
    features: int
    stride: int = 1
    frozen: bool = False
    conv_dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        norm = "FrozenBN" if self.frozen else "BN"
        t = train and not self.frozen
        dt = self.conv_dtype
        shortcut = x
        if x.shape[-1] != self.features or self.stride != 1:
            shortcut = ConvBN(self.features, 1, self.stride, norm=norm,
                              conv_dtype=dt, name="shortcut")(x, train=t)
        y = ConvBN(self.bottleneck, 1, self.stride, norm=norm, act=relu,
                   conv_dtype=dt, name="conv1")(x, train=t)
        y = ConvBN(self.bottleneck, 3, 1, norm=norm, act=relu,
                   conv_dtype=dt, name="conv2")(y, train=t)
        y = ConvBN(self.features, 1, 1, norm=norm, conv_dtype=dt,
                   name="conv3")(y, train=t)
        return relu(y + shortcut)


class ResNet50(nn.Module):
    """R-50 trunk returning {res2..res5} (strides 4/8/16/32)."""
    stem_channels: int = 64
    res2_out_channels: int = 256
    freeze_at: int = 2
    num_blocks: Sequence[int] = (3, 4, 6, 3)
    conv_dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool
                 ) -> Dict[str, jnp.ndarray]:
        stem_frozen = self.freeze_at >= 1
        x = ConvBN(self.stem_channels, 7, 2,
                   norm="FrozenBN" if stem_frozen else "BN", act=relu,
                   conv_dtype=self.conv_dtype,
                   name="stem")(x, train=train and not stem_frozen)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        outs = {}
        out_ch = self.res2_out_channels
        bottleneck = self.stem_channels
        for stage_idx in range(4):                   # res2..res5
            frozen = self.freeze_at >= stage_idx + 2
            first_stride = 1 if stage_idx == 0 else 2
            for b in range(self.num_blocks[stage_idx]):
                x = BottleneckBlock(
                    bottleneck=bottleneck, features=out_ch,
                    stride=first_stride if b == 0 else 1, frozen=frozen,
                    conv_dtype=self.conv_dtype,
                    name=f"res{stage_idx + 2}_block{b}")(x, train=train)
            outs[f"res{stage_idx + 2}"] = x
            out_ch *= 2
            bottleneck *= 2
        return outs


class FPN(nn.Module):
    """FPN over res2..res5 -> p2..p6 (sum fuse, BN, no conv bias)."""
    out_channels: int = 256
    norm: str = "BN"
    conv_dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], train: bool
                 ) -> Dict[str, jnp.ndarray]:
        names = ["res2", "res3", "res4", "res5"]
        laterals = []
        for i, n in enumerate(names):
            laterals.append(ConvBN(self.out_channels, 1, 1, norm=self.norm,
                                   use_bias=self.norm is None,
                                   conv_dtype=self.conv_dtype,
                                   name=f"lateral{i + 2}")(feats[n],
                                                           train=train))
        # top-down pathway
        merged = [None] * 4
        merged[3] = laterals[3]
        for i in (2, 1, 0):
            merged[i] = laterals[i] + upsample_nearest(merged[i + 1], 2)
        outs = {}
        for i in range(4):
            outs[f"p{i + 2}"] = ConvBN(
                self.out_channels, 3, 1, norm=self.norm,
                use_bias=self.norm is None, conv_dtype=self.conv_dtype,
                name=f"output{i + 2}")(merged[i], train=train)
        # p6: stride-2 maxpool of p5 (kernel 1)
        outs["p6"] = nn.max_pool(outs["p5"], (1, 1), strides=(2, 2))
        return outs


class PyramidFuse(nn.Module):
    """p2..p5 -> single stride-4 map (AtlasFPNFeature): per-level stacks of
    conv3x3+BN+ReLU with bilinear x2 between, summed."""
    output_dim: int = 32
    conv_dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, pyramid: Dict[str, jnp.ndarray], train: bool
                 ) -> jnp.ndarray:
        out = None
        for i, name in enumerate(["p2", "p3", "p4", "p5"]):
            x = pyramid[name]
            n_steps = max(1, i)                      # p2: 1 conv, no ups
            for k in range(n_steps):
                x = ConvBN(self.output_dim, 3, 1, norm="BN", act=relu,
                           conv_dtype=self.conv_dtype,
                           name=f"{name}_head{k}")(x, train=train)
                if i > 0:
                    x = upsample_linear(x, 2)
            out = x if out is None else out + x
        return out


class ResNetFPN2D(nn.Module):
    """Full 2D tower: images [V, H, W, 3] -> stride-4 32-ch features.

    ``per_sample_bn`` reproduces the reference's per-frame BN path
    (``use_batchnorm_* = False`` runs each frame separately; with running
    averages the batched and per-frame paths are identical, so only the
    batch-stats case needs the flag).
    """
    output_dim: int = 32
    fpn_channels: int = 256
    freeze_at: int = 2
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = images.astype(self.compute_dtype)
        dt = (self.compute_dtype
              if self.compute_dtype != jnp.float32 else None)
        feats = ResNet50(freeze_at=self.freeze_at, conv_dtype=dt,
                         name="resnet")(x, train=train)
        pyramid = FPN(out_channels=self.fpn_channels, conv_dtype=dt,
                      name="fpn")(feats, train=train)
        fused = PyramidFuse(output_dim=self.output_dim, conv_dtype=dt,
                            name="fuse")(pyramid, train=train)
        return fused
