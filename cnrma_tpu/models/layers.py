"""Shared flax layers: torch-padding convs, batch norms (incl. frozen and
masked-sparse variants), resampling.

Replaces the reference's ``detectron_base.py`` utility layer (Conv2d with
fused norm/activation, FrozenBatchNorm2d, norm factory) and the ME norm
layers — with explicit torch-convention padding so converted checkpoints
reproduce activations exactly.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cnrma_tpu.utils.shard_ctx import (
    current_bn_sync_axis, current_halo_axis, halo_pad_x)


def torch_padding(kernel_size: int) -> Sequence[Tuple[int, int]]:
    p = kernel_size // 2
    return [(p, p)]


def sync_batch_stats(mean: jnp.ndarray, meansq: jnp.ndarray,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Combine per-shard batch statistics over the active bn-sync axis.

    Equal shard sizes (guaranteed by the view/slab padding in the
    sharded train step) make the pmean of per-shard (mean, mean-of-
    squares) exactly the joint-batch statistics."""
    axis = current_bn_sync_axis()
    if axis is None:
        return mean, meansq
    return jax.lax.pmean(mean, axis), jax.lax.pmean(meansq, axis)


class BatchNorm(nn.Module):
    """BatchNorm over all axes but the last, torch semantics.

    ``frozen=True`` reproduces detectron FrozenBatchNorm2d
    (``detectron_base.py:174``): always running stats, stats never updated
    (parameter freezing is an optimizer-mask concern).
    ``per_sample=True`` computes stats per leading-axis sample (the
    reference's per-frame BN path, ``ray_marching.py:427-436``).
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    frozen: bool = False
    per_sample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        use_batch_stats = train and not self.frozen
        if use_batch_stats:
            xf = x.astype(jnp.float32)
            if self.per_sample:
                axes = tuple(range(1, x.ndim - 1))
                mean = jnp.mean(xf, axis=axes, keepdims=True)
                var = jnp.mean(jnp.square(xf), axis=axes,
                               keepdims=True) - jnp.square(mean)
                upd_mean = jnp.mean(mean.reshape(-1, c), axis=0)
                upd_var = jnp.mean(var.reshape(-1, c), axis=0)
            else:
                axes = tuple(range(x.ndim - 1))
                mean = jnp.mean(xf, axis=axes)
                meansq = jnp.mean(jnp.square(xf), axis=axes)
                # joint statistics across a view/slab-sharded batch
                # (shard_ctx.bn_sync_axis) — the reference's joint-BN
                # semantics when a scene is split across devices
                mean, meansq = sync_batch_stats(mean, meansq)
                var = meansq - jnp.square(mean)
                upd_mean, upd_var = mean, var
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * upd_mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * upd_var)
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(x.dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid rows of padded sparse features.

    ME ``MinkowskiBatchNorm`` computes stats over all active voxels of the
    batch; here invalid (padding) rows are excluded via the mask.
    Input: feats [..., N, C], mask [..., N].
    """
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, feats: jnp.ndarray, mask: jnp.ndarray,
                 train: bool) -> jnp.ndarray:
        c = feats.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            m = mask.astype(jnp.float32)[..., None]
            n = jnp.maximum(jnp.sum(m), 1.0)
            xf = feats.astype(jnp.float32) * m
            mean = jnp.sum(xf, axis=tuple(range(feats.ndim - 1))) / n
            var = (jnp.sum(jnp.square(xf),
                           axis=tuple(range(feats.ndim - 1))) / n
                   - jnp.square(mean))
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (feats.astype(jnp.float32) - mean) * inv + bias
        y = jnp.where(mask[..., None], y, 0.0)
        return y.astype(feats.dtype)


class MaskedInstanceNorm(nn.Module):
    """Per-scene instance norm over valid rows (ME MinkowskiInstanceNorm,
    detection stem ``fcaf3d_backbone.py:29``).

    Input: feats [B, N, C], mask [B, N] — stats per scene, per channel.
    """
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        c = feats.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        m = mask.astype(jnp.float32)[..., None]
        n = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
        xf = feats.astype(jnp.float32) * m
        mean = jnp.sum(xf, axis=-2, keepdims=True) / n
        var = (jnp.sum(jnp.square(xf), axis=-2, keepdims=True) / n
               - jnp.square(mean))
        inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + self.epsilon)
        y = (feats.astype(jnp.float32) - mean) * inv * scale + bias
        y = jnp.where(mask[..., None], y, 0.0)
        return y.astype(feats.dtype)


class ConvBN(nn.Module):
    """Conv (2D or 3D by input rank) + optional BN + optional activation,
    torch-style explicit padding."""
    features: int
    kernel_size: int
    strides: int = 1
    use_bias: bool = False
    norm: Optional[str] = "BN"          # 'BN' | 'FrozenBN' | None
    act: Optional[Callable] = None
    conv_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        ndim = x.ndim - 2               # spatial dims
        pad = torch_padding(self.kernel_size) * ndim
        halo = current_halo_axis() if ndim == 3 else None
        if halo is not None and self.kernel_size == 3:
            # X is slab-sharded: neighbors supply the padding (zeros at
            # the global boundary), the conv runs VALID along X.  The
            # stride-2 window placement stays exact: slab starts are
            # even, so the first VALID window [x-1, x, x+1] is the same
            # window the padded unsharded conv evaluates there.
            x = halo_pad_x(x, halo, spatial_axis=1)
            pad = [(0, 0)] + torch_padding(self.kernel_size) * (ndim - 1)
        x = nn.Conv(self.features, (self.kernel_size,) * ndim,
                    strides=(self.strides,) * ndim, padding=pad,
                    use_bias=self.use_bias, dtype=self.conv_dtype,
                    name="conv")(x)
        if self.norm in ("BN", "FrozenBN"):
            x = BatchNorm(frozen=self.norm == "FrozenBN", name="norm")(
                x, train=train)
        if self.act is not None:
            x = self.act(x)
        return x


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest ×factor upsample of all spatial axes of [B, *spatial, C]
    (torch F.interpolate default-mode equivalent)."""
    for axis in range(1, x.ndim - 1):
        x = jnp.repeat(x, factor, axis=axis)
    return x


def _up2_linear_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Half-pixel ×2 linear upsample along one axis: out[2i] =
    .75·x[i] + .25·x[i-1], out[2i+1] = .75·x[i] + .25·x[i+1], edges
    clamped — the exact jax.image.resize('linear') ×2 kernel, built
    from shifted adds instead of its dense dot_general (whose backward
    materializes badly tile-padded 6-D temps on TPU; the shift form cut
    the medium train step's peak HBM by 1.7 GB, 19.69G→17.98G)."""
    n = x.shape[axis]
    lo = jnp.concatenate([jax.lax.slice_in_dim(x, 0, 1, axis=axis),
                          jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)],
                         axis=axis)
    hi = jnp.concatenate([jax.lax.slice_in_dim(x, 1, n, axis=axis),
                          jax.lax.slice_in_dim(x, n - 1, n, axis=axis)],
                         axis=axis)
    out = jnp.stack([0.75 * x + 0.25 * lo, 0.75 * x + 0.25 * hi],
                    axis=axis + 1)
    shp = list(x.shape)
    shp[axis] *= 2
    return out.reshape(shp)


def _up2_linear_axis_halo(x: jnp.ndarray, axis: int, axis_name: str
                          ) -> jnp.ndarray:
    """``_up2_linear_axis`` for a slab-sharded axis: the lo/hi shifted
    copies come from mesh neighbors (edge-clamped at the global
    boundary), so per-slab x2 upsampling equals slicing the unsharded
    result."""
    xp = halo_pad_x(x, axis_name, spatial_axis=axis, clamp_edges=True)
    n = x.shape[axis]
    lo = jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    hi = jax.lax.slice_in_dim(xp, 2, n + 2, axis=axis)
    out = jnp.stack([0.75 * x + 0.25 * lo, 0.75 * x + 0.25 * hi],
                    axis=axis + 1)
    shp = list(x.shape)
    shp[axis] *= 2
    return out.reshape(shp)


def upsample_linear(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Bi/tri-linear ×factor upsample with half-pixel centers
    (torch align_corners=False) over all spatial axes of
    [B, *spatial, C].  factor 2 uses the shift-based kernel (matches
    jax.image.resize within fp32 rounding, ~4e-7; far cheaper backward).

    Under ``shard_ctx.halo_axis`` (3D slab-sharded volumes) the first
    spatial axis exchanges halos with mesh neighbors instead of edge-
    clamping at slab boundaries."""
    if factor == 2:
        halo = current_halo_axis() if x.ndim == 5 else None
        for axis in range(1, x.ndim - 1):
            if axis == 1 and halo is not None:
                x = _up2_linear_axis_halo(x, axis, halo)
            else:
                x = _up2_linear_axis(x, axis)
        return x
    spatial = x.shape[1:-1]
    new = tuple(s * factor for s in spatial)
    return jax.image.resize(x, (x.shape[0],) + new + (x.shape[-1],),
                            method="linear")
