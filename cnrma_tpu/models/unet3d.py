"""Dense 3D U-Net over the accumulated feature volume.

Re-implements the reference ``AtlasBackbone3D`` (``models/backbone3d.py``):
channels [32,64,128,256], layers_down [1,2,3,4], layers_up [3,2,1],
BasicBlock3d residual units with zero-init residual BN, trilinear x2
decoder upsampling, projected skip with (x+y)/2 fuse, multi-scale outputs
coarse->fine [1/4, 1/2, 1/1].

TPU notes: channels-last [B, X, Y, Z, C]; conv3d lowers to MXU matmuls;
the encoder is the model's FLOPs hot spot at 192^3/256^2x96 volumes, so the
module exposes ``remat`` to checkpoint blocks.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cnrma_tpu.models.layers import (
    BatchNorm, ConvBN, sync_batch_stats, upsample_linear)
from cnrma_tpu.utils.shard_ctx import current_halo_axis, halo_pad_x

relu = jax.nn.relu


class BasicBlock3dZeroInit(nn.Module):
    """3x3x3 residual block with the bn2 *scale parameter* initialized to
    zero — the block starts as identity (reference zero_init_residual)."""
    features: int
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        y = ConvBN(self.features, 3, 1, norm="BN", act=relu,
                   conv_dtype=self.compute_dtype,
                   name="conv1")(x, train=train)
        halo = current_halo_axis()
        pad = [(1, 1)] * 3
        if halo is not None:            # X slab-sharded (shard_ctx)
            y = halo_pad_x(y, halo, spatial_axis=1)
            pad = [(0, 0), (1, 1), (1, 1)]
        y = nn.Conv(self.features, (3, 3, 3), padding=pad,
                    use_bias=False, dtype=self.compute_dtype,
                    name="conv2")(y)
        y = BatchNormZero(name="bn2")(y, train=train)
        return relu(x + y)


class BatchNormZero(BatchNorm):
    """BatchNorm whose scale initializes to zero."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.zeros, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            meansq = jnp.mean(jnp.square(xf), axis=axes)
            mean, meansq = sync_batch_stats(mean, meansq)
            var = meansq - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(x.dtype)


class UNet3D(nn.Module):
    """Encoder-decoder over [B, X, Y, Z, C]; returns coarse->fine feature
    list [1/4 @ ch[2], 1/2 @ ch[1], 1/1 @ ch[0]] for the default config
    ``channels=[32,64,128,256]`` (reference ``ray_marching_scannet.py:162``).
    """
    channels: Sequence[int] = (32, 64, 128, 256)
    layers_down: Sequence[int] = (1, 2, 3, 4)
    layers_up: Sequence[int] = (3, 2, 1)
    remat: bool = False
    compute_dtype: Optional[jnp.dtype] = None   # bf16 keeps convs on MXU

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool
                 ) -> Tuple[jnp.ndarray, ...]:
        block = BasicBlock3dZeroInit
        if self.remat:
            block = nn.remat(block, static_argnums=(2,))

        # encoder
        skips = []
        for b in range(self.layers_down[0]):
            x = block(self.channels[0], compute_dtype=self.compute_dtype,
                      name=f"down0_block{b}")(x, train)
        skips.append(x)
        for i in range(1, len(self.channels)):
            x = ConvBN(self.channels[i], 3, 2, norm="BN", act=relu,
                       conv_dtype=self.compute_dtype,
                       name=f"down{i}_stride")(x, train=train)
            for b in range(self.layers_down[i]):
                x = block(self.channels[i],
                          compute_dtype=self.compute_dtype,
                          name=f"down{i}_block{b}")(x, train)
            skips.append(x)

        # decoder: coarse -> fine
        outs = []
        rev = list(self.channels[::-1])           # e.g. [256,128,64,32]
        for i in range(1, len(rev)):
            x = upsample_linear(x, 2)
            x = nn.Conv(rev[i], (1, 1, 1), use_bias=False,
                        dtype=self.compute_dtype,
                        name=f"up{i}_conv")(x)
            # projected skip (ConditionalProjection with condition=False):
            # conv1x1 + BN + relu on the encoder feature
            skip = skips[len(rev) - 1 - i]
            y = nn.Conv(rev[i], (1, 1, 1), use_bias=False,
                        dtype=self.compute_dtype,
                        name=f"up{i}_proj")(skip)
            y = BatchNorm(name=f"up{i}_proj_norm")(y, train=train)
            y = relu(y)
            x = (x + y) / 2
            for b in range(self.layers_up[i - 1]):
                x = block(rev[i], compute_dtype=self.compute_dtype,
                          name=f"up{i}_block{b}")(x, train)
            outs.append(x)
        return tuple(outs)
