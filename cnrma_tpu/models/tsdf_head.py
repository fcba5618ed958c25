"""Multi-scale TSDF regression head.

Re-implements reference ``AtlasTSDFHead`` (``models/atlas_head.py``):
per-scale 1x1x1 decoders -> tanh * label_smoothing; coarse-to-fine
sparsification (voxels whose upsampled coarser TSDF is not near the surface
are clamped to sign * 0.999); log-transformed masked L1 losses where the
coarser surface mask gates the finer scales.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cnrma_tpu.models.layers import upsample_nearest
from cnrma_tpu.ops.losses import log_transform


def tsdf_losses(output: Dict[str, jnp.ndarray],
                targets: Dict[str, jnp.ndarray],
                keys: Sequence[str],
                sparse_threshold: Sequence[float] = (0.99, 0.99, 0.99)
                ) -> Dict[str, jnp.ndarray]:
    """Log-transformed masked L1 per scale (reference ``atlas_head.py:
    56-80``), standalone so the slab-sharded train path can score gathered
    predictions.  The coarser-scale surface masks are recomputed from the
    coarser predictions — identical to the masks the head applied during
    sparsification."""
    losses: Dict[str, jnp.ndarray] = {}
    for i, key in enumerate(keys):
        pred = output[f"scene_tsdf_{key}"]
        trgt = targets[f"tsdf_gt_{key}"]
        observed = trgt < 1
        outside = jnp.all(trgt == 1, axis=-1, keepdims=True)
        l1 = jnp.abs(log_transform(pred) - log_transform(trgt))
        mask = observed | outside
        if i > 0:
            prev = output[f"scene_tsdf_{keys[i - 1]}"]
            prev_up = upsample_nearest(prev[..., None], 2)[..., 0]
            mask = mask & (jnp.abs(prev_up) < sparse_threshold[i - 1])
        denom = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
        losses[f"tsdf_loss_{key}"] = (
            jnp.sum(jnp.where(mask, l1, 0.0)) / denom)
    return losses


class TSDFHead(nn.Module):
    """Inputs: coarse->fine feature volumes [B, X, Y, Z, C_i];
    outputs dict scene_tsdf_{016,008,004} [B, X_i, Y_i, Z_i] + losses."""
    input_channels: Sequence[int] = (32, 64, 128)   # fine->coarse (config)
    n_scales: int = 3
    voxel_size: float = 0.04
    label_smoothing: float = 1.05
    sparse_threshold: Sequence[float] = (0.99, 0.99, 0.99)

    @property
    def keys(self) -> Tuple[str, ...]:
        # coarse->fine voxel size keys, e.g. ('016', '008', '004')
        sizes = [self.voxel_size * (2 ** i)
                 for i in range(self.n_scales)][::-1]
        return tuple(str(int(round(v * 100))).zfill(3) for v in sizes)

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray],
                 targets: Optional[Dict[str, jnp.ndarray]] = None
                 ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        keys = self.keys
        output: Dict[str, jnp.ndarray] = {}
        losses: Dict[str, jnp.ndarray] = {}

        for i, x in enumerate(xs):
            tsdf = jnp.tanh(
                nn.Conv(1, (1, 1, 1), use_bias=False,
                        name=f"decoder{i}")(x.astype(jnp.float32))[..., 0]
            ) * self.label_smoothing
            if i > 0:
                prev = output[f"scene_tsdf_{keys[i - 1]}"]
                prev_up = upsample_nearest(prev[..., None], 2)[..., 0]
                near_surface = (jnp.abs(prev_up)
                                < self.sparse_threshold[i - 1])
                tsdf = jnp.where(near_surface, tsdf,
                                 jnp.sign(prev_up) * 0.999)
            output[f"scene_tsdf_{keys[i]}"] = tsdf

        if targets is not None:
            losses = tsdf_losses(output, targets, keys,
                                 self.sparse_threshold)
        return output, losses
