"""Optimizer / LR schedule construction from reference-style config dicts.

Covers the reference's optimizer surface (``ray_marching_scannet.py:32-34``:
AdamW lr 1e-3 wd 1e-4, grad-clip 10, step LR [80,110];
``atlas_recon_scannet.py``: Adam 5e-4, clip 35, step [300]) plus the
``freeze_at`` semantics: parameters of the frozen 2D stages (stem + res2,
detectron ``freeze()``) receive zero updates via an optax partition mask.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Sequence

import jax
import optax


FROZEN_PREFIXES_FREEZE_AT_2 = ("tower2d/resnet/stem", "tower2d/resnet/res2_")


def build_lr_schedule(lr_config: Mapping[str, Any], base_lr: float,
                      steps_per_epoch: int) -> optax.Schedule:
    """mmcv-style lr_config -> optax schedule (epoch boundaries)."""
    policy = lr_config.get("policy", "step")
    if policy == "step":
        gamma = lr_config.get("gamma", 0.1)
        boundaries = {int(e) * steps_per_epoch: gamma
                      for e in lr_config.get("step", [])}
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    if policy == "fixed":
        return optax.constant_schedule(base_lr)
    raise ValueError(f"unsupported lr policy {policy!r}")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def frozen_mask(params, frozen_prefixes: Sequence[str]):
    """Pytree of labels: 'frozen' for masked paths, 'train' otherwise."""
    def label(path, _):
        p = _path_str(path)
        return ("frozen" if any(p.startswith(pre) or f"/{pre}" in p
                                for pre in frozen_prefixes) else "train")
    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(optimizer_cfg: Mapping[str, Any],
                    lr_schedule: optax.Schedule,
                    grad_clip: Optional[float] = None,
                    params=None,
                    frozen_prefixes: Sequence[str] = ()
                    ) -> optax.GradientTransformation:
    """Reference config dict -> optax transformation chain."""
    typ = optimizer_cfg.get("type", "AdamW")
    wd = optimizer_cfg.get("weight_decay", 0.0)
    if typ == "AdamW":
        opt = optax.adamw(lr_schedule, weight_decay=wd)
    elif typ == "Adam":
        opt = optax.adam(lr_schedule)
    elif typ == "SGD":
        opt = optax.sgd(lr_schedule,
                        momentum=optimizer_cfg.get("momentum", 0.9))
    else:
        raise ValueError(f"unsupported optimizer {typ!r}")

    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if frozen_prefixes and params is not None:
        labels = frozen_mask(params, frozen_prefixes)
        parts.append(optax.multi_transform(
            {"train": opt, "frozen": optax.set_to_zero()}, labels))
    else:
        parts.append(opt)
    return optax.chain(*parts)
