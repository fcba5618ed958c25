"""Training / evaluation drivers.

Replaces the reference's mmcv EpochBasedRunner + hooks stack
(``train.py:215-255``, ``RayMarching.train_step/parse_losses``,
``ray_marching.py:547-633``):

* one jitted ``train_step`` (forward + backward + AdamW + clip) over a
  ``('data',)`` mesh — GSPMD inserts the gradient reductions DDP performed;
* ``parse_losses`` semantics: total = sum of entries with 'loss' in the
  key; all log vars are global (cross-device) means by construction since
  the batch axis is sharded inside one program;
* text logging every ``log_interval`` steps, epoch checkpoints via orbax.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cnrma_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from cnrma_tpu.train.state import TrainState, save_checkpoint


BATCH_ARRAY_KEYS = ("imgs", "projection", "view_valid", "offset",
                    "gt_boxes", "gt_labels", "gt_valid",
                    "points", "point_feats", "point_valid")


def device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Strip host-only metadata and group TSDF targets."""
    out = {k: jnp.asarray(batch[k]) for k in BATCH_ARRAY_KEYS
           if k in batch}
    if "tsdf_list" in batch:
        out["tsdf_list"] = {k: jnp.asarray(v)
                            for k, v in batch["tsdf_list"].items()}
    return out


def total_loss(losses: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Sum of all entries whose key contains 'loss'
    (reference ``parse_losses``, ``ray_marching.py:569-570``)."""
    return sum(v for k, v in losses.items() if "loss" in k)


def make_train_step(model, tx, mesh=None, axis: str = "data",
                    donate: bool = True) -> Callable:
    """Returns jitted ``step(state, batch, rng) -> (state, log_vars)``.

    With ``mesh`` the gradient computation runs under ``shard_map`` over
    ``mesh[axis]``: each device executes the model on its LOCAL scene
    shard (so the per-scene ``batch_map`` bodies stay unbatched and fast)
    and gradients/losses/BN stats combine with explicit ``pmean`` — the
    reference's DDP + ``reduce_mean`` semantics (``ray_marching.py:573-587``,
    ``fcaf3d_head.py:188-198``).  Without ``mesh`` the step is a plain
    global-batch GSPMD program; its batch axis is traced in
    ``vmap_batch_mode`` so a device-sharded batch partitions per-op
    instead of being all-gathered around a sequential scan.
    """
    from cnrma_tpu.utils.batching import vmap_batch_mode

    def grads_and_logs(params, batch_stats, batch, rng_sample, rng_aug,
                       pmean_axis=None):
        mdl = model
        if pmean_axis is not None and hasattr(model, "pmean_axis"):
            mdl = model.clone(pmean_axis=pmean_axis)

        def loss_fn(params):
            out, mutated = mdl.apply(
                {"params": params, "batch_stats": batch_stats},
                batch, train=True,
                rngs={"sample": rng_sample, "aug": rng_aug},
                mutable=["batch_stats"])
            losses = out["losses"]
            return total_loss(losses), (losses, mutated["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return loss, losses, new_stats, grads

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        def per_device(params, batch_stats, batch, rng_sample, rng_aug):
            # distinct sample/aug streams per device shard
            ix = jax.lax.axis_index(axis)
            loss, losses, new_stats, grads = grads_and_logs(
                params, batch_stats, batch,
                jax.random.fold_in(rng_sample, ix),
                jax.random.fold_in(rng_aug, ix), pmean_axis=axis)
            # DDP gradient mean + cross-rank log averaging; BN running
            # stats are averaged too (reference leaves them per-rank)
            pm = lambda t: jax.lax.pmean(t, axis)
            return pm(loss), pm(losses), pm(new_stats), pm(grads)

        inner = jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(), P()),
            out_specs=(P(), P(), P(), P()), check_vma=False)
    else:
        inner = grads_and_logs

    def step(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        rng_sample, rng_aug = jax.random.split(jax.random.fold_in(
            rng, state.step))
        with vmap_batch_mode(mesh is None):
            loss, losses, new_stats, grads = inner(
                state.params, state.batch_stats, batch, rng_sample,
                rng_aug)
        new_state = state.apply_gradients(grads, new_stats)
        log_vars = {k: v for k, v in losses.items()}
        log_vars["total_loss"] = loss
        log_vars["grad_norm"] = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.square(x)), grads, 0.0) ** 0.5
        return new_state, log_vars

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model) -> Callable:
    def step(variables, batch):
        return model.apply(variables, batch, train=False)
    return jax.jit(step)


class TextLogger:
    """mmcv-TextLoggerHook-style periodic line logger."""

    def __init__(self, work_dir: Optional[str] = None, interval: int = 10):
        self.interval = interval
        self.t0 = time.time()
        self.log_file = None
        if work_dir:
            os.makedirs(work_dir, exist_ok=True)
            self.log_file = open(
                os.path.join(work_dir, "train.log"), "a")

    def __call__(self, step: int, epoch: int, log_vars: Dict[str, Any],
                 lr: float) -> None:
        if step % self.interval != 0:
            return
        parts = [f"epoch {epoch}", f"iter {step}", f"lr {lr:.2e}",
                 f"t {time.time() - self.t0:.1f}s"]
        parts += [f"{k} {float(v):.4f}" for k, v in log_vars.items()]
        line = "  ".join(parts)
        print(line, flush=True)
        if self.log_file:
            self.log_file.write(line + "\n")
            self.log_file.flush()


def run_training(model, tx, loader, *, epochs: int, state: TrainState,
                 work_dir: str, lr_schedule=None, seed: int = 0,
                 log_interval: int = 10, checkpoint_interval: int = 10,
                 mesh=None, start_epoch: int = 0,
                 max_steps: Optional[int] = None) -> TrainState:
    """Epoch-based training driver.  ``max_steps`` stops early (smoke
    runs / debugging), checkpointing the final state."""
    mesh = mesh or make_mesh()
    step_fn = make_train_step(model, tx,
                              mesh=mesh if mesh.size > 1 else None)
    logger = TextLogger(work_dir, log_interval)
    rng = jax.random.PRNGKey(seed)
    state = replicate(state, mesh)

    done = False
    for epoch in range(start_epoch, epochs):
        for batch in loader:
            db = shard_batch(device_batch(batch), mesh)
            state, log_vars = step_fn(state, db, rng)
            step = int(state.step)
            lr = (float(lr_schedule(step)) if lr_schedule is not None
                  else float("nan"))
            logger(step, epoch, jax.device_get(log_vars), lr)
            if max_steps is not None and step >= max_steps:
                done = True
                break
        if done or (epoch + 1) % checkpoint_interval == 0 \
                or epoch + 1 == epochs:
            save_checkpoint(
                os.path.join(work_dir, f"epoch_{epoch + 1}"), state,
                meta={"epoch": epoch + 1, "framework": "cnrma_tpu"})
        if done:
            break
    return state
