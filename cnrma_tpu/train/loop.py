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
                    "points", "point_feats", "point_valid", "scene_seed")


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
                    donate: bool = True, split: bool = False,
                    view_axis: Optional[str] = None) -> Callable:
    """Returns jitted ``step(state, batch, rng) -> (state, log_vars)``.

    ``view_axis`` (requires a ``mesh`` carrying both ``axis`` and
    ``view_axis``, e.g. ``make_mesh(shape=(2, 4), axis_names=('data',
    'view'))``) additionally shards each scene ACROSS the devices of the
    view axis — views for the 2D tower / volume / ray marching, X-axis
    slabs for the 3D U-Net — via
    ``CNRMA.forward_view_sharded``.  This is the memory-scaling path for
    the reference's stage-3 finetune workload that does not fit a single
    16 GB chip (doc/performance.md "Training throughput"); gradients,
    losses and BN stats come back as exact joint-scene values — sharded
    modules as psum-assembled true partials, the replicated detector as
    a pmean of identical full gradients (the ``scale_grad`` boundary in
    the forward makes both exact; proven by
    ``tests/test_view_sharded.py:TestBoundaryGradParity``).

    With ``mesh`` the gradient computation runs under ``shard_map`` over
    ``mesh[axis]``: each device executes the model on its LOCAL scene
    shard (so the per-scene ``batch_map`` bodies stay unbatched and fast)
    and gradients/losses/BN stats combine with explicit ``pmean`` — the
    reference's DDP + ``reduce_mean`` semantics (``ray_marching.py:573-587``,
    ``fcaf3d_head.py:188-198``).  Without ``mesh`` the step is a plain
    global-batch GSPMD program; its batch axis is traced in
    ``vmap_batch_mode`` so a device-sharded batch partitions per-op
    instead of being all-gathered around a sequential scan.

    ``split=True`` (requires ``mesh``) separates the step into TWO
    compiled programs: a collective-free ``shard_map`` that leaves each
    device's (loss, losses, batch_stats, grads) stacked along a sharded
    leading device axis, and a tiny reduce+update program whose mean over
    that axis is the only cross-device collective (DDP with a separate
    gradient-bucket all-reduce, rather than a fused one).  The heavy
    program contains NO collectives, so runtimes whose in-program
    rendezvous is fragile under load (XLA:CPU's hard 40 s deadline on a
    1-core host — see ``__graft_entry__.dryrun_multichip``) cannot
    deadlock in it.  Semantics vs the fused step: identical gradient /
    log-var / BN means; only the detection loss's cross-rank
    positive-count normalization (``fcaf3d_head.py:188-198``) stays
    per-device, i.e. unsynced — the same approximation single-GPU
    training makes.
    """
    from cnrma_tpu.utils.batching import vmap_batch_mode

    def grads_and_logs(params, batch_stats, batch, rng_sample, rng_aug,
                       pmean_axis=None):
        mdl = model
        if pmean_axis is not None and hasattr(model, "pmean_axis"):
            mdl = model.clone(pmean_axis=pmean_axis)

        def loss_fn(params):
            if view_axis is not None:
                out, mutated = mdl.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch, view_axis,
                    rngs={"sample": rng_sample, "aug": rng_aug},
                    mutable=["batch_stats"],
                    method=mdl.forward_view_sharded)
            else:
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

    if view_axis is not None and mesh is None:
        raise ValueError("view_axis requires a mesh")
    if split:
        if mesh is None:
            raise ValueError("split=True requires a mesh")
        if view_axis is not None:
            raise ValueError("split mode is data-parallel only")
        return _make_split_train_step(model, tx, mesh, axis,
                                      grads_and_logs, donate)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        def reduce_view(grads):
            """Assemble the exact per-scene gradient across the view
            axis: sharded modules (tower/U-Net/TSDF head) return TRUE
            per-device partials (the ``scale_grad`` boundary in
            ``forward_view_sharded`` normalizes the replicated-tail
            cotangents) — summed with psum; the replicated detector
            computes the full gradient on every device — averaged."""
            return {k: (jax.lax.pmean(v, view_axis) if k == "detector"
                        else jax.lax.psum(v, view_axis))
                    for k, v in grads.items()}

        def per_device(params, batch_stats, batch, rng_sample, rng_aug):
            # distinct sample/aug streams per DATA shard; devices of the
            # same view row must share the stream (replicated tail)
            ix = jax.lax.axis_index(axis)
            loss, losses, new_stats, grads = grads_and_logs(
                params, batch_stats, batch,
                jax.random.fold_in(rng_sample, ix),
                jax.random.fold_in(rng_aug, ix), pmean_axis=axis)
            if view_axis is not None:
                grads = reduce_view(grads)
                # losses/stats are view-replicated; pmean = identity
                loss = jax.lax.pmean(loss, view_axis)
                losses = jax.lax.pmean(losses, view_axis)
                new_stats = jax.lax.pmean(new_stats, view_axis)
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


def _flatten_bucket(tree) -> jnp.ndarray:
    """Ravel every leaf to one f32 vector (DDP-style gradient bucket)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate(
        [jnp.ravel(x).astype(jnp.float32) for x in leaves]) \
        if leaves else jnp.zeros((0,), jnp.float32)


def _unflatten_bucket(tree_like, flat: jnp.ndarray):
    """Inverse of ``_flatten_bucket`` against a shape/dtype template."""
    leaves, treedef = jax.tree_util.tree_flatten(tree_like)
    out, off = [], 0
    for x in leaves:
        n = int(np.prod(x.shape)) if x.shape else 1
        out.append(flat[off:off + n].reshape(x.shape).astype(x.dtype))
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def _make_split_train_step(model, tx, mesh, axis, grads_and_logs,
                           donate) -> Callable:
    """Two-program DDP step (see ``make_train_step(split=True)``).

    Program 1 (heavy, collective-FREE): ``shard_map`` computes each
    device's grads/losses/BN stats and flattens them into one f32 bucket
    per device — stacked along a sharded leading axis.  Program 2 (tiny):
    means the bucket over the device axis — exactly ONE all-reduce, the
    DDP single-bucket layout — then unflattens and applies the
    optimizer.  One rendezvous point per step keeps XLA:CPU's in-process
    collectives robust (a per-leaf mean emits ~1k all-reduces whose
    serialized rendezvous on a 1-core host trips the hard 40 s
    deadline — observed), and on real hardware one fused all-reduce
    rides ICI better than a thousand small ones.
    """
    from jax.sharding import PartitionSpec as P

    def per_device(params, batch_stats, batch, rng_sample, rng_aug):
        ix = jax.lax.axis_index(axis)
        loss, losses, new_stats, grads = grads_and_logs(
            params, batch_stats, batch,
            jax.random.fold_in(rng_sample, ix),
            jax.random.fold_in(rng_aug, ix))
        bucket = _flatten_bucket({"stats": new_stats, "grads": grads})
        # the ~1k-leaf grads/stats travel as ONE bucket; the handful of
        # scalar log vars stay a dict (a few extra tiny all-reduces)
        lead = lambda t: jax.tree_util.tree_map(lambda x: x[None], t)
        return bucket[None], lead(losses), loss[None]

    grads_fn = jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P(axis)), check_vma=False))

    def reduce_apply(state, buckets, losses_s, loss_s):
        mean = jnp.mean(buckets, axis=0)          # the ONE big collective
        parts = _unflatten_bucket(
            {"stats": state.batch_stats, "grads": state.params}, mean)
        grads, new_stats = parts["grads"], parts["stats"]
        new_state = state.apply_gradients(grads, new_stats)
        log_vars = {k: jnp.mean(v, axis=0) for k, v in losses_s.items()}
        log_vars["total_loss"] = jnp.mean(loss_s, axis=0)
        log_vars["grad_norm"] = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.square(x)), grads, 0.0) ** 0.5
        return new_state, log_vars

    reduce_fn = jax.jit(reduce_apply,
                        donate_argnums=(0,) if donate else ())

    def step(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        rng_sample, rng_aug = jax.random.split(jax.random.fold_in(
            rng, state.step))
        buckets, losses_s, loss_s = grads_fn(
            state.params, state.batch_stats, batch, rng_sample, rng_aug)
        return reduce_fn(state, buckets, losses_s, loss_s)

    return step


def make_eval_step(model) -> Callable:
    """Jitted test-mode apply.  Traced under ``vmap_batch_mode`` so a
    device-sharded multi-scene batch partitions per-op instead of hitting
    the ``lax.map`` all-gather pathology (see ``utils/batching.py``);
    single-scene batches still take the b==1 shortcut."""
    from cnrma_tpu.utils.batching import vmap_batch_mode

    def step(variables, batch):
        with vmap_batch_mode(True):
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


def evaluate_val(model, state: TrainState, val_loader,
                 eval_step=None) -> Dict[str, float]:
    """Mean per-batch losses over a validation loader (test-mode apply —
    losses are computed whenever GT is present, ``cn_rma.py:393-398``).
    The reference's mid-training ``evaluation = dict(interval=...)`` hook
    (``configs/ray_marching_scannet.py:47``) re-scores the val split each
    interval; loss means are the dataset-free analog, and callers can
    layer mAP on top via ``tools/evaluate_bbox.py`` on the saved
    predictions."""
    if eval_step is None:
        eval_step = make_eval_step(model)
    sums: Dict[str, float] = {}
    n = 0
    for batch in val_loader:
        out = eval_step({"params": state.params,
                         "batch_stats": state.batch_stats},
                        device_batch(batch))
        losses = jax.device_get(out["losses"])
        for k, v in losses.items():
            sums[k] = sums.get(k, 0.0) + float(np.mean(v))
        sums["total_loss"] = sums.get("total_loss", 0.0) + float(
            np.mean(jax.device_get(total_loss(losses))))
        n += 1
    return {f"val/{k}": v / max(n, 1) for k, v in sums.items()}


def evaluate_val_map(model, state: TrainState, val_loader,
                     eval_step=None, score_thr: float = 0.01,
                     iou_thr: float = 0.5) -> Dict[str, float]:
    """mAP@0.25/0.5 over a validation loader: test-mode apply -> per-scene
    in-framework NMS -> ``indoor_eval`` — the reference's metric-driven
    evaluation workflow (``post_process/nms_bbox.py`` +
    ``evaluate_bbox.py``) run inline each eval interval, so best-checkpoint
    selection tracks the metric that actually ships rather than val loss."""
    from cnrma_tpu.eval.indoor_eval import indoor_eval
    from cnrma_tpu.ops.nms import multiclass_nms_np

    if eval_step is None:
        eval_step = make_eval_step(model)
    gts, preds = [], []
    for batch in val_loader:
        out = jax.device_get(eval_step(
            {"params": state.params, "batch_stats": state.batch_stats},
            device_batch(batch)))
        if "bboxes" not in out:
            return {}
        gt_boxes = np.asarray(batch["gt_boxes"])
        gt_labels = np.asarray(batch["gt_labels"])
        gt_valid = np.asarray(batch["gt_valid"])
        for i in range(gt_boxes.shape[0]):
            bv = np.asarray(out["bbox_valid"][i], bool)
            boxes, scores, labels = multiclass_nms_np(
                np.asarray(out["bboxes"][i])[bv],
                np.asarray(out["scores"][i])[bv],
                score_thr=score_thr, iou_thr=iou_thr)
            # model boxes/GT carry gravity-center z; indoor_eval takes
            # bottom-z (DepthInstance3DBoxes storage)
            b = np.array(boxes, np.float32, copy=True)
            if len(b):
                b[:, 2] -= b[:, 5] / 2
            g = np.array(gt_boxes[i][gt_valid[i]], np.float32, copy=True)
            if len(g):
                g[:, 2] -= g[:, 5] / 2
            preds.append({"boxes": b, "scores": scores, "labels": labels})
            gts.append({"gt_boxes": g[:, :6],
                        "labels": gt_labels[i][gt_valid[i]]})
    m = indoor_eval(gts, preds, iou_thrs=(0.25, 0.5),
                    rotated=bool(getattr(model, "with_yaw", False)),
                    logger=None)
    return {"val/mAP_0.25": m.get("mAP_0.25", 0.0),
            "val/mAP_0.50": m.get("mAP_0.50", 0.0),
            "val/mAR_0.25": m.get("mAR_0.25", 0.0)}


def run_training(model, tx, loader, *, epochs: int, state: TrainState,
                 work_dir: str, lr_schedule=None, seed: int = 0,
                 log_interval: int = 10, checkpoint_interval: int = 10,
                 mesh=None, start_epoch: int = 0,
                 max_steps: Optional[int] = None,
                 val_loader=None, eval_interval: int = 1,
                 eval_metric: str = "loss",
                 view_axis: Optional[str] = None) -> TrainState:
    """Epoch-based training driver.  ``max_steps`` stops early (smoke
    runs / debugging), checkpointing the final state.

    With ``val_loader``, every ``eval_interval`` epochs the val split is
    scored and the best state is kept as the ``best`` checkpoint — the
    reference's per-interval evaluation + ``save_best`` hook behavior.
    ``eval_metric='loss'`` selects by lowest total val loss;
    ``'mAP'`` additionally runs in-framework NMS + ``indoor_eval`` and
    selects by highest val mAP@0.25 (the metric the reference's offline
    workflow optimizes)."""
    mesh = mesh or make_mesh()
    step_fn = make_train_step(
        model, tx, mesh=mesh if mesh.size > 1 else None,
        view_axis=view_axis if mesh.size > 1 else None)
    eval_step = make_eval_step(model) if val_loader is not None else None
    logger = TextLogger(work_dir, log_interval)
    rng = jax.random.PRNGKey(seed)
    state = replicate(state, mesh)
    best_val = float("inf")

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
        if val_loader is not None and (
                done or (epoch + 1) % eval_interval == 0
                or epoch + 1 == epochs):
            val_vars = evaluate_val(model, state, val_loader, eval_step)
            if eval_metric == "mAP":
                val_vars.update(evaluate_val_map(
                    model, state, val_loader, eval_step))
            logger(0, epoch, val_vars, float("nan"))
            # loss minimizes, mAP maximizes — compare on a signed score
            score = (-val_vars.get("val/mAP_0.25", 0.0)
                     if eval_metric == "mAP"
                     else val_vars.get("val/total_loss", float("inf")))
            if score < best_val:
                best_val = score
                save_checkpoint(
                    os.path.join(work_dir, "best"), state,
                    meta={"epoch": epoch + 1,
                          "val_total_loss":
                              val_vars.get("val/total_loss"),
                          "val_mAP_0.25":
                              val_vars.get("val/mAP_0.25"),
                          "eval_metric": eval_metric,
                          "framework": "cnrma_tpu"})
        if done or (epoch + 1) % checkpoint_interval == 0 \
                or epoch + 1 == epochs:
            save_checkpoint(
                os.path.join(work_dir, f"epoch_{epoch + 1}"), state,
                meta={"epoch": epoch + 1, "framework": "cnrma_tpu"})
        if done:
            break
    return state
