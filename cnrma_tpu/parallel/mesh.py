"""Device mesh + sharding helpers.

Replaces the reference's NCCL/DDP distribution (``dist_train.sh``,
``train.py:163-171``, ``MMDistributedDataParallel``) with ``jax.sharding``:
a 1-D ``('data',)`` mesh shards the scene batch axis; GSPMD inserts the
gradient all-reduces that DDP did explicitly, and the in-loss cross-rank
reductions (``reduce_mean`` of positive counts, log-var all_reduce)
become ordinary global means over the sharded batch axis.

``view_psum_volume`` is the view-parallel path: the volume accumulator is a
commutative sum (SURVEY.md §5), so views shard across devices and the
(volume, count) partials combine with one ``psum`` over ICI — the direct
analog of ring/all-reduce sequence parallelism for this workload.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              devices: Optional[Sequence[jax.Device]] = None,
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """1-D ``('data',)`` mesh by default; pass ``shape`` (and matching
    ``axis_names``) for multi-axis layouts, e.g. ``shape=(2, 4),
    axis_names=('data', 'view')`` — 2 scene shards x 4-way intra-scene
    view/slab sharding (``train/loop.py:make_train_step(view_axis=...)``)."""
    devices = list(devices) if devices is not None else jax.devices()
    if shape is not None:
        n = int(np.prod(shape))
        return Mesh(np.array(devices[:n]).reshape(tuple(shape)),
                    axis_names)
    n = n_devices or len(devices)
    mesh_shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices[:n]).reshape(mesh_shape), axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """device_put every array leaf with its leading axis sharded.

    One batched ``device_put`` call for the whole tree: per-leaf puts
    dispatch a transfer each (measured 30+ s for a full train state's
    ~1k leaves on a 1-core host vs <1 s batched).
    """
    return _batched_put(
        batch, NamedSharding(mesh, P(axis)),
        lambda x: isinstance(x, (np.ndarray, jnp.ndarray))
        and np.ndim(x) >= 1)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate every array leaf across the mesh (single batched put)."""
    return _batched_put(tree, NamedSharding(mesh, P()),
                        lambda x: hasattr(x, "shape"))


def _batched_put(tree: Any, sh: NamedSharding, want) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    idx = [i for i, x in enumerate(leaves) if want(x)]
    moved = jax.device_put([leaves[i] for i in idx], [sh] * len(idx))
    out = list(leaves)
    for i, m in zip(idx, moved):
        out[i] = m
    return jax.tree_util.tree_unflatten(treedef, out)


def view_psum_volume(accumulate_fn, axis_name: str = "view"):
    """Wrap a per-shard volume accumulation so view shards combine by psum.

    ``accumulate_fn(proj_shard, feat_shard, valid_shard) ->
    (vol_sum [X,Y,Z,C], count_sum [X,Y,Z])`` runs on each device's view
    shard inside ``shard_map``; the returned closure produces the
    normalized global volume.  Wired into
    ``ops.backproject.accumulate_views_view_sharded``.
    """
    def fn(proj, feats, valid):
        vol, cnt = accumulate_fn(proj, feats, valid)
        vol = jax.lax.psum(vol, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)
        denom = jnp.where(cnt > 0, cnt, 1.0)
        return vol / denom[..., None], cnt > 0
    return fn
