"""Batch-axis mapping that avoids vmap's batched-gather lowering.

The pipeline's hot stages are gather-bound (backprojection, ray-marching
TSDF lookups, sparse-tensor kernel maps).  ``jax.vmap`` over the scene
batch axis rewrites those gathers into batched-gather HLO, which XLA:TPU
lowers ~3-4x slower than the plain 1-D row gather (measured: full-scale
volume accumulation 3.96 s vmapped vs 1.07 s direct for the SAME 50-view
workload).

Scenes are independent and the per-device batch is 1-2 by design (the
reference trains 1 scene/GPU, ``ray_marching_scannet.py:77``), so by
default the batch axis is mapped *sequentially* with ``lax.map`` — the
body compiles once with unbatched gathers; batch parallelism comes from
the device mesh (the ``shard_map`` train step in ``train/loop.py``), not
from within a program.

The exception is a GSPMD program whose batch axis is device-sharded
(``make_train_step(mesh=None)`` on sharded inputs): there ``lax.map``
would force XLA to all-gather the shards and replicate the whole scan on
every device, while ``vmap`` partitions each batched op cleanly along
the batch dimension.  ``vmap_batch_mode()`` switches batch_map to vmap
for the duration of such a trace.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Any, Callable

import jax

_MODE = threading.local()


@contextmanager
def vmap_batch_mode(on: bool = True):
    """Trace-time switch: inside this context ``batch_map`` uses
    ``jax.vmap`` (GSPMD-partitionable) instead of sequential ``lax.map``.
    The choice bakes into the traced program."""
    prev = getattr(_MODE, "vmap", False)
    _MODE.vmap = on
    try:
        yield
    finally:
        _MODE.vmap = prev


def batch_map(fn: Callable, *args: Any) -> Any:
    """Apply ``fn`` over the leading (scene) axis of every leaf in ``args``.

    Semantically identical to ``jax.vmap(fn)(*args)``.  ``b == 1``
    short-circuits to a squeeze/apply/expand (no loop machinery at all);
    larger batches run a sequential ``lax.map`` whose body is compiled
    once — or ``jax.vmap`` inside a ``vmap_batch_mode()`` context (see
    module docstring).
    """
    leaves = jax.tree_util.tree_leaves(args)
    b = leaves[0].shape[0]
    bad = [x.shape for x in leaves if x.shape[:1] != (b,)]
    if bad:
        raise ValueError(
            f"batch_map: every leaf must share the leading (batch) axis "
            f"{b}; got leaf shapes {bad[:3]}")
    if b == 1:
        out = fn(*jax.tree_util.tree_map(lambda x: x[0], args))
        return jax.tree_util.tree_map(lambda x: x[None], out)
    if getattr(_MODE, "vmap", False):
        return jax.vmap(fn)(*args)
    return jax.lax.map(lambda a: fn(*a), args)
