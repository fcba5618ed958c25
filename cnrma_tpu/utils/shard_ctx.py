"""Trace-time contexts for intra-scene model sharding.

The stage-3 finetune workload (192x192x80 grid, 40 views — reference
``ray_marching_scannet.py:12-19,77``) does not fit one 16 GB v5e chip
(doc/performance.md "Training throughput"): the live set is dominated by
the 2D tower's per-view activations and the U-Net's full-resolution
volumes.  The view-sharded train step (``train/loop.py``,
``cn_rma.py:forward_view_sharded``) splits a scene across the devices of
a ``'view'`` mesh axis: views shard for the tower / volume accumulation /
ray marching, and the dense 3D volumes shard into X-axis slabs for the
U-Net + TSDF head.

These contexts let the existing layer code participate without changing
its parameter structure (checkpoint compatibility):

* ``bn_sync_axis(name)`` — BatchNorm computes batch statistics with a
  ``pmean`` over the named axis, so view/slab-sharded batches produce
  exactly the joint-batch statistics (equal shard sizes; the reference
  trains with joint BN over all views, ``ray_marching.py:419-426``).
* ``halo_axis(name)`` — dense 3D convs exchange 1-voxel halos along the
  first spatial axis via ``ppermute`` and drop their X zero-padding, so
  each device convolves only its slab while the math stays identical to
  the unsharded conv (``ppermute`` delivers zeros at the global
  boundary — exactly the torch zero padding).

Both are contextvars read at TRACE time: wrap the sharded module calls
only; replicated stages (the sparse detector) trace outside the context.
"""

from __future__ import annotations

import contextlib
import functools
from contextvars import ContextVar
from typing import Optional

import jax
import jax.numpy as jnp

_BN_SYNC: ContextVar[Optional[str]] = ContextVar("cnrma_bn_sync_axis",
                                                 default=None)
_HALO: ContextVar[Optional[str]] = ContextVar("cnrma_halo_axis",
                                              default=None)


@contextlib.contextmanager
def bn_sync_axis(axis_name: Optional[str]):
    tok = _BN_SYNC.set(axis_name)
    try:
        yield
    finally:
        _BN_SYNC.reset(tok)


def current_bn_sync_axis() -> Optional[str]:
    return _BN_SYNC.get()


@contextlib.contextmanager
def halo_axis(axis_name: Optional[str]):
    tok = _HALO.set(axis_name)
    try:
        yield
    finally:
        _HALO.reset(tok)


def current_halo_axis() -> Optional[str]:
    return _HALO.get()


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _scale_grad_impl(x, factor):
    return x


def _scale_grad_fwd(x, factor):
    return x, None


def _scale_grad_bwd(factor, _res, g):
    return (g * factor,)


_scale_grad_impl.defvjp(_scale_grad_fwd, _scale_grad_bwd)


def scale_grad(tree, factor: float):
    """Identity forward; cotangent scaled by ``factor`` on the way back.

    The sharded->replicated boundary correction of the view-sharded
    train step: a value produced by an ``all_gather``/``psum`` and then
    consumed by computation REPLICATED across the axis sends its
    cotangent into the collective transpose once per device — the
    transpose sums the n identical copies, inflating upstream gradients
    n-fold.  Wrapping the gathered value with ``scale_grad(1/n)`` makes
    the summed boundary cotangent exactly the true one, so sharded-
    module gradients come back as TRUE partials (assembled with
    ``psum``) while the replicated module's own parameters still see
    full gradients (assembled with ``pmean``).
    """
    return jax.tree_util.tree_map(
        lambda x: (_scale_grad_impl(x, factor)
                   if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                   else x), tree)


def _perm_fwd(n: int):
    return [(i, i + 1) for i in range(n - 1)]


def _perm_bwd(n: int):
    return [(i + 1, i) for i in range(n - 1)]


def halo_pad_x(x: jnp.ndarray, axis_name: str, spatial_axis: int = 1,
               clamp_edges: bool = False) -> jnp.ndarray:
    """Pad a slab-sharded axis with 1-element halos from mesh neighbors.

    ``x``: per-device slab, e.g. [B, Xs, Y, Z, C]; the halo travels along
    ``axis_name``.  Non-receiving edge devices get zeros (= torch conv
    zero padding); ``clamp_edges=True`` substitutes the device's own edge
    element instead (= edge-clamped interpolation).
    """
    n = jax.lax.axis_size(axis_name)
    sl_lo = [slice(None)] * x.ndim
    sl_lo[spatial_axis] = slice(0, 1)
    sl_hi = [slice(None)] * x.ndim
    sl_hi[spatial_axis] = slice(x.shape[spatial_axis] - 1, None)
    first, last = x[tuple(sl_lo)], x[tuple(sl_hi)]
    if n == 1:
        left = jnp.zeros_like(first) if not clamp_edges else first
        right = jnp.zeros_like(last) if not clamp_edges else last
    else:
        # device i sends its LAST slice to i+1 (arrives as i+1's left
        # halo) and its FIRST slice to i-1 (right halo)
        left = jax.lax.ppermute(last, axis_name, _perm_fwd(n))
        right = jax.lax.ppermute(first, axis_name, _perm_bwd(n))
        if clamp_edges:
            ix = jax.lax.axis_index(axis_name)
            left = jnp.where(ix == 0, first, left)
            right = jnp.where(ix == n - 1, last, right)
    return jnp.concatenate([left, x, right], axis=spatial_axis)
