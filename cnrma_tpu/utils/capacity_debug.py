"""Opt-in runtime surfacing of fixed-capacity saturation.

Every dynamic-shape site of the reference (``torch.nonzero`` compaction,
ME coordinate sets, 500k subsample, 200k pruning) is a fixed-capacity
buffer here (SURVEY.md §7 "hard parts"); a mis-sized capacity silently
clips — showing up only as mAP loss.  With ``CNRMA_CAPACITY_DEBUG=1``
every capacity site prints its actual fill vs capacity per call
(``jax.debug.print`` — works inside jit), flagging saturation loudly:

    CNRMA_CAPACITY_DEBUG=1 python tools/test.py ...
    CNRMA_CAPACITY_DEBUG=1 python bench.py

Zero cost when the flag is off: ``report`` is a trace-time no-op.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def enabled() -> bool:
    return os.environ.get("CNRMA_CAPACITY_DEBUG", "") not in ("", "0")


def report(name: str, fill, capacity: int) -> None:
    """Print ``name: fill/capacity [SATURATED]`` per jitted call.

    ``fill`` is the pre-clip element count (traced scalar); saturation
    (fill >= capacity) means the buffer clipped or sits at the brim —
    either way the capacity should be raised to restore the reference's
    keep-everything semantics.
    """
    if not enabled():
        return
    fill = jnp.asarray(fill, jnp.int32)
    jax.debug.print(
        "[capacity] " + name + ": {fill}/{cap} saturated={sat}",
        fill=fill, cap=capacity,
        sat=(fill >= capacity).astype(jnp.int32))
