"""Profiling / timing utilities.

The reference has no tracing at all (SURVEY.md §5); here every driver can
produce XLA traces (``jax.profiler``) and per-stage wall-clock stats for
the scenes/sec/chip north star.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


def force_ready(r) -> None:
    """Force device completion of every array leaf in ``r``.

    ``jax.block_until_ready`` is unreliable through remote-relay platforms
    (axon): it can return before the computation really finished.  Fetching
    a dependent [:1] slice to the host forces completion with a negligible
    transfer.
    """
    for leaf in jax.tree_util.tree_leaves(r):
        if hasattr(leaf, "reshape"):
            jax.device_get(leaf.reshape(-1)[:1])


class StageTimer:
    """Accumulates blocking wall-clock per named stage."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name}: {tot:.3f}s total, "
                         f"{tot / max(n, 1) * 1000:.1f}ms/call x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """XLA profiler trace (view with tensorboard / xprof) — no-op when
    log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
