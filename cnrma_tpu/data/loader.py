"""Batch collation and a threaded prefetch loader.

Replaces the reference's torch DataLoader workers (jpg decode + TSDF
resample on CPU, ``workers_per_gpu=1``) with a thread-pool prefetcher that
overlaps host decoding with device compute and keeps a double-buffered
queue of ready batches (the host-side half of the BASELINE.json "pipelined
view streaming" plan).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np


_STACK_KEYS = ("imgs", "projection", "view_valid", "offset", "gt_boxes",
               "gt_labels", "gt_valid", "tsdf_gt_004", "tsdf_gt_008",
               "tsdf_gt_016", "tsdf_origin", "points", "point_feats",
               "point_valid")


def collate_scenes(samples: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack per-scene fixed-shape samples into a batch dict.

    Array keys are stacked on a new leading scene axis; TSDF scales are
    grouped under ``tsdf_list`` (the reference's ``data_converter`` layout,
    ``ray_marching.py:653-682``); string metadata becomes lists.
    """
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key in _STACK_KEYS:
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    out["tsdf_list"] = {
        k: out.pop(k) for k in
        ("tsdf_gt_004", "tsdf_gt_008", "tsdf_gt_016") if k in out}
    return out


class SceneLoader:
    """Iterate batches with background prefetch threads."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 num_workers: int = 2, prefetch: int = 2,
                 seed: Optional[int] = None, drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> List[List[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        batches = [idx[i:i + self.batch_size].tolist()
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last and batches and \
                len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        batches = self._batches()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        it_lock = threading.Lock()
        it = iter(enumerate(batches))
        results: Dict[int, Any] = {}
        res_lock = threading.Lock()
        res_ready = threading.Condition(res_lock)

        def worker():
            while not stop.is_set():
                with it_lock:
                    try:
                        pos, batch_idx = next(it)
                    except StopIteration:
                        return
                try:
                    batch = collate_scenes(
                        [self.dataset[i] for i in batch_idx])
                except Exception as e:     # surface loader errors in order
                    batch = e
                with res_ready:
                    results[pos] = batch
                    res_ready.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            for pos in range(len(batches)):
                with res_ready:
                    while pos not in results:
                        res_ready.wait(timeout=0.1)
                        if not any(t.is_alive() for t in threads) \
                                and pos not in results:
                            raise RuntimeError("loader workers died")
                    batch = results.pop(pos)
                if isinstance(batch, Exception):
                    raise batch
                yield batch
        finally:
            stop.set()
