"""Host-side batching / prefetching loader — the replacement for the
reference's torch DataLoader(num_workers=8) + WeightedRandomSampler
(experiments/train_roma_outdoor.py:236-246).

Thread-pool decode (PIL/h5py release the GIL) + a small prefetch queue that
overlaps host IO with device steps. Per-host sharding for multi-host runs is
a slice of the sampled indices (reference: per-RANK dataset randomization).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

BATCH_KEYS = ("im_A", "im_B", "im_A_depth", "im_B_depth", "K1", "K2", "T_1to2")


def weighted_sample_indices(
    rng: np.random.RandomState, weights: np.ndarray, num_samples: int
) -> np.ndarray:
    """WeightedRandomSampler(replacement=False) via Gumbel top-k on host."""
    g = rng.gumbel(size=len(weights))
    scores = np.log(np.maximum(weights, 1e-30)) + g
    return np.argpartition(-scores, num_samples - 1)[:num_samples]


class DataLoader:
    """Iterates stacked-numpy batches with background prefetch.

    Args:
      dataset: indexable returning per-pair dicts.
      indices: epoch order (e.g. from weighted_sample_indices).
      batch_size: global batch (caller shards over the mesh).
      num_workers: decode threads.
      prefetch: batches queued ahead.
      process_index/process_count: multi-host slice of the index stream.
    """

    def __init__(
        self,
        dataset,
        indices,
        batch_size: int,
        num_workers: int = 8,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
        keys=BATCH_KEYS,
    ):
        self.dataset = dataset
        self.indices = np.asarray(indices)[process_index::process_count]
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.keys = keys

    def __len__(self):
        return len(self.indices) // self.batch_size

    def _make_batch(self, pool, idx_chunk):
        items = list(pool.map(self.dataset.__getitem__, idx_chunk))
        return {k: np.stack([np.asarray(it[k]) for it in items]) for k in self.keys}

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for start in range(0, len(self), 1):
                    chunk = self.indices[
                        start * self.batch_size : (start + 1) * self.batch_size
                    ]
                    q.put(self._make_batch(pool, chunk))
            q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
