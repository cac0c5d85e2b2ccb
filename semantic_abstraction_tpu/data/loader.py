"""Batching + prefetching loader, torch-free.

Replaces the reference's torch DataLoader(num_workers=8, persistent) +
DistributedSampler stack (reference: utils.py:506-520, eval.py:57-59).

- ``collate``: stacks numpy samples BATCH-MAJOR (string fields become
  lists-of-per-sample-values; the reference's torch collate transposes
  string lists patch-major, forcing ``np.array(...).T`` gymnastics at
  every use site — we keep batch-major and document it).
- ``ShardedSampler``: deterministic per-epoch shuffling + per-host
  sharding (the DistributedSampler equivalent for multi-host meshes).
- ``DataLoader``: a thread-pool prefetcher. HDF5 gzip decode and numpy
  subsampling release the GIL for the heavy parts; thread workers avoid
  fork+h5py pitfalls while overlapping host decode with device steps.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def collate(samples: List[dict]) -> Dict[str, object]:
    """Stack a list of sample dicts into one batch dict (batch-major)."""
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out


class ShardedSampler:
    """Deterministic per-epoch shuffled index sharding
    (reference DistributedSampler semantics, utils.py:506-512)."""

    def __init__(self, num_samples: int, num_shards: int = 1, shard_id: int = 0,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = False):
        self.num_samples = num_samples
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def indices(self) -> np.ndarray:
        idx = np.arange(self.num_samples)
        if self.shuffle:
            rng = np.random.RandomState(self.seed * 7919 + self.epoch)
            rng.shuffle(idx)
        if self.drop_last:
            usable = (len(idx) // self.num_shards) * self.num_shards
            idx = idx[:usable]
        else:
            pad = (-len(idx)) % self.num_shards
            if pad:
                idx = np.concatenate([idx, idx[:pad]])
        return idx[self.shard_id :: self.num_shards]


class DataLoader:
    """Thread-prefetched batched iterator over a dataset."""

    def __init__(self, dataset, batch_size: int = 1, num_workers: int = 4,
                 sampler: Optional[ShardedSampler] = None, shuffle: bool = True,
                 seed: int = 0, prefetch: int = 2, drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(0, num_workers)
        self.sampler = sampler or ShardedSampler(
            len(dataset), shuffle=shuffle, seed=seed
        )
        self.prefetch = prefetch
        self.drop_last = drop_last

    def set_epoch(self, epoch: int):
        self.sampler.set_epoch(epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self):
        n = len(self.sampler.indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> List[np.ndarray]:
        idx = self.sampler.indices()
        nb = len(idx) // self.batch_size if self.drop_last else (
            (len(idx) + self.batch_size - 1) // self.batch_size
        )
        return [idx[i * self.batch_size : (i + 1) * self.batch_size]
                for i in range(nb)]

    def __iter__(self) -> Iterator[dict]:
        batches = self._batches()
        if self.num_workers == 0:
            for b in batches:
                yield collate([self.dataset[int(i)] for i in b])
            return

        from concurrent.futures import ThreadPoolExecutor

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                futures = [
                    pool.submit(
                        lambda bb: collate([self.dataset[int(i)] for i in bb]), b
                    )
                    for b in batches
                ]
                for fut in futures:
                    if stop.is_set():
                        for f in futures:
                            f.cancel()
                        return
                    try:
                        q.put(("ok", fut.result()))
                    except Exception as e:  # surface worker errors to consumer
                        q.put(("err", e))
                        return
            q.put(("done", None))

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                kind, payload = q.get()
                if kind == "done":
                    return
                if kind == "err":
                    raise payload
                yield payload
        finally:
            stop.set()
