"""Batching, mixing and prefetch.

  * `BatchLoader` — shuffled epoch iteration + collate (the torch-DataLoader
    role, worker-free since decode runs in the native media lib).
  * `MetaLoader` — multi-dataset task mixing. The reference draws the task on
    rank 0 and broadcasts it so ranks stay in lockstep
    (`/root/reference/src/datasets/dataloader.py:14-62`); here the draw is a
    seeded deterministic sequence — every host computes the same choice with
    no collective at all.
  * `InfiniteIterator` — endless epoch cycling (`dataloader.py:163-176`).
  * `DevicePrefetcher` — overlaps host→device transfer of the next batch with
    the current step (the PrefetchLoader/CUDA-stream role,
    `dataloader.py:86-160`, via jax async dispatch).
"""

from __future__ import annotations

import threading
import queue as queue_mod
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


class BatchLoader:
    def __init__(
        self,
        dataset,
        collator: Callable,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_shards: int = 1,
        shard_id: int = 0,
        num_workers: int = 0,
        prefetch_factor: int = 2,
    ):
        """num_shards/shard_id shard the (seed-synchronized) shuffled order
        across hosts — the DistributedSampler role
        (`run_video_retrieval.py:115-117`).

        num_workers > 0 builds batches (decode + augment + collate) in a
        thread pool, keeping up to num_workers * prefetch_factor batches in
        flight ahead of the consumer while preserving batch order — the
        reference's `DataLoader(num_workers=n)` role (`dataloader.py` +
        `run_video_retrieval.py:115-129`). Threads, not processes: the decode
        hot path is the C++ media lib (GIL released during calls), so threads
        overlap for the expensive part without pickling batches across
        process boundaries. Datasets/collators must use thread-local RNGs
        (`alpro_tpu/data/rng.py`) when num_workers > 1."""
        self.dataset = dataset
        self.collator = collator
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._epoch = 0
        self._seed = seed
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.num_workers = num_workers
        self.prefetch_factor = prefetch_factor

    def __len__(self) -> int:
        # ceil-divide like torch's DistributedSampler: every shard is padded
        # to the same size (wrap-around), so __len__ == yielded batch count
        # on every host — lockstep consumers never desync
        n = -(-len(self.dataset) // self.num_shards)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[np.ndarray]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self._seed + self._epoch)
            rng.shuffle(order)
        if self.num_shards > 1:
            # pad with wrapped-around indices to a multiple of num_shards
            # (the reference's DistributedSampler padding,
            # `run_video_retrieval.py:115-117`), then stride
            total = -(-len(order) // self.num_shards) * self.num_shards
            if total > len(order):
                order = np.concatenate([order, order[: total - len(order)]])
            order = order[self.shard_id :: self.num_shards]
        n = len(order)
        self._epoch += 1
        end = n - (n % self.batch_size) if self.drop_last else n
        return [order[s : s + self.batch_size] for s in range(0, end, self.batch_size)]

    def _make(self, idx: np.ndarray) -> Dict:
        return self.collator([self.dataset[int(i)] for i in idx])

    def __iter__(self) -> Iterator[Dict]:
        batches = self._index_batches()
        if self.num_workers <= 0:
            for idx in batches:
                yield self._make(idx)
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        depth = max(self.num_workers * self.prefetch_factor, 1)
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = deque()
            it = iter(batches)
            for idx in batches[:depth]:
                pending.append(pool.submit(self._make, idx))
                next(it)
            while pending:
                batch = pending.popleft().result()
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(pool.submit(self._make, nxt))
                yield batch


class InfiniteIterator:
    def __init__(self, loader):
        self.loader = loader
        self._it = iter(loader)

    def __iter__(self):
        return self

    def __next__(self):
        try:
            return next(self._it)
        except StopIteration:
            self._it = iter(self.loader)
            return next(self._it)


class MetaLoader:
    """Yields (task_name, batch) sampled ∝ loader length × given ratio,
    deterministically from `seed` (lockstep across hosts by construction)."""

    def __init__(
        self,
        loaders: Dict[str, object],
        accum_steps: int = 1,
        seed: int = 0,
        ratios: Optional[Dict[str, float]] = None,
    ):
        self.names: List[str] = list(loaders.keys())
        self.iters = {k: InfiniteIterator(v) for k, v in loaders.items()}
        weights = np.asarray(
            [
                len(loaders[k]) * (ratios.get(k, 1.0) if ratios else 1.0)
                for k in self.names
            ],
            dtype=np.float64,
        )
        assert weights.sum() > 0, (
            "every loader has zero weight (empty dataset or batch_size > "
            f"len(dataset) with drop_last?): {dict(zip(self.names, weights))}"
        )
        self.probs = weights / weights.sum()
        self.accum_steps = accum_steps
        self.rng = np.random.default_rng(seed)
        self._pending = 0
        self._task: Optional[str] = None

    def __iter__(self):
        return self

    def __next__(self):
        if self._pending == 0:
            self._task = self.names[
                int(self.rng.choice(len(self.names), p=self.probs))
            ]
            self._pending = self.accum_steps
        self._pending -= 1
        return self._task, next(self.iters[self._task])


class DevicePrefetcher:
    """Wraps an iterator of numpy batches; stages device_put of batch k+1
    while batch k computes (jax dispatch is async, so a 1-deep queue in a
    thread suffices to overlap H2D with compute)."""

    def __init__(self, it: Iterator, put: Callable, depth: int = 2):
        self._it = iter(it)
        self._put = put
        self._q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
        self._done = object()
        self._err: Optional[BaseException] = None
        self._closed = False
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._it:
                staged = self._put(item)
                if self._closed:
                    break
                self._q.put(staged)
        except BaseException as e:  # surfaced to the consumer, not swallowed
            self._err = e
        finally:
            while not self._closed:  # guaranteed delivery unless closed
                try:
                    self._q.put(self._done, timeout=0.5)
                    break
                except queue_mod.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise RuntimeError(
                    "prefetch worker failed (decode/collate/staging)"
                ) from self._err
            raise StopIteration
        return item

    def close(self):
        """Stop the worker and drop staged batches — call when abandoning
        the iterator early, or depth device batches stay pinned in HBM for
        the process lifetime (the producer blocks on the full queue)."""
        self._closed = True
        try:
            while True:
                self._q.get_nowait()
        except queue_mod.Empty:
            pass
        self._thread.join(timeout=30.0)
        # release anything the producer squeezed in during the join
        try:
            while True:
                self._q.get_nowait()
        except queue_mod.Empty:
            pass
