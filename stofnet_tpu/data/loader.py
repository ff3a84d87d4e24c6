"""Batching, splitting, and host->device prefetch.

Replaces torch's DataLoader(num_workers=min(4,cpu))/random_split
(main.py:101-111) with a numpy pipeline: seeded 80/20 split, shuffled
batching with a thread-pool ``__getitem__`` (the C++ ASCII loader releases
the GIL, native/fastloader.cpp, so threads give true I/O parallelism
without torch's worker processes), and a one-deep device prefetch
(jax.device_put of batch N+1 overlaps the step on batch N — dispatch is
async, so the transfer rides under compute).
"""

from __future__ import annotations

import os
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence, Tuple

import numpy as np


def default_num_workers() -> int:
    """The reference's worker count heuristic (main.py:107-111)."""
    return min(4, os.cpu_count() or 1)


def split_dataset(n: int, val_percent: float, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Seeded random split; returns (train_indices, val_indices)."""
    n_val = int(n * val_percent)
    perm = np.random.default_rng(seed).permutation(n)
    return perm[n_val:], perm[:n_val]


class DataLoader:
    """Iterates a dataset subset in batches of stacked numpy arrays.

    Items must be tuples; array-like fields are stacked, str fields are
    collected into lists. ``drop_last`` mirrors the reference's eval loader.
    """

    def __init__(self, dataset, indices: Optional[Sequence[int]] = None,
                 batch_size: int = 4, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_workers: int = 0, prefetch_batches: int = 2):
        self.dataset = dataset
        self.indices = np.asarray(
            indices if indices is not None else np.arange(len(dataset)))
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._seed = seed
        self.rng = np.random.default_rng(seed)
        self.num_workers = int(num_workers)
        self.prefetch_batches = max(1, int(prefetch_batches))

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle stream to (seed, epoch): epoch e's batch order
        is a pure function of (seed, e), so a run resumed at epoch e
        replays the exact order an uninterrupted run would have used
        (torch DistributedSampler.set_epoch convention)."""
        self.rng = np.random.default_rng((self._seed, int(epoch)))

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self):
        order = self.indices.copy()
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        stop = len(order) - (len(order) % bs) if self.drop_last else len(order)
        return [order[i:i + bs] for i in range(0, stop, bs)]

    def __iter__(self) -> Iterator[Tuple]:
        batches = self._batch_indices()
        if self.num_workers <= 0:
            for b in batches:
                items = [self.dataset[int(j)] for j in b]
                yield tuple(_collate(field) for field in zip(*items))
            return
        # thread-pool items, pipelined prefetch_batches ahead: item loads
        # (loadtxt / C++ fastloader, GIL-released) overlap the device step
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = deque()
            ahead = self.prefetch_batches
            for b in batches[:ahead]:
                pending.append([pool.submit(self.dataset.__getitem__, int(j))
                                for j in b])
            for k in range(len(batches)):
                if k + ahead < len(batches):
                    pending.append(
                        [pool.submit(self.dataset.__getitem__, int(j))
                         for j in batches[k + ahead]])
                items = [f.result() for f in pending.popleft()]
                yield tuple(_collate(field) for field in zip(*items))


def _collate(field):
    first = field[0]
    if isinstance(first, str):
        return list(field)
    return np.stack([np.asarray(x) for x in field])


def pipeline_batches(host_iter, put: Callable):
    """One-deep device prefetch yielding (host_batch, device_batch) pairs.

    ``put`` maps a host batch to device arrays (jnp.asarray or a
    mesh-sharded device_put); the put of batch N+1 is dispatched before
    batch N is consumed, so the H2D transfer rides under the step's compute.
    Host batches stay available for logging/plotting.
    """
    it = iter(host_iter)
    try:
        nxt = next(it)
    except StopIteration:
        return
    nxt_dev = put(nxt)
    for host in it:
        cur, cur_dev = nxt, nxt_dev
        nxt, nxt_dev = host, put(host)
        yield cur, cur_dev
    yield nxt, nxt_dev


def prefetch_to_device(iterator, device=None):
    """One-deep pipelined jax.device_put over an iterator of pytrees."""
    import jax

    it = iter(iterator)
    try:
        nxt = jax.tree.map(
            lambda x: jax.device_put(x, device)
            if isinstance(x, np.ndarray) else x, next(it))
    except StopIteration:
        return
    for item in it:
        cur, nxt = nxt, jax.tree.map(
            lambda x: jax.device_put(x, device)
            if isinstance(x, np.ndarray) else x, item)
        yield cur
    yield nxt
