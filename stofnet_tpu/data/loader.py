"""Batching, splitting, and host->device prefetch.

Replaces torch's DataLoader/random_split (main.py:101-111) with a plain
numpy pipeline: seeded 80/20 split, shuffled batching, and an optional
one-deep device prefetch (jax.device_put of batch N+1 overlaps the step on
batch N — dispatch is async, so the transfer rides under compute).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import numpy as np


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
                 drop_last: bool = False, seed: int = 0):
        self.dataset = dataset
        self.indices = np.asarray(
            indices if indices is not None else np.arange(len(dataset)))
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple]:
        order = self.indices.copy()
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        stop = len(order) - (len(order) % bs) if self.drop_last else len(order)
        for i in range(0, stop, bs):
            items = [self.dataset[int(j)] for j in order[i:i + bs]]
            yield tuple(_collate(field) for field in zip(*items))


def _collate(field):
    first = field[0]
    if isinstance(first, str):
        return list(field)
    return np.stack([np.asarray(x) for x in field])


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
