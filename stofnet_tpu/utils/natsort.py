"""Natural (human) sorting — replaces the natsort dependency the reference
uses for dataset file ordering (datasets/chirp_dataset.py:5,72-74)."""

from __future__ import annotations

import re
from typing import Iterable, List, TypeVar

T = TypeVar("T")

_CHUNK = re.compile(r"(\d+)")


def natural_key(value) -> tuple:
    # text chunks compare ordinally (case-sensitive), matching the natsort
    # library's default that the reference uses — lowercasing would reorder
    # mixed-case names vs the reference pipeline
    parts = _CHUNK.split(str(value))
    return tuple(int(p) if p.isdigit() else p for p in parts)


def natsorted(items: Iterable[T]) -> List[T]:
    return sorted(items, key=natural_key)
