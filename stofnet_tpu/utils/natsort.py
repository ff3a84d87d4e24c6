"""Natural (human) sorting — replaces the natsort dependency the reference
uses for dataset file ordering (datasets/chirp_dataset.py:5,72-74)."""

from __future__ import annotations

import re
from typing import Iterable, List, TypeVar

T = TypeVar("T")

_CHUNK = re.compile(r"(\d+)")


def natural_key(value) -> tuple:
    parts = _CHUNK.split(str(value))
    return tuple(int(p) if p.isdigit() else p.lower() for p in parts)


def natsorted(items: Iterable[T]) -> List[T]:
    return sorted(items, key=natural_key)
