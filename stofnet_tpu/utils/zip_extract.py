"""Zip extraction for dataset archives.

Parity target: /root/reference/utils/zip_extract.py + main.py:79-80 — a
``data_dir`` ending in .zip is extracted next to itself once, then used as a
directory.
"""

from __future__ import annotations

import zipfile
from pathlib import Path


def zip_extract(path: str | Path) -> Path:
    """Extract ``<name>.zip`` to its parent dir (idempotent); returns the
    extracted directory path (``<name>/``)."""
    path = Path(path)
    target = path.with_suffix("")
    if str(path).lower().endswith(".zip") and path.exists() and not target.exists():
        with zipfile.ZipFile(path) as zf:
            zf.extractall(path.parent)
    return target
