"""Access to the read-only reference implementation for golden tests.

The reference (hahnec/stofnet, PyTorch) is mounted at /root/reference. Tests
import its modules to generate golden outputs and compare our JAX
implementations against them. Nothing from the reference is vendored into
this repo; it is only loaded at test time, and tests degrade to skips when
the reference tree is unavailable.
"""

import sys
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def available() -> bool:
    return REFERENCE_ROOT.is_dir()


def add_to_path():
    p = str(REFERENCE_ROOT)
    if p not in sys.path:
        sys.path.insert(0, p)


def ckpt_path(prefix: str):
    """Find a reference checkpoint by name prefix (main.py:174 semantics)."""
    ckpts = REFERENCE_ROOT / "ckpts"
    if not ckpts.is_dir():
        return None
    for fn in sorted(ckpts.iterdir()):
        if fn.name.startswith(prefix.split("_")[0]):
            return fn
    return None
