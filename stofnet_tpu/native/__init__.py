"""Native (C++) runtime components, consumed via ctypes.

``loadtxt`` is a drop-in for the 1-2 column numeric files the chirp dataset
reads (np.loadtxt semantics for those shapes), backed by
fastloader.cpp. The shared library builds on first use with g++ -O3 and
caches next to the source; if no compiler is available everything degrades
to numpy transparently.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "fastloader.cpp"
_LIB = Path(__file__).parent / "libfastloader.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = (_LIB.exists() and _SRC.exists()
                 and _SRC.stat().st_mtime > _LIB.stat().st_mtime)
        if (not _LIB.exists() or stale) and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
            lib.fastload_floats.restype = ctypes.c_long
            lib.fastload_floats.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
                ctypes.c_long, ctypes.POINTER(ctypes.c_long)]
            lib.fastload_filesize.restype = ctypes.c_long
            lib.fastload_filesize.argtypes = [ctypes.c_char_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def _py_loadtxt(path) -> np.ndarray:
    """Pure-python fallback with the SAME semantics as the C fast path:
    whitespace OR comma separated, '#' comments stripped, column count
    from the first numeric line, (n,) for one column / (n, c) otherwise,
    and a LOUD ValueError on unparseable tokens — silently dropping one
    would shift every subsequent value and surface (if at all) as a
    confusing reshape error far from the corrupt file.
    (np.loadtxt itself can't parse comma files and squeezes single-row
    files to 1-D, so it is NOT a drop-in here.)"""
    vals: list = []
    ncols = 0
    with open(path, encoding="utf-8-sig") as f:  # tolerate a BOM like C
        for lineno, line in enumerate(f, 1):
            line = line.split("#", 1)[0].replace(",", " ")
            nums = []
            for tok in line.split():
                # python float() is MORE permissive than the C strtod
                # sweep ('1_0' parses as 10.0!) — reject separators the
                # C path flags so both paths agree on what is corrupt
                try:
                    if "_" in tok:
                        raise ValueError
                    nums.append(float(tok))
                except ValueError:
                    raise ValueError(
                        f"{path}: line {lineno}: unparseable numeric "
                        f"token {tok!r}") from None
            if not nums:
                continue
            if ncols == 0:
                ncols = len(nums)
            vals.extend(nums)
    arr = np.asarray(vals, dtype=np.float64)
    if ncols <= 1:
        return arr
    return arr.reshape(-1, ncols)


def loadtxt(path) -> np.ndarray:
    """np.loadtxt equivalent for whitespace/comma-separated numeric files
    ((n,) for one column, (n, c) otherwise)."""
    lib = get_lib()
    if lib is None:
        return _py_loadtxt(path)
    bpath = str(path).encode()
    size = lib.fastload_filesize(bpath)
    if size < 0:
        raise FileNotFoundError(path)
    cap = max(size // 2 + 16, 64)  # >= one value per 2 bytes is impossible
    out = np.empty(cap, dtype=np.float64)
    ncols = ctypes.c_long(0)
    n = lib.fastload_floats(
        bpath, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cap, ctypes.byref(ncols))
    if n == -2:
        # corrupt content: re-parse in python for an error that names the
        # offending line/token (the pure-python path raises on the same
        # inputs the C sweep flags)
        return _py_loadtxt(path)
    if n < 0:
        raise IOError(f"fastloader failed on {path}")
    vals = out[:n]
    c = max(int(ncols.value), 1)
    if c == 1:
        return vals.copy()
    return vals.reshape(-1, c).copy()
