"""ctypes binding for the C++ LAPJV solver (native/lapjv.cpp).

Host-side exact assignment used as the oracle for the on-device solver and by
host tooling. Auto-builds the shared library on first use (g++ is in the
image; pybind11 is not, hence the plain C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "liblapjv.so"
_lib = None  # None = not attempted, False = build/load failed, CDLL = loaded


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is False:  # cached failure: don't respawn make per call
        return None
    if _lib is not None:
        return _lib
    src = _NATIVE_DIR / "lapjv.cpp"
    stale = (not _LIB_PATH.exists()
             or _LIB_PATH.stat().st_mtime < src.stat().st_mtime)
    if stale:  # (re)build so source edits actually take effect
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR), _LIB_PATH.name],
                           check=True, capture_output=True)
        except Exception:
            _lib = False
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _lib = False
        return None
    lib.lapjv_batch.restype = ctypes.c_int
    lib.lapjv_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def lapjv_batch(costs: np.ndarray, n_valid: Optional[np.ndarray] = None) -> np.ndarray:
    """costs [N, R, C] float32 (rows = targets, cols = queries, R <= C);
    n_valid [N] rows actually used. Returns col4row [N, R] int32 (-1 pad)."""
    lib = _load()
    assert lib is not None, "native lapjv unavailable (g++ build failed?)"
    costs = np.ascontiguousarray(costs, np.float32)
    N, R, C = costs.shape
    if n_valid is None:
        n_valid = np.full((N,), R, np.int32)
    n_valid = np.ascontiguousarray(n_valid, np.int32)
    out = np.empty((N, R), np.int32)
    rc = lib.lapjv_batch(
        costs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        N, R, C,
        n_valid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    assert rc == 0, f"lapjv_batch failed rc={rc}"
    return out
