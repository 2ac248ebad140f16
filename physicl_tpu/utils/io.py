"""Measurement IO: CSV writers with a native C++ fast path.

``write_rows`` reproduces the reference CSV format (", "-joined ``str()`` of
each element, physicl/__init__.py:365-378). Dense numeric matrices take the
native writer in ``native/fastcsv.cpp`` (auto-built with g++ on first use,
loaded via ctypes); ragged/object rows fall back to the Python writer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["write_rows", "write_matrix", "native_available"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfastcsv.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load_native():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH):
            src = os.path.join(_NATIVE_DIR, "fastcsv.cpp")
            try:
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                     "-o", _SO_PATH, src],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.physicl_write_csv.restype = ctypes.c_int64
            lib.physicl_write_csv.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p,
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load_native() is not None


def write_matrix(path: str, matrix: np.ndarray, sep: str = ", ") -> None:
    """Write a dense 2-D float matrix as CSV (native fast path if possible)."""
    m = np.ascontiguousarray(matrix, dtype=np.float64)
    if m.ndim != 2:
        raise ValueError("write_matrix needs a 2-D array")
    lib = _load_native()
    if lib is not None:
        rc = lib.physicl_write_csv(
            path.encode(), m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            m.shape[0], m.shape[1], sep.encode(),
        )
        if rc == 0:
            return
    with open(path, "w") as f:
        for row in m:
            f.write(sep.join(repr(float(x)) for x in row) + "\n")


def write_rows(path: str, rows, sep: str = ", ") -> None:
    """Write heterogeneous measurement rows (reference format parity).

    Uniform numeric rows are dispatched to the native matrix writer;
    everything else uses the reference's ``str()``-join format.
    """
    rows = list(rows)
    if rows:
        try:
            m = np.asarray(rows, dtype=np.float64)
            if m.ndim == 2:
                write_matrix(path, m, sep)
                return
        except (ValueError, TypeError):
            pass
    with open(path, "w") as f:
        for x in rows:
            f.write(sep.join(str(i) for i in list(x)) + "\n")
