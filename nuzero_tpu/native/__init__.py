"""Native (C++) components, loaded via ctypes.

Builds on first import if g++ is available; every consumer has a pure-
Python fallback, so a missing toolchain degrades performance, not
functionality.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libnuzero_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB):
        try:
            subprocess.run(
                ["make", "-C", _DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.xxh64.restype = ctypes.c_uint64
        lib.xxh64.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_uint64,
        ]
        lib.xxh64_batch.restype = None
        lib.xxh64_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.c_uint64,
            ctypes.c_uint64,
            ctypes.c_void_p,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def xxh64(data: bytes, seed: int = 0) -> int:
    lib = load()
    if lib is None:
        # Fallback: Python's siphash via hashlib-ish route.
        import hashlib

        return int.from_bytes(
            hashlib.blake2b(data, digest_size=8).digest(), "little"
        )
    return int(lib.xxh64(data, len(data), seed))


def xxh64_batch(records: np.ndarray, seed: int = 0) -> np.ndarray:
    """Hash each row of a 2D contiguous byte-viewable array."""
    records = np.ascontiguousarray(records)
    n = records.shape[0]
    record_bytes = records.nbytes // max(n, 1)
    out = np.empty(n, np.uint64)
    lib = load()
    if lib is None:
        for i in range(n):
            out[i] = xxh64(records[i].tobytes(), seed)
        return out
    lib.xxh64_batch(
        records.ctypes.data_as(ctypes.c_void_p),
        record_bytes,
        n,
        seed,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
