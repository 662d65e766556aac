"""Native (C++) host-side data ops with transparent numpy fallback.

Compiled lazily on first use with the baked-in g++; if compilation fails
(no toolchain), the numpy path is used silently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libgather.so")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(os.path.join(_HERE, "gather.cpp"))
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                 os.path.join(_HERE, "gather.cpp"), "-o", _SO],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.gather_rows.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        lib.gather_rows_u8_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int,
        ]
        _LIB = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        print(f"[mmvae_tpu.native] falling back to numpy gather: {e}",
              file=sys.stderr)
        _LIB = None
    return _LIB


def _available_cpus() -> int:
    try:
        return max(1, len(os.sched_getaffinity(0)))
    except AttributeError:  # pragma: no cover
        return os.cpu_count() or 1


def fast_gather(arr: np.ndarray, idx: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """dst[k] = arr[idx[k]] — multithreaded when the native lib is available."""
    lib = _load()
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if lib is None or not arr.flags.c_contiguous:
        return arr[idx]
    n_threads = n_threads or min(_available_cpus(), 16)
    out = np.empty((len(idx),) + arr.shape[1:], dtype=arr.dtype)
    row_bytes = int(np.prod(arr.shape[1:])) * arr.itemsize
    lib.gather_rows(
        arr.ctypes.data_as(ctypes.c_char_p),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.c_char_p),
        len(idx), row_bytes, n_threads,
    )
    return out


def gather_u8_to_f32(arr: np.ndarray, idx: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """Fused gather + uint8->f32/255 conversion."""
    lib = _load()
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if lib is None or arr.dtype != np.uint8 or not arr.flags.c_contiguous:
        return (arr[idx].astype(np.float32)) / 255.0
    n_threads = n_threads or min(_available_cpus(), 16)
    out = np.empty((len(idx),) + arr.shape[1:], dtype=np.float32)
    row_elems = int(np.prod(arr.shape[1:]))
    lib.gather_rows_u8_to_f32(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(idx), row_elems, n_threads,
    )
    return out
