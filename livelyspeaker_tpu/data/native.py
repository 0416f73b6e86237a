"""ctypes bindings for the native record-gather library.

Builds ``native/record_gather.cc`` with g++ on first use (cached next to the
source); every entry point has a numpy fallback so the pure-Python path keeps
working on machines without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["get_lib", "gather_rows", "gather_rows_prefix",
           "gather_rows_transpose"]

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "record_gather.cc")
_SO = os.path.join(os.path.dirname(__file__), "..", "native", "record_gather.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.gather_rows_bytes.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
            ]
            lib.gather_rows_transpose_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.gather_rows_prefix_bytes.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int,
            ]
            lib.gather_rows_transpose_crop_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p,
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def gather_rows(src: np.ndarray, indices: np.ndarray,
                n_threads: int = 1) -> np.ndarray:
    """src[indices] as one contiguous batch buffer."""
    indices = np.ascontiguousarray(indices, np.int64)
    lib = get_lib()
    row_shape = src.shape[1:]
    if lib is None or not src.flags["C_CONTIGUOUS"]:
        return np.ascontiguousarray(src[indices])
    out = np.empty((len(indices),) + row_shape, dtype=src.dtype)
    row_bytes = int(np.prod(row_shape, dtype=np.int64)) * src.dtype.itemsize
    lib.gather_rows_bytes(
        src.ctypes.data if hasattr(src, "ctypes") else None,
        indices.ctypes.data,
        len(indices),
        row_bytes,
        out.ctypes.data,
        n_threads,
    )
    return out


def gather_rows_transpose(src: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """src[indices] with each [T, C] row transposed to [C, T]."""
    assert src.ndim == 3 and src.dtype == np.float32
    indices = np.ascontiguousarray(indices, np.int64)
    lib = get_lib()
    n, t, c = len(indices), src.shape[1], src.shape[2]
    if lib is None:
        return np.ascontiguousarray(src[indices].transpose(0, 2, 1))
    out = np.empty((n, c, t), np.float32)
    lib.gather_rows_transpose_f32(
        src.ctypes.data, indices.ctypes.data, n, t, c, out.ctypes.data
    )
    return out


def gather_rows_prefix(
    src: np.ndarray, indices: np.ndarray, n_first: int, n_threads: int = 1
) -> np.ndarray:
    """src[indices, :n_first] as one contiguous buffer — the window/audio
    crop fused into the gather (one memcpy instead of gather-then-crop)."""
    indices = np.ascontiguousarray(indices, np.int64)
    lib = get_lib()
    if lib is None or not src.flags["C_CONTIGUOUS"]:
        return np.ascontiguousarray(src[indices, :n_first])
    tail = src.shape[2:]
    out = np.empty((len(indices), n_first) + tail, dtype=src.dtype)
    tail_elems = int(np.prod(tail, dtype=np.int64)) if tail else 1
    item = src.dtype.itemsize
    lib.gather_rows_prefix_bytes(
        src.ctypes.data,
        indices.ctypes.data,
        len(indices),
        src.shape[1] * tail_elems * item,
        n_first * tail_elems * item,
        out.ctypes.data,
        n_threads,
    )
    return out


def gather_rows_transpose_crop(
    src: np.ndarray, indices: np.ndarray, t_out: int
) -> np.ndarray:
    """src[indices, :t_out] with each [T, C] row transposed to [C, t_out] —
    gather + frame crop + channels-major transpose in one pass (the motion
    layout the denoiser consumes)."""
    assert src.ndim == 3 and src.dtype == np.float32
    indices = np.ascontiguousarray(indices, np.int64)
    lib = get_lib()
    n, t, c = len(indices), src.shape[1], src.shape[2]
    if lib is None or not src.flags["C_CONTIGUOUS"]:
        return np.ascontiguousarray(src[indices, :t_out].transpose(0, 2, 1))
    out = np.empty((n, c, t_out), np.float32)
    lib.gather_rows_transpose_crop_f32(
        src.ctypes.data, indices.ctypes.data, n, t, t_out, c, out.ctypes.data
    )
    return out
