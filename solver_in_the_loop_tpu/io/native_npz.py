"""ctypes binding for the native Scene I/O library (native/sceneio.cpp).

Multithreaded npz frame loading for dataset preload — the runtime-native
replacement for per-file np.load in the reference's PhifDataset
(karman_train.py:221-229). Falls back to numpy transparently when the shared
library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "libsceneio.so",
    )
    if not os.path.isfile(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.silt_npz_read.restype = ctypes.c_long
        lib.silt_npz_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.silt_npz_read_batch.restype = ctypes.c_long
        lib.silt_npz_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
        ]
        lib.silt_npz_write.restype = ctypes.c_long
        lib.silt_npz_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.silt_npz_write_batch.restype = ctypes.c_long
        lib.silt_npz_write_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _lib() is not None


def read_npz(path: str) -> Optional[np.ndarray]:
    """Read one npz frame natively; None if the library is unavailable or the
    file needs the numpy fallback."""
    lib = _lib()
    if lib is None:
        return None
    cap = 1 << 24  # 16M floats = 64MB, beyond any frame in these workloads
    out = np.empty(cap, np.float32)
    shape = (ctypes.c_long * 8)()
    ndim = ctypes.c_int()
    got = lib.silt_npz_read(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap,
        shape,
        ctypes.byref(ndim),
    )
    if got < 0:
        return None
    dims = tuple(shape[i] for i in range(ndim.value))
    return out[:got].reshape(dims).copy()


def write_npz(path: str, arr: np.ndarray, level: int = 1) -> bool:
    """Write one npz frame natively (deflate level 1 by default — the
    data-generation pipelines are host-compression-bound)."""
    lib = _lib()
    if lib is None:
        return False
    arr = np.ascontiguousarray(arr, np.float32)
    shape = (ctypes.c_long * 8)(*arr.shape)
    rc = lib.silt_npz_write(
        path.encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        shape,
        arr.ndim,
        level,
    )
    return rc == 0


def write_npz_batch(paths: List[str], arr: np.ndarray, level: int = 1) -> bool:
    """Write (N, *frame_shape) frames to N files with the native thread pool."""
    lib = _lib()
    if lib is None or not paths:
        return False
    arr = np.ascontiguousarray(arr, np.float32)
    assert arr.shape[0] == len(paths)
    stride = int(np.prod(arr.shape[1:]))
    shape = (ctypes.c_long * 8)(*arr.shape[1:])
    c_paths = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    nthreads = min(16, os.cpu_count() or 1)
    rc = lib.silt_npz_write_batch(
        c_paths,
        len(paths),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        stride,
        shape,
        arr.ndim - 1,
        level,
        nthreads,
    )
    return rc == 0


def read_npz_batch(paths: List[str], frame_shape) -> Optional[np.ndarray]:
    """Read a uniform batch of frames into one (N, *frame_shape) array using
    the native thread pool. None -> caller should fall back to numpy."""
    lib = _lib()
    if lib is None or not paths:
        return None
    stride = int(np.prod(frame_shape))
    out = np.empty((len(paths), stride), np.float32)
    c_paths = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    nthreads = min(16, os.cpu_count() or 1)
    rc = lib.silt_npz_read_batch(
        c_paths,
        len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        stride,
        nthreads,
    )
    if rc != 0:
        return None
    return out.reshape((len(paths),) + tuple(frame_shape))
