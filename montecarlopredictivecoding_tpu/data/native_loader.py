"""ctypes bindings for the native C++ data-loader runtime.

Compiles ``data/native/idx_loader.cc`` on first use (g++, cached as a shared
object next to the source) and exposes:

* :func:`read_idx_native` — IDX file reader;
* :func:`preprocess_images` — threaded uint8 -> float32 with the reference's
  scale / binarize / normalize modes;
* :func:`gather_batch` — threaded shuffled-minibatch row gather.

Every entry point has a numpy fallback, so the framework works without a
compiler; ``native_available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import typing as tp

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "idx_loader.cc")
_SO = os.path.join(_HERE, "native", "libidx_loader.so")
_lock = threading.Lock()
_lib: tp.Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _SO, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> tp.Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.idx_read_header.restype = ctypes.c_int
        lib.idx_read_header.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.idx_read_data.restype = ctypes.c_int
        lib.idx_read_data.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        lib.preprocess_images.restype = None
        lib.preprocess_images.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int, ctypes.c_float,
        ]
        lib.gather_batch.restype = None
        lib.gather_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def read_idx_native(path: str) -> np.ndarray:
    """IDX reader through the native library (numpy/struct fallback in
    data.mnist handles gz and absence of a compiler)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    shape = (ctypes.c_int64 * 4)()
    ndim = ctypes.c_int()
    offset = ctypes.c_int64()
    rc = lib.idx_read_header(path.encode(), shape, ctypes.byref(ndim), ctypes.byref(offset))
    if rc != 0:
        raise ValueError(f"idx_read_header({path}) failed with code {rc}")
    dims = tuple(int(shape[i]) for i in range(ndim.value))
    size = int(np.prod(dims))
    out = np.empty(size, dtype=np.uint8)
    rc = lib.idx_read_data(
        path.encode(), offset.value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size,
    )
    if rc != 0:
        raise ValueError(f"idx_read_data({path}) failed with code {rc}")
    return out.reshape(dims)


MODE_SCALE = 0      # x / 255
MODE_BINARIZE = 1   # reference BinaryMNIST (threshold 0.5)
MODE_NORMALIZE = 2  # reference Normalize(0.5, 0.5) -> [-1, 1]


def preprocess_images(
    raw: np.ndarray, mode: int = MODE_SCALE, threshold: float = 0.5
) -> np.ndarray:
    """Threaded uint8 -> float32 preprocessing; numpy fallback when the
    native library is unavailable."""
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    lib = _load()
    if lib is None:
        x = raw.astype(np.float32) / 255.0
        if mode == MODE_BINARIZE:
            return (x > threshold).astype(np.float32)
        if mode == MODE_NORMALIZE:
            return (x - 0.5) / 0.5
        return x
    out = np.empty(raw.shape, dtype=np.float32)
    lib.preprocess_images(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        raw.size, mode, threshold,
    )
    return out


def gather_batch(data: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """out[i] = data[idx[i]] with native threading (numpy fallback)."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int32)
    lib = _load()
    if lib is None:
        return data[idx]
    out = np.empty((len(idx),) + data.shape[1:], dtype=np.float32)
    dim = int(np.prod(data.shape[1:])) if data.ndim > 1 else 1
    lib.gather_batch(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(idx), dim,
    )
    return out
