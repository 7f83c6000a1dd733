"""ctypes bindings for the native host-runtime library (native/slam_io.cc).

Provides the threaded dataset prefetcher + decoder used by the dataset
drivers: frames are decoded by a C++ worker pool ahead of the tracker so
image IO never sits on the per-frame critical path (the reference does a
synchronous cv::imread per frame inside its main loops).

Falls back cleanly when the library has not been built — callers check
`available()`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "native", "build", "libslam_io.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO):
        build = os.path.join(_REPO, "native", "build.sh")
        if os.path.exists(build):
            try:
                subprocess.run(["sh", build], check=True, capture_output=True)
            except Exception:
                return None
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.slam_prefetch_open.restype = ctypes.c_void_p
    lib.slam_prefetch_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.slam_prefetch_get.restype = ctypes.c_int
    lib.slam_prefetch_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    lib.slam_prefetch_take.restype = ctypes.c_int
    lib.slam_prefetch_take.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    lib.slam_prefetch_close.argtypes = [ctypes.c_void_p]
    lib.slam_decode_image.restype = ctypes.c_int
    lib.slam_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_void_p,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_image(path: str) -> Optional[np.ndarray]:
    """Decode one PNG/PGM/PPM to grayscale (uint8 or uint16)."""
    lib = _load()
    if lib is None:
        return None
    header = (ctypes.c_int * 4)()
    rc = lib.slam_decode_image(path.encode(), header, None)
    if rc != 0 or header[3] != 1:
        return None
    w, h, depth = header[0], header[1], header[2]
    dtype = np.uint8 if depth == 8 else np.uint16
    out = np.empty((h, w), dtype)
    lib.slam_decode_image(path.encode(), header, out.ctypes.data_as(ctypes.c_void_p))
    return out


class NativePrefetcher:
    """In-order frame stream decoded ahead by a C++ worker pool."""

    def __init__(self, paths: list[str], n_threads: int = 2, window: int = 16):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.slam_prefetch_open(arr, len(self._paths), n_threads, window)
        self._n = len(paths)

    def __len__(self):
        return self._n

    def get(self, index: int) -> Optional[np.ndarray]:
        header = (ctypes.c_int * 4)()
        if self._lib.slam_prefetch_get(self._handle, index, header) != 0:
            return None
        if header[3] != 1:
            return None
        w, h, depth = header[0], header[1], header[2]
        dtype = np.uint8 if depth == 8 else np.uint16
        out = np.empty((h, w), dtype)
        rc = self._lib.slam_prefetch_take(
            self._handle, index, out.ctypes.data_as(ctypes.c_void_p)
        )
        return out if rc == 0 else None

    def close(self):
        if self._handle:
            self._lib.slam_prefetch_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
