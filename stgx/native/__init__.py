"""Native (C++) runtime components, bound via ctypes.

Currently: the threaded .npy prefetch loader (npy_loader.cpp) — decodes
trials on background threads so host IO overlaps device compute. Built on
demand with g++ (cached beside the source); everything degrades gracefully
to numpy when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "load_npy_f32", "Prefetcher", "native_lib"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "npy_loader.cpp")
_LIB = os.path.join(_HERE, "_npy_loader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB
    except Exception:
        return None


def native_lib():
    """The loaded shared library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.stgx_npy_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.stgx_npy_read_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        lib.stgx_prefetch_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.stgx_prefetch_open.restype = ctypes.c_void_p
        lib.stgx_prefetch_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.stgx_prefetch_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return native_lib() is not None


def load_npy_f32(path: str) -> np.ndarray:
    """Read any supported .npy as float32 via the native parser."""
    lib = native_lib()
    if lib is None:
        return np.load(path).astype(np.float32)
    shape = (ctypes.c_long * 8)()
    ndim = ctypes.c_int()
    if lib.stgx_npy_info(path.encode(), shape, ctypes.byref(ndim)) != 0:
        return np.load(path).astype(np.float32)
    shp = tuple(shape[i] for i in range(ndim.value))
    out = np.empty(int(np.prod(shp)), dtype=np.float32)
    rc = lib.stgx_npy_read_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size,
    )
    if rc < 0:
        return np.load(path).astype(np.float32)
    return out.reshape(shp)


class Prefetcher:
    """Ordered background decoding of a list of .npy files.

    Usage::

        with Prefetcher(paths, ahead=4) as pf:
            for arr in pf:
                ...
    """

    def __init__(self, paths: list[str], ahead: int = 4, threads: int = 2,
                 max_elems: int = 64 << 20):
        self.paths = list(paths)
        self.ahead = ahead
        self.threads = threads
        self.max_elems = max_elems
        self._h = None

    def __enter__(self):
        lib = native_lib()
        if lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._h = lib.stgx_prefetch_open(
                arr, len(self.paths), self.ahead, self.threads
            )
        self._idx = 0
        return self

    def __exit__(self, *exc):
        if self._h is not None:
            native_lib().stgx_prefetch_close(self._h)
            self._h = None

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._idx >= len(self.paths):
            raise StopIteration
        path = self.paths[self._idx]
        self._idx += 1
        if self._h is None:  # numpy fallback
            return np.load(path).astype(np.float32)
        lib = native_lib()
        out = np.empty(self.max_elems, dtype=np.float32)
        shape = (ctypes.c_long * 8)()
        ndim = ctypes.c_int()
        rc = lib.stgx_prefetch_next(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.size, shape, ctypes.byref(ndim),
        )
        if rc != 0:
            return np.load(path).astype(np.float32)
        shp = tuple(shape[i] for i in range(ndim.value))
        return out[: int(np.prod(shp))].reshape(shp).copy()
