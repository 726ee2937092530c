"""ctypes bindings for the native IO core (native/libgdbn_io.so).

Provides C++-speed image decode (PNG/JPEG -> float32 RGB), PFM reading and
an async decode pool.  Falls back gracefully: ``available()`` is False when
the shared library hasn't been built (run native/build.sh), and callers
keep using the cv2 path.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

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
        "libgdbn_io.so",
    )
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.gdbn_decode_image.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.gdbn_decode_image.restype = ctypes.c_int
    lib.gdbn_image_size.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.gdbn_image_size.restype = ctypes.c_int
    lib.gdbn_pfm_size.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.gdbn_pfm_size.restype = ctypes.c_int
    lib.gdbn_read_pfm.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.gdbn_read_pfm.restype = ctypes.c_int
    lib.gdbn_pool_create.argtypes = [ctypes.c_int]
    lib.gdbn_pool_create.restype = ctypes.c_void_p
    lib.gdbn_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.gdbn_pool_submit_image.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.gdbn_pool_wait.argtypes = [ctypes.c_void_p]
    lib.gdbn_pool_wait.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return _lib() is not None


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def image_size(path: str) -> tuple[int, int]:
    lib = _lib()
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.gdbn_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        raise IOError(f"cannot read image: {path}")
    return h.value, w.value


def decode_image(
    path: str,
    out_hw: tuple[int, int] | None = None,
    white_bg: bool = False,
) -> np.ndarray:
    """Decode (and optionally resize) to float32 RGB (H, W, 3) in [0, 1]."""
    lib = _lib()
    if out_hw is None:
        out_hw = image_size(path)
    out = np.empty((*out_hw, 3), np.float32)
    rc = lib.gdbn_decode_image(
        path.encode(), _fptr(out), out_hw[0], out_hw[1], int(white_bg)
    )
    if rc != 0:
        raise IOError(f"decode failed: {path}")
    return out


def read_pfm(path: str) -> np.ndarray:
    lib = _lib()
    h, w = ctypes.c_int(), ctypes.c_int()
    ch = lib.gdbn_pfm_size(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if ch != 1:
        raise IOError(f"not a 1-channel PFM: {path}")
    out = np.empty((h.value, w.value), np.float32)
    if lib.gdbn_read_pfm(path.encode(), _fptr(out), h.value, w.value) != 0:
        raise IOError(f"pfm read failed: {path}")
    return out


class DecodePool:
    """Async decode pool: submit many images, then wait once per batch."""

    def __init__(self, num_threads: int = 4):
        self._lib = _lib()
        if self._lib is None:
            raise RuntimeError("native IO library not built (native/build.sh)")
        self._pool = self._lib.gdbn_pool_create(num_threads)
        self._keep: list = []

    def submit(
        self,
        path: str,
        out_hw: tuple[int, int],
        white_bg: bool = False,
    ) -> np.ndarray:
        out = np.empty((*out_hw, 3), np.float32)
        bpath = path.encode()
        self._keep.append((bpath, out))
        self._lib.gdbn_pool_submit_image(
            self._pool, bpath, _fptr(out), out_hw[0], out_hw[1], int(white_bg)
        )
        return out

    def wait(self) -> None:
        errors = self._lib.gdbn_pool_wait(self._pool)
        self._keep.clear()
        if errors:
            raise IOError(f"{errors} decode jobs failed")

    def __del__(self):
        if getattr(self, "_pool", None):
            self._lib.gdbn_pool_destroy(self._pool)
            self._pool = None
