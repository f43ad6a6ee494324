"""ctypes bindings for the native C++ loader (loader.cc).

Auto-builds ``libfastdiffsr_loader.so`` with the system g++ on first use;
falls back cleanly (``LOADER = None``) when a toolchain or libpng/libjpeg
is unavailable so the pure-PIL path keeps working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libfastdiffsr_loader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.image_dims.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
        lib.image_dims.restype = ctypes.c_int
        lib.decode_rgb.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_uint8),
                                   ctypes.c_int, ctypes.c_int]
        lib.decode_rgb.restype = ctypes.c_int
        lib.load_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.load_batch_f32.restype = ctypes.c_int
        _lib = lib
        return _lib


def image_dims(path: str):
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.image_dims(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return w.value, h.value


def decode_rgb(path: str):
    """uint8 (H, W, 3) or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    dims = image_dims(path)
    if dims is None:
        return None
    w, h = dims
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.decode_rgb(path.encode(),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        w, h)
    return out if rc == 0 else None


def load_batch_f32(paths, width: int, height: int, scale: float = 2.0,
                   offset: float = -1.0, flips=None, n_threads: int = 4):
    """float32 (N, H, W, 3) batch: y = x/255*scale + offset; or None."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    out = np.empty((n, height, width, 3), np.float32)
    if flips is not None:
        flips = np.asarray(flips, np.uint8)
        fptr = flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    else:
        fptr = ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))
    rc = lib.load_batch_f32(
        arr, n, width, height, ctypes.c_float(scale),
        ctypes.c_float(offset), fptr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    return out if rc == 0 else None
