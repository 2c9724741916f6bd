"""ctypes bindings for the native data-plane library.

Builds ``libqaig_native.so`` from ``npy_loader.cpp`` on first import (g++,
cached next to the source); falls back cleanly when no toolchain is
available — ``AVAILABLE`` gates every fast path.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "npy_loader.cpp")
_SO = os.path.join(_DIR, "libqaig_native.so")

AVAILABLE = False
_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_SO + ".tmp", _SO)


def _load():
    global _lib, AVAILABLE
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        _lib = ctypes.CDLL(_SO)
        _lib.qaig_load_npy_batch.restype = ctypes.c_int
        _lib.qaig_load_npy_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int]
        _lib.qaig_normalize_images.restype = None
        _lib.qaig_normalize_images.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        AVAILABLE = True
    except Exception:
        _lib = None
        AVAILABLE = False


_load()


def load_npy_batch(paths, item_shape, num_threads=4):
    """Load ``len(paths)`` float32 .npy files of ``item_shape`` into one
    (N, *item_shape) array via the native thread pool."""
    if not AVAILABLE:
        raise RuntimeError("native library unavailable")
    n = len(paths)
    item_floats = int(np.prod(item_shape))
    out = np.empty((n,) + tuple(item_shape), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = _lib.qaig_load_npy_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        item_floats, num_threads)
    if rc != 0:
        raise IOError(f"native npy batch load failed on {paths[rc - 100]}")
    return out


def normalize_images(batch_u8):
    """(N, H, W, C) uint8 BGR -> (N, C, H, W) float32 in [-1, 1]."""
    if not AVAILABLE:
        raise RuntimeError("native library unavailable")
    n, h, w, c = batch_u8.shape
    batch_u8 = np.ascontiguousarray(batch_u8)
    out = np.empty((n, c, h, w), np.float32)
    _lib.qaig_normalize_images(
        batch_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, h, w, c)
    return out
