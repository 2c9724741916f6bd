"""ctypes bindings for the native data-plane library.

Builds ``libqaig_native.so`` from ``npy_loader.cpp`` on first import (g++,
cached next to the source); falls back cleanly when no toolchain is
available — ``AVAILABLE`` gates every fast path.

Binaries are never committed (gitignored): every ``.so`` is compiled from
the reviewed source on first use, and a sidecar ``.srchash`` records the
sha256 of the source it was built from — a cached binary is reused only
when that hash matches, so it can never silently drift from the source
(mtime comparisons are meaningless after a fresh checkout).
"""

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "npy_loader.cpp")
_SO = os.path.join(_DIR, "libqaig_native.so")
_IMG_SRC = os.path.join(_DIR, "image_loader.cpp")
_IMG_SO = os.path.join(_DIR, "libqaig_image.so")

AVAILABLE = False
IMAGE_AVAILABLE = False
_lib = None
_img_lib = None


def _src_hash(src):
    with open(src, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _is_fresh(so, src):
    """A cached binary is valid only if its sidecar records the hash of the
    current source."""
    try:
        with open(so + ".srchash") as f:
            return f.read().strip() == _src_hash(src)
    except OSError:
        return False


def _compile(src, so, extra=()):
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           src, *extra, "-o", so + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(so + ".tmp", so)
    with open(so + ".srchash", "w") as f:
        f.write(_src_hash(src))


def _load():
    global _lib, AVAILABLE
    try:
        if not os.path.exists(_SO) or not _is_fresh(_SO, _SRC):
            _compile(_SRC, _SO)
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


def _load_image_lib():
    """The image decoder links against system libjpeg/libpng, which may be
    absent — it gets its own .so and availability flag so a failed build
    never takes the .npy fast path down with it."""
    global _img_lib, IMAGE_AVAILABLE
    try:
        if not os.path.exists(_IMG_SO) or not _is_fresh(_IMG_SO, _IMG_SRC):
            _compile(_IMG_SRC, _IMG_SO, extra=("-ljpeg", "-lpng"))
        _img_lib = ctypes.CDLL(_IMG_SO)
        _img_lib.qaig_load_image_batch.restype = ctypes.c_int
        _img_lib.qaig_load_image_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        IMAGE_AVAILABLE = True
    except Exception:
        _img_lib = None
        IMAGE_AVAILABLE = False


_load()
_load_image_lib()


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


def load_image_batch(paths, height, width, num_threads=4):
    """Decode ``len(paths)`` JPEG/PNG files of exactly (height, width, 3)
    into one (N, 3, H, W) float32 BGR batch in [-1, 1] via the native
    thread pool.  Raises on unsupported files so callers can fall back to
    the cv2 path."""
    if not IMAGE_AVAILABLE:
        raise RuntimeError("native image library unavailable")
    n = len(paths)
    out = np.empty((n, 3, height, width), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = _img_lib.qaig_load_image_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height, width, num_threads)
    if rc != 0:
        raise IOError(
            f"native image batch load failed on {paths[rc - 100]}")
    return out


_JPEG_PARITY = None


def jpeg_parity_ok():
    """Gate for the native JPEG branch: this library links the system
    libjpeg while cv2 wheels bundle libjpeg-turbo, and IDCT/fancy-upsampling
    differences between the two can yield ±1-level pixel deltas that would
    silently break the documented pixel-identical-to-cv2 contract.  Decode
    one synthesized probe JPEG through both paths (once, cached) and allow
    native JPEG only on bit-equality.  PNG is lossless and unaffected."""
    global _JPEG_PARITY
    if _JPEG_PARITY is not None:
        return _JPEG_PARITY
    if not IMAGE_AVAILABLE:
        _JPEG_PARITY = False
        return _JPEG_PARITY
    try:
        import tempfile
        import cv2
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "probe.jpg")
            cv2.imwrite(path, img)
            want = cv2.imread(path)
            want = (want.astype(np.float32) - 127.5) / 127.5
            want = np.ascontiguousarray(want.transpose(2, 0, 1))
            got = load_image_batch([path], 32, 32)[0]
        _JPEG_PARITY = bool(np.array_equal(got, want))
    except Exception:
        _JPEG_PARITY = False
    return _JPEG_PARITY


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
