"""ctypes bindings for the native IO library (libtbn_io.so).

Provides GIL-free JPEG decode (BGR, cv2-compatible), bilinear resize, PCM
WAV reading with resampling, and a fully native decode+rescale+crop batch
path. Falls back gracefully (``AVAILABLE = False``) when the library is not
built; build it with ``make -C attention_based_tbn_tpu/native`` (or
``ensure_built()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtbn_io.so")

_lib = None


def ensure_built(quiet: bool = True) -> bool:
    """Build the library with make if missing; returns availability."""
    global _lib
    if _lib is not None:
        return True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR],
                check=True,
                capture_output=quiet,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return False
    return _load()


def _load() -> bool:
    global _lib
    if _lib is not None:
        return True
    if not os.path.exists(_LIB_PATH):
        return False
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        # stale/ABI-incompatible local build artifact (another machine's
        # toolchain, missing libjpeg runtime): degrade to the Python IO
        # paths instead of crashing every import of the data package
        return False

    lib.tbn_jpeg_info.restype = ctypes.c_int
    lib.tbn_jpeg_info.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.tbn_decode_jpeg.restype = ctypes.c_int
    lib.tbn_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.tbn_resize_bilinear.restype = None
    lib.tbn_resize_bilinear.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.tbn_read_wav.restype = ctypes.c_int
    lib.tbn_read_wav.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.tbn_free.restype = None
    lib.tbn_free.argtypes = [ctypes.c_void_p]
    lib.tbn_decode_batch.restype = ctypes.c_int
    lib.tbn_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
    ]
    _lib = lib
    return True


_load()
AVAILABLE = _lib is not None


def available() -> bool:
    return _lib is not None


def decode_jpeg(data: bytes, grayscale: bool = False) -> np.ndarray:
    """JPEG bytes -> (H, W, 3) BGR or (H, W) grayscale uint8."""
    assert _lib is not None, "native library not built"
    h = ctypes.c_int()
    w = ctypes.c_int()
    if _lib.tbn_jpeg_info(data, len(data), ctypes.byref(h), ctypes.byref(w)) != 0:
        raise IOError("invalid JPEG data")
    channels = 1 if grayscale else 3
    out = np.empty((h.value, w.value, channels), dtype=np.uint8)
    if _lib.tbn_decode_jpeg(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), channels
    ) != 0:
        raise IOError("JPEG decode failed")
    return out[..., 0] if grayscale else out


def decode_jpeg_file(path: str, grayscale: bool = False) -> np.ndarray:
    with open(path, "rb") as handle:
        return decode_jpeg(handle.read(), grayscale)


def resize_bilinear(img: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    assert _lib is not None, "native library not built"
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    out = np.empty((new_h, new_w, c), dtype=np.uint8)
    _lib.tbn_resize_bilinear(
        img.ctypes.data_as(ctypes.c_void_p), h, w, c,
        out.ctypes.data_as(ctypes.c_void_p), new_h, new_w,
    )
    return out[..., 0] if squeeze else out


def read_wav(path: str, target_sr: int = 24000) -> np.ndarray:
    assert _lib is not None, "native library not built"
    ptr = ctypes.POINTER(ctypes.c_float)()
    length = ctypes.c_int64()
    rc = _lib.tbn_read_wav(
        path.encode(), target_sr, ctypes.byref(ptr), ctypes.byref(length)
    )
    if rc != 0:
        raise IOError(f"WAV read failed ({rc}): {path}")
    try:
        return np.ctypeslib.as_array(ptr, shape=(length.value,)).copy()
    finally:
        _lib.tbn_free(ptr)


def decode_batch(
    paths: List[str],
    scale_size: int,
    crop_size: int,
    grayscale: bool = False,
    num_threads: int = 8,
) -> np.ndarray:
    """Decode + shorter-side rescale + center-crop a frame batch natively.

    Returns (N, crop, crop, C) uint8 (C=3 BGR or 1)."""
    assert _lib is not None, "native library not built"
    n = len(paths)
    channels = 1 if grayscale else 3
    out = np.empty((n, crop_size, crop_size, channels), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = _lib.tbn_decode_batch(
        arr, n, channels, scale_size, crop_size,
        out.ctypes.data_as(ctypes.c_void_p), num_threads,
    )
    if failures:
        raise IOError(f"{failures}/{n} frames failed to decode")
    return out
