"""ctypes binding for the native host preprocessing library (SURVEY.md §2.4).

Builds `_preproc.cpp` with g++ on first use (cached next to the source;
rebuilt when the source is newer). Falls back to NumPy implementations with
identical semantics when no compiler is available — `HAVE_NATIVE` says
which path is live, and the unit tests assert native == fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_preproc.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_preproc.so")
_lock = threading.Lock()
_lib = None
_tried = False
HAVE_NATIVE = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO + ".tmp"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(_SO + ".tmp", _SO)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried, HAVE_NATIVE
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            stale = (not os.path.exists(_SO)) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            )
            if stale and not _build():
                return None
            lib = ctypes.CDLL(_SO)
            lib.rgb_to_gray_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
            lib.downscale2x_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
            lib.u8_to_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_float]
            lib.pack_frames_f32.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float]
            _lib = lib
            HAVE_NATIVE = True
        except OSError:
            _lib = None
    return _lib


def rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) u8 -> (h, w) u8, BT.601 (cv2 COLOR_RGB2GRAY convention)."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    lib = _load()
    if lib is not None:
        out = np.empty((h, w), np.uint8)
        lib.rgb_to_gray_u8(rgb.ctypes.data, out.ctypes.data, h, w)
        return out
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((9798 * r + 19235 * g + 3735 * b + 16384) >> 15).astype(np.uint8)


def downscale2x(gray: np.ndarray) -> np.ndarray:
    """(h, w) u8 -> (h//2, w//2) u8 2x2 box mean (round-half-up)."""
    gray = np.ascontiguousarray(gray, np.uint8)
    h, w = gray.shape
    lib = _load()
    if lib is not None:
        out = np.empty((h // 2, w // 2), np.uint8)
        lib.downscale2x_u8(gray.ctypes.data, out.ctypes.data, h, w)
        return out
    a = gray[: h // 2 * 2, : w // 2 * 2].astype(np.uint32)
    s = a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]
    return ((s + 2) >> 2).astype(np.uint8)


def to_f32(gray: np.ndarray, scale: float = 1.0) -> np.ndarray:
    gray = np.ascontiguousarray(gray, np.uint8)
    lib = _load()
    if lib is not None:
        out = np.empty(gray.shape, np.float32)
        lib.u8_to_f32(gray.ctypes.data, out.ctypes.data, gray.size,
                      ctypes.c_float(scale))
        return out
    return gray.astype(np.float32) * np.float32(scale)


def pack_frames(frames, scale: float = 1.0) -> np.ndarray:
    """List of (h, w) u8 frames -> one contiguous (b, h, w) f32 block.

    One allocation + one device_put for the whole prefetch batch (the host
    half of the double-buffered feed, BASELINE.json:5).
    """
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    b = len(frames)
    h, w = frames[0].shape
    lib = _load()
    out = np.empty((b, h, w), np.float32)
    if lib is not None:
        ptrs = (ctypes.c_void_p * b)(*[f.ctypes.data for f in frames])
        lib.pack_frames_f32(ptrs, out.ctypes.data, b, h, w, ctypes.c_float(scale))
        return out
    for k, f in enumerate(frames):
        out[k] = f.astype(np.float32) * np.float32(scale)
    return out
