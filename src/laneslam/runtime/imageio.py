"""ctypes binding for the native PNG decoder (runtime/_imageio.cpp).

The reference family's frame decode runs in OpenCV's C++ imgcodecs via
`cv2.imread`; this module is the build's native-runtime equivalent
(SURVEY.md §2.4): a C++ decoder (zlib inflate + unfilter + BT.601 gray)
with a std::thread batch pool, built with g++ on first use and loaded via
ctypes. `imread_gray` falls back to cv2 (then to a pure-Python PNG reader
being absent, raises) whenever the native path is unavailable or the file
is outside the native decoder's scope (16-bit, interlaced, non-PNG), so
callers always get cv2-identical semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_imageio.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_imageio.so")
_lock = threading.Lock()
_lib = None
_tried = False
HAVE_NATIVE = False

#: worker threads for batch decode; 2 matches this host's vCPU count and is
#: overridable for bigger hosts via env.
DEFAULT_THREADS = int(os.environ.get("LANESLAM_DECODE_THREADS", "2"))


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             _SRC, "-o", _SO + ".tmp", "-lz", "-lpthread"],
            check=True, capture_output=True, timeout=180,
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
            lib.png_peek.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
            lib.png_peek.restype = ctypes.c_int
            lib.png_decode_gray_file.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64]
            lib.png_decode_gray_file.restype = ctypes.c_int
            lib.png_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p]
            lib.png_decode_batch.restype = ctypes.c_int64
            _lib = lib
            HAVE_NATIVE = True
        except OSError:
            _lib = None
    return _lib


def _cv2_imread_gray(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img


def peek_size(path: str) -> Optional[Tuple[int, int]]:
    """(h, w) from the PNG header without decoding, or None if not readable
    by the native path."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    rc = lib.png_peek(path.encode(), ctypes.byref(h), ctypes.byref(w))
    return (h.value, w.value) if rc == 0 else None


def imread_gray(path: str) -> np.ndarray:
    """Decode one image to (h, w) u8 grayscale; native PNG path with cv2
    fallback for anything out of scope."""
    lib = _load()
    if lib is not None:
        size = peek_size(path)
        if size is not None:
            out = np.empty(size, np.uint8)
            rc = lib.png_decode_gray_file(
                path.encode(), out.ctypes.data, size[0], size[1])
            if rc == 0:
                return out
    return _cv2_imread_gray(path)


def decode_batch_gray(
    paths: Sequence[str],
    out: Optional[np.ndarray] = None,
    threads: int = 0,
) -> np.ndarray:
    """Decode `paths` (all same size) into one contiguous (n, h, w) u8 block
    with the native thread pool; any frame the native decoder rejects is
    re-decoded through cv2. `out` lets the prefetcher reuse its ring slot
    (one allocation for the whole run, BASELINE.json:5 double-buffered I/O).
    """
    if not paths:
        return np.empty((0, 0, 0), np.uint8)
    threads = threads or DEFAULT_THREADS
    lib = _load()
    if lib is None:
        frames = [_cv2_imread_gray(p) for p in paths]
        block = np.stack(frames) if out is None else out
        if out is not None:
            for k, f in enumerate(frames):
                block[k] = f
        return block

    size = peek_size(paths[0])
    if size is None:
        size = _cv2_imread_gray(paths[0]).shape
    n = len(paths)
    if out is None:
        out = np.empty((n, *size), np.uint8)
    assert out.shape == (n, *size) and out.dtype == np.uint8
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    status = np.zeros(n, np.int32)
    failures = lib.png_decode_batch(
        c_paths, n, out.ctypes.data, size[0], size[1],
        threads, status.ctypes.data)
    if failures:
        for k in np.nonzero(status)[0]:
            out[k] = _cv2_imread_gray(paths[k])
    return out
