"""ctypes bindings for the native IO tier (tsrio.cpp).

Builds ``libtsrio.so`` with g++ on first use (cached next to the source).
Falls back gracefully: callers should check :func:`available` and use the
cv2/PIL path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tsrio.cpp")
_LIB = os.path.join(_HERE, "libtsrio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    # -march=native makes the binary host-specific, which is why the .so
    # is gitignored and always built locally on first use: a foreign
    # prebuilt binary would dlopen fine and then die with an uncatchable
    # SIGILL on the first unsupported instruction.
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _LIB, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.tsrio_load_batch.restype = ctypes.c_int
        lib.tsrio_load_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.tsrio_decode.restype = ctypes.c_int
        lib.tsrio_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long, ctypes.POINTER(ctypes.c_int)]
        lib.tsrio_write_png_batch.restype = ctypes.c_int
        lib.tsrio_write_png_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_batch(paths: List[str], size: int, threads: int = 8
               ) -> np.ndarray:
    """Decode+resize ``paths`` (PNG/PPM/BMP) into a uint8 [N, size, size, 3]
    RGB batch. Raises RuntimeError if any image fails (caller falls back)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libtsrio unavailable")
    out = np.empty((len(paths), size, size, 3), np.uint8)
    joined = "\n".join(paths).encode()
    ok = lib.tsrio_load_batch(
        joined, len(paths), size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    if ok != len(paths):
        raise RuntimeError(
            f"tsrio decoded {ok}/{len(paths)} images")
    return out


def write_png_batch(paths: List[str], images: np.ndarray,
                    threads: int = 8) -> None:
    """Threaded PNG encode+write of a uint8 [N,H,W,3] RGB batch. Parent
    directories must exist. Raises RuntimeError on any failure (caller
    falls back to cv2)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libtsrio unavailable")
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, c = images.shape
    assert c == 3 and n == len(paths), (images.shape, len(paths))
    joined = "\n".join(paths).encode()
    ok = lib.tsrio_write_png_batch(
        joined, n, w, h,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    if ok != n:
        raise RuntimeError(f"tsrio wrote {ok}/{n} PNGs")


def decode(path: str, max_side: int = 4096) -> np.ndarray:
    """Decode one PNG/PPM/BMP at native size -> uint8 HWC RGB."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libtsrio unavailable")
    cap = max_side * max_side * 3
    buf = np.empty(cap, np.uint8)
    dims = (ctypes.c_int * 2)()
    ok = lib.tsrio_decode(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap, dims)
    if not ok:
        raise RuntimeError(f"tsrio failed to decode {path}")
    w, h = dims[0], dims[1]
    return buf[:w * h * 3].reshape(h, w, 3).copy()
