"""ctypes bindings + build for the native frame pipeline (framepipe.cpp).

Compiles lazily on first use (g++ -O2 -shared, links libpng) into
native/_build/. Falls back gracefully: `native_available()` is False when the
toolchain or libpng is missing and callers use the Python (cv2/PIL) loader.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_DIR, "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libframepipe.so")
_SRC = os.path.join(_DIR, "framepipe.cpp")

_lib = None
_lock = threading.Lock()


def ensure_built(force: bool = False) -> Optional[str]:
    """Compile the shared library if needed; returns its path or None."""
    with _lock:
        if not force and os.path.exists(_LIB_PATH) and os.path.getmtime(
            _LIB_PATH
        ) >= os.path.getmtime(_SRC):
            return _LIB_PATH
        os.makedirs(_BUILD_DIR, exist_ok=True)
        cmd = [
            "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
            _SRC, "-o", _LIB_PATH, "-lpng", "-lz",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            msg = getattr(e, "stderr", str(e))
            import sys

            print(f"framepipe build failed: {msg}", file=sys.stderr)
            return None
        return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = ensure_built()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.fp_create.restype = ctypes.c_void_p
    lib.fp_create.argtypes = [ctypes.c_int] * 4
    lib.fp_submit.restype = ctypes.c_int
    lib.fp_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_double, ctypes.c_long,
    ]
    lib.fp_next.restype = ctypes.c_int
    lib.fp_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.fp_close.argtypes = [ctypes.c_void_p]
    lib.fp_destroy.argtypes = [ctypes.c_void_p]
    lib.fp_decode_png_gray.restype = ctypes.c_int
    lib.fp_decode_png_gray.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_double,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def decode_png_gray(path: str, width: int, height: int,
                    scale: float = 1.0) -> np.ndarray:
    """Synchronous native PNG decode -> float32 [H, W]. scale != 1 selects the
    16-bit depth path (value * scale)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native framepipe unavailable")
    out = np.empty((height, width), dtype=np.float32)
    ok = lib.fp_decode_png_gray(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        width, height, scale,
    )
    if not ok:
        raise IOError(f"PNG decode failed: {path}")
    return out


class FramePipe:
    """Threaded prefetching RGB-D frame loader (submission-ordered)."""

    def __init__(self, width: int, height: int, n_workers: int = 2,
                 capacity: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native framepipe unavailable")
        self._lib = lib
        self._h = lib.fp_create(n_workers, capacity, width, height)
        self.width = width
        self.height = height
        self._submitted = 0
        self._delivered = 0

    def submit(self, rgb_path: str, depth_path: str, depth_factor: float,
               tag: int = 0):
        rc = self._lib.fp_submit(
            self._h, rgb_path.encode(), depth_path.encode(),
            float(depth_factor), int(tag),
        )
        if rc != 0:
            raise RuntimeError("framepipe submit after close")
        self._submitted += 1

    def next(self) -> Tuple[np.ndarray, np.ndarray, int]:
        gray = np.empty((self.height, self.width), dtype=np.float32)
        depth = np.empty((self.height, self.width), dtype=np.float32)
        tag = ctypes.c_long(0)
        rc = self._lib.fp_next(
            self._h,
            gray.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(tag),
        )
        if rc == 0:
            raise StopIteration
        if rc < 0:
            raise IOError("framepipe: frame decode failed")
        self._delivered += 1
        return gray, depth, tag.value

    def close(self):
        self._lib.fp_close(self._h)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.fp_destroy(self._h)
                self._h = None
        except Exception:
            pass

    # ------------------------------------------------------------------
    def stream(self, items: Sequence[Tuple[str, str, float]]) -> Iterator[
        Tuple[np.ndarray, np.ndarray, int]
    ]:
        """Prefetching iterator over (rgb_path, depth_path, depth_factor).

        Submission happens on a feeder thread: submit() blocks on the bounded
        ring once `capacity` frames are in flight, so feeding and consuming
        must overlap.
        """

        def feed():
            for i, (r, d, f) in enumerate(items):
                self.submit(r, d, f, i)
            self.close()

        feeder = threading.Thread(target=feed, daemon=True)
        feeder.start()
        try:
            for _ in range(len(items)):
                yield self.next()
        finally:
            feeder.join()
