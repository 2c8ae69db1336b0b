"""ctypes bindings for the native C++ prefetching image loader.

Builds ``csrc/libsp_loader.so`` on first use (g++ + libpng/libjpeg, baked in
the image) and exposes a prefetching iterator.  Falls back to synchronous
cv2 decoding when the toolchain or libraries are unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.join(_CSRC, "libsp_loader.so")
_lib = None
_lib_lock = threading.Lock()


def _build_lib() -> Optional[str]:
    try:
        subprocess.run(
            ["make", "-C", _CSRC], check=True, capture_output=True, text=True
        )
        return _LIB_PATH
    except Exception as e:  # toolchain missing or link failure
        print(f"[native_loader] build failed, falling back to cv2: {e}")
        return None


def get_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        # Always invoke make: it no-ops when the .so is newer than
        # loader.cpp, and rebuilds stale binaries after source changes.
        if _build_lib() is None:
            if not os.path.exists(_LIB_PATH):
                _lib = False
                return _lib
            print("[native_loader] using existing libsp_loader.so")
        lib = ctypes.CDLL(_LIB_PATH)
        lib.sp_loader_open.restype = ctypes.c_void_p
        lib.sp_loader_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.sp_loader_get.restype = ctypes.c_long
        lib.sp_loader_get.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_long, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.sp_loader_close.argtypes = [ctypes.c_void_p]
        lib.sp_loader_set_undistort.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.sp_undistort_maps.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.sp_remap_u8.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
        ]
        _lib = lib
        return _lib


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def undistort_maps(K: np.ndarray, dist: np.ndarray, h: int, w: int):
    """Native cv2.initUndistortRectifyMap equivalent (newK == K).

    Returns (map_x, map_y) float32 (h, w), or None without the native lib."""
    lib = get_lib()
    if not lib:
        return None
    K = np.ascontiguousarray(np.asarray(K, np.float64).reshape(9))
    d = np.ascontiguousarray(np.asarray(dist, np.float64).reshape(-1))
    if len(d) > 5:
        # the native kernel implements the 5-term plumb-bob model only;
        # silently truncating an 8-term rational / thin-prism vector would
        # remap with wrong math — let callers fall back to cv2.undistort
        return None
    d = np.pad(d, (0, max(0, 5 - len(d))))[:5].copy()
    mx = np.empty((h, w), np.float32)
    my = np.empty((h, w), np.float32)
    lib.sp_undistort_maps(
        K.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        h, w, _f32p(mx), _f32p(my),
    )
    return mx, my


def remap_u8(src: np.ndarray, map_x: np.ndarray, map_y: np.ndarray):
    """Native bilinear remap (constant-zero border) of a uint8 image."""
    lib = get_lib()
    assert lib, "native loader unavailable"
    src = np.ascontiguousarray(src)
    h, w = src.shape[:2]
    c = 1 if src.ndim == 2 else src.shape[2]
    dst = np.empty_like(src)
    u8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    lib.sp_remap_u8(
        u8p(src), h, w, c,
        _f32p(np.ascontiguousarray(map_x)), _f32p(np.ascontiguousarray(map_y)),
        u8p(dst),
    )
    return dst


class NativeImageLoader:
    """Prefetching image loader over a fixed path list.

    ``loader[i]`` returns an (H, W) or (H, W, C) numpy array (uint8, or
    uint16 for 16-bit PNG depth).  Decoding of upcoming indices happens on
    C++ threads while the caller computes.
    """

    def __init__(
        self,
        paths: Sequence[str],
        num_threads: int = 4,
        lookahead: int = 8,
        capacity_bytes: Optional[int] = None,
    ):
        self.paths = [str(p) for p in paths]
        lib = get_lib()
        self._native = bool(lib)
        if self._native:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._handle = lib.sp_loader_open(
                arr, len(self.paths), num_threads, lookahead
            )
            self._lib = lib
            self._cap = capacity_bytes or (4096 * 4096 * 4)
            self._buf = (ctypes.c_ubyte * self._cap)()

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> np.ndarray:
        if not self._native:
            import cv2

            img = cv2.imread(self.paths[idx], -1)
            if img is None:
                raise IOError(f"failed to read {self.paths[idx]}")
            if img.ndim == 3:
                img = img[..., ::-1].copy()  # BGR -> RGB
            return img
        h = ctypes.c_int()
        w = ctypes.c_int()
        c = ctypes.c_int()
        bpc = ctypes.c_int()
        rc = self._lib.sp_loader_get(
            self._handle, idx, self._buf, self._cap,
            ctypes.byref(h), ctypes.byref(w), ctypes.byref(c), ctypes.byref(bpc),
        )
        if rc == -1:
            raise IOError(f"native decode failed for {self.paths[idx]}")
        if rc > 0:
            raise IOError(f"buffer too small: need {rc}")
        n = h.value * w.value * c.value * bpc.value
        raw = np.frombuffer(self._buf, dtype=np.uint8, count=n).copy()
        dtype = np.uint16 if bpc.value == 2 else np.uint8
        img = raw.view(dtype).reshape(h.value, w.value, c.value)
        if c.value == 1:
            img = img[..., 0]
        return img

    def set_undistort(self, map_x: np.ndarray, map_y: np.ndarray):
        """Remap subsequently decoded 8-bit images on the C++ decode threads
        (prefetch hides the cost).  No-op on the cv2 fallback — callers keep
        their own host-side undistort for that path."""
        if not self._native:
            return False
        h, w = map_x.shape
        self._lib.sp_loader_set_undistort(
            self._handle,
            _f32p(np.ascontiguousarray(map_x, np.float32)),
            _f32p(np.ascontiguousarray(map_y, np.float32)),
            h, w,
        )
        return True

    def close(self):
        if self._native and self._handle:
            self._lib.sp_loader_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
