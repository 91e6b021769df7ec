"""ctypes binding for the vvnative C++ library, with lazy on-first-use
compilation (g++ is baked into the image; pybind11 is not, so the C ABI
+ ctypes is the binding path)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "vvnative.cpp")
_SO = os.path.join(_HERE, "libvvnative.so")

_lib = None
_lock = threading.Lock()


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.vv_chamfer_distance.argtypes = [f32p, u8p, ctypes.c_int,
                                            ctypes.c_int]
        lib.vv_binary_dilate.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int]
        lib.vv_feather_composite.argtypes = [u8p, u8p, u8p, u8p, ctypes.c_int,
                                             ctypes.c_int, ctypes.c_float]
        lib.vv_ring_create.restype = ctypes.c_void_p
        lib.vv_ring_create.argtypes = [ctypes.c_int, ctypes.c_long]
        lib.vv_ring_push.argtypes = [ctypes.c_void_p, u8p]
        lib.vv_ring_pop.argtypes = [ctypes.c_void_p, u8p]
        lib.vv_ring_size.argtypes = [ctypes.c_void_p]
        lib.vv_ring_close.argtypes = [ctypes.c_void_p]
        lib.vv_ring_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _get_lib()
        return True
    except Exception:
        return False


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def chamfer_distance(mask: np.ndarray) -> np.ndarray:
    """Exact two-pass chamfer (OpenCV DIST_L2/5 metric) on host."""
    lib = _get_lib()
    mask = np.ascontiguousarray((mask > 0).astype(np.uint8))
    h, w = mask.shape
    out = np.empty((h, w), np.float32)
    lib.vv_chamfer_distance(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _u8(mask), h, w)
    return out


def binary_dilate(mask: np.ndarray, iterations: int) -> np.ndarray:
    lib = _get_lib()
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = mask.shape
    out = np.empty((h, w), np.uint8)
    lib.vv_binary_dilate(_u8(out), _u8(mask), h, w, int(iterations))
    return out.astype(bool)


def feather_composite(inpainted: np.ndarray, original: np.ndarray,
                      mask: np.ndarray, feather_px: float = 3.0) -> np.ndarray:
    """Host fallback of ops.composite.feathered_composite for one frame."""
    lib = _get_lib()
    h, w = original.shape[:2]
    inp = np.ascontiguousarray(inpainted.astype(np.uint8))
    org = np.ascontiguousarray(original.astype(np.uint8))
    m = np.ascontiguousarray((mask > 0).astype(np.uint8))
    out = np.empty((h, w, 3), np.uint8)
    lib.vv_feather_composite(_u8(out), _u8(inp), _u8(org), _u8(m), h, w,
                             float(feather_px))
    return out


class FrameRing:
    """Bounded blocking frame queue backed by the C++ ring: a decode
    thread pushes, the compute loop pops; capacity bounds host memory."""

    def __init__(self, capacity: int, frame_shape: tuple):
        self._lib = _get_lib()
        self.frame_shape = tuple(frame_shape)
        self.frame_bytes = int(np.prod(frame_shape))
        self._ptr = self._lib.vv_ring_create(int(capacity), self.frame_bytes)

    def push(self, frame: np.ndarray) -> bool:
        f = np.ascontiguousarray(frame.astype(np.uint8))
        assert f.nbytes == self.frame_bytes, (f.shape, self.frame_shape)
        return bool(self._lib.vv_ring_push(self._ptr, _u8(f)))

    def pop(self) -> np.ndarray | None:
        out = np.empty(self.frame_shape, np.uint8)
        ok = self._lib.vv_ring_pop(self._ptr, _u8(out))
        return out if ok else None

    def qsize(self) -> int:
        return int(self._lib.vv_ring_size(self._ptr))

    def close(self):
        self._lib.vv_ring_close(self._ptr)

    def __del__(self):
        try:
            self._lib.vv_ring_destroy(self._ptr)
        except Exception:
            pass
