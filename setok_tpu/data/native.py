"""ctypes bindings for the native image-preprocessing library (csrc/).

Compiles csrc/fast_image.cpp on first use (g++ is in the image; no
pybind11 needed) and exposes `resize_normalize`. Falls back to None when no
compiler is available — callers keep the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "csrc", "fast_image.cpp")
_BUILD_DIR = os.path.join(_REPO, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libfast_image.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            path = _compile()
            if path:
                lib = ctypes.CDLL(path)
                f32p = ctypes.POINTER(ctypes.c_float)
                u8p = ctypes.POINTER(ctypes.c_uint8)
                lib.resize_bilinear_normalize.argtypes = [
                    u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
                    ctypes.c_int, f32p, f32p, ctypes.c_float,
                    ctypes.c_float]
                lib.resize_bilinear_normalize_batch.argtypes = [
                    u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
                    ctypes.c_int, ctypes.c_int, f32p, f32p, ctypes.c_float,
                    ctypes.c_float]
                lib.assemble_batch.argtypes = [
                    ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
                    f32p, f32p, ctypes.c_float, ctypes.c_float,
                    ctypes.c_int]
                _lib = lib
        return _lib


def resize_normalize(img: np.ndarray, size: int,
                     mean: Sequence[float] = (0.0, 0.0, 0.0),
                     std: Sequence[float] = (1.0, 1.0, 1.0),
                     scale: float = 1.0,
                     offset: float = 0.0) -> Optional[np.ndarray]:
    """uint8 (H, W, 3) → float32 (size, size, 3), fused resize+normalize.
    Returns None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    assert img.ndim == 3 and img.shape[2] == 3
    out = np.empty((size, size, 3), np.float32)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    lib.resize_bilinear_normalize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size, size,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(scale), ctypes.c_float(offset))
    return out


def assemble_batch(images, size: int,
                   mean: Sequence[float] = (0.0, 0.0, 0.0),
                   std: Sequence[float] = (1.0, 1.0, 1.0),
                   scale: float = 1.0, offset: float = 0.0,
                   num_threads: Optional[int] = None) -> Optional[np.ndarray]:
    """N variably-sized uint8 (H, W, 3) images → (N, size, size, 3) f32 in
    one GIL-free native call with a work-stealing thread team (csrc
    `assemble_batch`). Returns None when the library is unavailable."""
    lib = get_lib()
    if lib is None or not images:
        return None
    if num_threads is None:
        # team size = real cores: oversubscription thrashes (a 1-CPU host
        # measured 10x slower with 8 threads under load)
        num_threads = os.cpu_count() or 1
    arrs = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    for a in arrs:
        assert a.ndim == 3 and a.shape[2] == 3
    n = len(arrs)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    ptrs = (u8p * n)(*[a.ctypes.data_as(u8p) for a in arrs])
    shapes = np.asarray([[a.shape[0], a.shape[1]] for a in arrs],
                        np.int32).reshape(-1)
    out = np.empty((n, size, size, 3), np.float32)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    lib.assemble_batch(
        ptrs, shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size, size,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(scale), ctypes.c_float(offset), num_threads)
    return out
