"""ctypes bindings + on-demand build for the C++ host-staging runtime.

``lib()`` compiles ``host_staging.cc`` with g++ into a cached shared object
on first use and returns the ctypes handle (None if no compiler — all
callers fall back to PIL/numpy).  The library accelerates the one-time
dataset staging step (resize/crop/gather) with real threads; steady-state
training never touches the host, so nothing here is on the hot path.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "host_staging.cc")
_CACHE_DIR = os.environ.get(
    "STRAINER_NATIVE_CACHE", os.path.expanduser("~/.cache/strainer_gan_tpu")
)
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_CACHE_DIR, f"libhost_staging_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_CACHE_DIR, exist_ok=True)
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
        "-pthread", _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except Exception:
        return None


def lib():
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so_path = _build()
        if so_path is None:
            return None
        try:
            L = ctypes.CDLL(so_path)
        except OSError:
            return None
        i64, i32 = ctypes.c_int64, ctypes.c_int
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        L.sg_resize_bilinear_u8.argtypes = [
            u8p, i64, i32, i32, i32, u8p, i32, i32, i32
        ]
        L.sg_center_crop_u8.argtypes = [u8p, i64, i32, i32, i32, u8p, i32, i32]
        L.sg_gather_u8.argtypes = [u8p, i64p, i64, i64, u8p, i32]
        _lib = L
        return _lib


def _threads() -> int:
    return max(1, min(os.cpu_count() or 1, 16))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear_u8(images: np.ndarray, size: int) -> np.ndarray | None:
    """Batch triangle-filter resize (PIL-compatible); None if lib missing."""
    L = lib()
    if L is None:
        return None
    images = np.ascontiguousarray(images)
    n, h, w, c = images.shape
    out = np.empty((n, size, size, c), np.uint8)
    L.sg_resize_bilinear_u8(
        _u8p(images), n, h, w, c, _u8p(out), size, size, _threads()
    )
    return out


def center_crop_u8(images: np.ndarray, size: int) -> np.ndarray | None:
    L = lib()
    if L is None:
        return None
    images = np.ascontiguousarray(images)
    n, h, w, c = images.shape
    if size > h or size > w:
        # negative offsets in the native kernel would read out of bounds
        raise ValueError(f"crop size {size} exceeds image extent ({h}, {w})")
    out = np.empty((n, size, size, c), np.uint8)
    L.sg_center_crop_u8(_u8p(images), n, h, w, c, _u8p(out), size, _threads())
    return out


def gather_u8(src: np.ndarray, idx: np.ndarray) -> np.ndarray | None:
    """dst[i] = src[idx[i]] with native threads; None if lib missing."""
    L = lib()
    if L is None:
        return None
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(idx, np.int64)
    item = int(np.prod(src.shape[1:]))
    out = np.empty((len(idx),) + src.shape[1:], src.dtype)
    L.sg_gather_u8(
        _u8p(src.reshape(-1)), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx), item, _u8p(out.reshape(-1)), _threads(),
    )
    return out
