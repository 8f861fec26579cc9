"""ctypes loader for the native backproject library.

Builds on demand with make/g++ (mirrors the reference's optional-.so scheme,
utils/dense_image_warp.py:38-58: if the library is absent or the toolchain
missing, callers fall back to the jnp path).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libbackproject.so")
_lib = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    # always run make (the Makefile's backproject.cc dependency makes it a
    # ~30 ms no-op when fresh) — only rebuilding when the .so was ABSENT
    # silently tested edits to backproject.cc against a stale binary. A
    # failed make (no toolchain) still falls through to loading a prebuilt
    # .so if one is present. The build+load pair holds an exclusive flock:
    # g++ writes the .so in place (non-atomically), so two processes
    # importing concurrently after a source edit could otherwise dlopen a
    # half-written binary (trainer + validation subprocess, pytest workers).
    lock_path = os.path.join(_DIR, ".build.lock")
    with open(lock_path, "w") as lock_f:
        try:
            import fcntl
            fcntl.flock(lock_f, fcntl.LOCK_EX)
        except ImportError:  # non-POSIX: fall back to unserialized build
            pass
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not os.path.isfile(_LIB_PATH):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

    fp = ctypes.POINTER(ctypes.c_float)
    lib.backproject_forward.argtypes = [fp, fp, fp] + [ctypes.c_int] * 5
    lib.backproject_forward.restype = None
    lib.backproject_backward.argtypes = [fp, fp, fp, fp, fp] + [ctypes.c_int] * 5
    lib.backproject_backward.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _ensure_built() is not None


def _as_f32(x) -> np.ndarray:
    return np.ascontiguousarray(x, dtype=np.float32)


def _ptr(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def backproject_forward(image: np.ndarray, flow: np.ndarray,
                        threads: int = 0) -> np.ndarray:
    """Native bilinear warp: image [b,h,w,c], flow [b,h,w,2] (dx,dy)."""
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError("native backproject library unavailable")
    image = _as_f32(image)
    flow = _as_f32(flow)
    b, h, w, c = image.shape
    out = np.empty_like(image)
    threads = threads or (os.cpu_count() or 1)
    lib.backproject_forward(_ptr(image), _ptr(flow), _ptr(out),
                            b, h, w, c, threads)
    return out


def backproject_backward(image: np.ndarray, flow: np.ndarray,
                         grad: np.ndarray, threads: int = 0
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Gradients (d_image, d_flow) of sum(warp(image, flow) * grad)."""
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError("native backproject library unavailable")
    image = _as_f32(image)
    flow = _as_f32(flow)
    grad = _as_f32(grad)
    b, h, w, c = image.shape
    dimg = np.empty_like(image)
    dflow = np.empty_like(flow)
    threads = threads or (os.cpu_count() or 1)
    lib.backproject_backward(_ptr(image), _ptr(flow), _ptr(grad),
                             _ptr(dimg), _ptr(dflow), b, h, w, c, threads)
    return dimg, dflow
