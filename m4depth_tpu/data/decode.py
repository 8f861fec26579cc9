"""Host-side image decoding and resizing.

Parity reference: the tf.data decode ops in dataloaders/{midair,kitti,
tartanair}.py — JPEG color, uint16 PNG (raw or bitcast to float16), and raw
float32 depth blobs. Resizing matches the TF conventions used per dataset:
bilinear (half-pixel, no antialias) for color and Mid-Air depth, nearest
(half-pixel floor) for sparse/exact depth.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import numpy as np

try:
    import cv2

    _HAVE_CV2 = True
    cv2.setNumThreads(0)  # decoding is parallelized at the worker level
except Exception:  # pragma: no cover
    _HAVE_CV2 = False

from PIL import Image


def load_jpeg(path: str) -> np.ndarray:
    """[h, w, 3] float32 in [0, 1]."""
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    else:
        img = np.asarray(Image.open(path).convert("RGB"))
    return img.astype(np.float32) / 255.0


def load_png16(path: str) -> np.ndarray:
    """[h, w, 1] uint16."""
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
    else:
        img = np.asarray(Image.open(path))
    if img.ndim == 3:
        img = img[..., 0]
    return img.astype(np.uint16)[..., None]


def load_midair_depth(path: str) -> np.ndarray:
    """Mid-Air depth: 512 / float16-bitcast of the uint16 PNG
    (dataloaders/midair.py:49-55)."""
    raw = load_png16(path)
    disp = raw.view(np.float16).astype(np.float32)
    with np.errstate(divide="ignore"):
        return (512.0 / disp).astype(np.float32)


def load_kitti_depth(path: str) -> np.ndarray:
    """KITTI annotated depth: uint16 PNG / 256 m (dataloaders/kitti.py:40-44)."""
    return load_png16(path).astype(np.float32) / 256.0


def load_raw_float32_depth(path: str, h: int, w: int) -> np.ndarray:
    """TartanAir depth: trailing h*w float32 of the file
    (dataloaders/tartanair.py:37-45)."""
    blob = np.fromfile(path, dtype=np.float32)
    return blob[-(h * w):].reshape(h, w, 1).copy()


def resize_bilinear_np(img: np.ndarray, size: Sequence[int]) -> np.ndarray:
    """TF2-convention bilinear resize (half-pixel centers, no antialias)."""
    h, w = size
    if img.shape[0] == h and img.shape[1] == w:
        return img
    if _HAVE_CV2:
        squeeze = img.ndim == 3 and img.shape[2] == 1
        out = cv2.resize(img[..., 0] if squeeze else img, (w, h),
                         interpolation=cv2.INTER_LINEAR)
        return out[..., None] if squeeze else out
    return _resize_np(img, size, nearest=False)


def resize_nearest_np(img: np.ndarray, size: Sequence[int]) -> np.ndarray:
    """TF2-convention nearest resize: src = floor((dst+0.5)*scale).

    (cv2.INTER_NEAREST uses a different grid, so this is done by indexing.)
    """
    return _resize_np(img, size, nearest=True)


def _axis_idx(src: int, dst: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    pos = (np.arange(dst, dtype=np.float64) + 0.5) * (src / dst) - 0.5
    pos = np.clip(pos, 0, src - 1)
    lo = np.minimum(np.floor(pos).astype(np.int64), src - 1)
    hi = np.minimum(lo + 1, src - 1)
    return lo, hi, (pos - lo).astype(np.float32)


def _resize_np(img: np.ndarray, size: Sequence[int], nearest: bool) -> np.ndarray:
    h, w = size
    sh, sw = img.shape[:2]
    if nearest:
        yi = np.clip(np.floor((np.arange(h) + 0.5) * (sh / h)), 0, sh - 1).astype(int)
        xi = np.clip(np.floor((np.arange(w) + 0.5) * (sw / w)), 0, sw - 1).astype(int)
        return img[yi][:, xi]
    ylo, yhi, fy = _axis_idx(sh, h)
    xlo, xhi, fx = _axis_idx(sw, w)
    top = img[ylo]
    bot = img[yhi]
    rows = top + (bot - top) * fy[:, None, None]
    left = rows[:, xlo]
    right = rows[:, xhi]
    return (left + (right - left) * fx[None, :, None]).astype(img.dtype)
