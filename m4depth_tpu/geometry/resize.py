"""Image resizing with exact TF-convention parity.

The reference mixes three resize conventions (a known parity trap,
SURVEY.md §7):
  * ``tf.compat.v1.image.resize_bilinear`` (legacy grid: src = dst * scale,
    NO half-pixel offset) for inter-level upsampling of decoder estimates
    (m4depth_network.py:202-204) and flow upsampling
    (utils/depth_operations.py:13).
  * ``tf.image.resize`` bilinear (modern half-pixel, no antialias) for loss
    ground-truth resizing (m4depth_network.py:532).
  * ``tf.image.resize`` nearest (half-pixel floor) for final output
    upsampling (m4depth_network.py:368) and sparse depth resizing
    (dataloaders/kitti.py:44).

All three are implemented here as separable gather+lerp ops on [b, h, w, c]
arrays — static shapes, fuse cleanly under jit. ``jax.image.resize`` is NOT
used (its antialias default differs from TF).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def _lerp_axis(x: jnp.ndarray, axis: int, dst: int, half_pixel: bool) -> jnp.ndarray:
    """Linear-resample one axis. half_pixel selects the modern grid."""
    src = x.shape[axis]
    if src == dst:
        return x
    scale = src / dst
    out = jnp.arange(dst, dtype=jnp.float32)
    pos = (out + 0.5) * scale - 0.5 if half_pixel else out * scale
    pos = jnp.clip(pos, 0.0, float(src - 1))
    lo = jnp.floor(pos).astype(jnp.int32)
    lo = jnp.minimum(lo, src - 1)
    hi = jnp.minimum(lo + 1, src - 1)
    frac = (pos - lo.astype(jnp.float32))
    shape = [1] * x.ndim
    shape[axis] = dst
    frac = frac.reshape(shape).astype(x.dtype)
    a = jnp.take(x, lo, axis=axis)
    b = jnp.take(x, hi, axis=axis)
    return a + (b - a) * frac


def _nearest_axis(x: jnp.ndarray, axis: int, dst: int) -> jnp.ndarray:
    src = x.shape[axis]
    if src == dst:
        return x
    scale = src / dst
    # TF2 nearest uses half_pixel_centers=True: src_idx = floor((dst+0.5)*scale)
    idx = jnp.floor((jnp.arange(dst, dtype=jnp.float32) + 0.5) * scale)
    idx = jnp.clip(idx, 0, src - 1).astype(jnp.int32)
    return jnp.take(x, idx, axis=axis)


def resize_bilinear_v1(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Legacy TFv1 ``resize_bilinear`` (align_corners=False): src = dst*scale."""
    h, w = size
    return _lerp_axis(_lerp_axis(x, 1, h, half_pixel=False), 2, w, half_pixel=False)


def resize_bilinear(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Modern TF2 bilinear (half-pixel centers, no antialias)."""
    h, w = size
    return _lerp_axis(_lerp_axis(x, 1, h, half_pixel=True), 2, w, half_pixel=True)


def resize_nearest(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Modern TF2 nearest-neighbor (half-pixel floor)."""
    h, w = size
    return _nearest_axis(_nearest_axis(x, 1, h), 2, w)
