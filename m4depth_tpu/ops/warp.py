"""Flow-field backward warping (bilinear resampling).

TPU-native counterpart of the reference's native warp component: the
reference ships a CUDA ``BackProject``/``BackProjectGrad`` op pair
(cuda_backproject/backproject_op_gpu.cu.cc:20-223) with a pure-TF
gather+lerp fallback (utils/dense_image_warp.py:61-192). Here the op is a
single differentiable jnp gather formulation — XLA lowers the 4-tap gather
onto the TPU and autodiff produces the scatter-add backward that the CUDA
kernel implemented by hand with ``atomicAdd``. The performance-critical
user of this op — the parallax sweep — bypasses it entirely via the
expanded-shift formulation (ops/cost_volume.py), which is the true
TPU-native replacement for the CUDA kernel; see DEVELOPMENT.md for the
measured gather economics that force that design.

Semantics (parity with utils/dense_image_warp.py:195-268):
  output[b, y, x, c] = bilinear_sample(image[b], (x + flow_x, y + flow_y))
with sample coordinates clamped to the image border (floor clipped to
[0, size-2], fractional part clipped to [0, 1]).

Convention difference from the reference: flow is ordered (dx, dy), not
(dy, dx) — this repo uses (x, y) ordering everywhere.
"""

from __future__ import annotations

import jax.numpy as jnp


def dense_image_warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``image`` by ``flow``.

    Args:
      image: [..., h, w, c] source.
      flow:  [..., h, w, 2] backward flow, (dx, dy) order; the output pixel
             (y, x) samples the source at (y + dy, x + dx).

    Returns:
      [..., h, w, c] warped image, same dtype as ``image``.
    """
    *lead, h, w, c = image.shape
    img = image.reshape((-1, h, w, c))
    flo = flow.reshape((-1, h, w, 2)).astype(jnp.float32)
    b = img.shape[0]

    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    qx = gx + flo[..., 0]
    qy = gy + flo[..., 1]

    # Border clamp exactly as the reference fallback: floor in [0, size-2],
    # frac in [0, 1] (equivalent to clamping the query into [0, size-1]).
    x0f = jnp.clip(jnp.floor(qx), 0.0, float(max(w - 2, 0)))
    y0f = jnp.clip(jnp.floor(qy), 0.0, float(max(h - 2, 0)))
    ax = jnp.clip(qx - x0f, 0.0, 1.0).astype(image.dtype)[..., None]
    ay = jnp.clip(qy - y0f, 0.0, 1.0).astype(image.dtype)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    flat = img.reshape(b, h * w, c)
    base = y0 * w + x0                                   # [b, h, w]

    def gather(lin):
        idx = lin.reshape(b, h * w, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(b, h, w, c)

    tl = gather(base)
    tr = gather(base + 1)
    bl = gather(base + w)
    br = gather(base + w + 1)

    top = tl + (tr - tl) * ax
    bot = bl + (br - bl) * ax
    out = top + (bot - top) * ay
    return out.reshape(*lead, h, w, c)
