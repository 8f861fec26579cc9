"""Cost volumes: parallax-sweeping (DSCV) and spatial-neighborhood (SNCV).

TPU-first formulation notes:
  * The DSCV vmaps the warp over the 2r+1 parallax hypotheses by folding them
    into the batch dimension — one fused gather per level instead of the
    reference's batch-tiling + reshape dance (utils/depth_operations.py:217-281).
  * Correlations run in reduced precision; the reference used fp16
    (depth_operations.py:276-278), here bf16 which is native on the TPU VPU.
  * The SNCV is a static 7x7 set of XLA slices of a padded map — no gathers,
    no dynamic shapes (parity: utils/depth_operations.py:283-313).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from m4depth_tpu.geometry.camera import Camera
from m4depth_tpu.geometry.parallax import parallax_sweep_flows
from m4depth_tpu.ops.warp import dense_image_warp


def parallax_sweeping_cv(
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    para_prev_t: jnp.ndarray,
    para_sweep_center: jnp.ndarray,
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    camera: Camera,
    search_range: int,
    num_cuts: int = 1,
    cv_dtype: jnp.dtype = jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Disparity(parallax)-Sweeping Cost Volume.

    Args:
      c1: [b,h,w,C] current-frame features (cut-normalized).
      c2: [b,h,w,C] previous-frame features (cut-normalized).
      para_prev_t: [b,h,w,1] parallax derived from the previous depth estimate;
        warped alongside c2 so each hypothesis also carries a reprojected
        temporal parallax.
      para_sweep_center: [b,h,w,1] sweep center (upsampled deeper-level
        parallax estimate).
      search_range: r; hypotheses are center + {-r..r}, i.e. s = 2r+1.

    Returns:
      cv: [b,h,w,num_cuts*s] per-cut mean correlations, fp32, channel order
          cut-major / hypothesis-minor (parity: depth_operations.py:276-278).
      para_prev_t_warped: [b,h,w,s] the temporal parallax under each
          hypothesis' warp.
    """
    b, h, w, C = c1.shape
    s = 2 * search_range + 1
    flows = parallax_sweep_flows(para_sweep_center, rot, trans, camera,
                                 search_range)            # [b,s,h,w,2]

    combined = jnp.concatenate([c2, para_prev_t.astype(c2.dtype)], axis=-1)
    tiled = jnp.broadcast_to(combined[:, None], (b, s, h, w, C + 1))
    warped = dense_image_warp(tiled, flows)               # [b,s,h,w,C+1]

    c2w = warped[..., :C]
    para_w = warped[..., C]                               # [b,s,h,w]

    prod = c1[:, None].astype(cv_dtype) * c2w.astype(cv_dtype)
    cv = prod.reshape(b, s, h, w, num_cuts, C // num_cuts).mean(axis=-1)
    # -> [b,h,w,num_cuts,s] -> cut-major channel layout
    cv = cv.transpose(0, 2, 3, 4, 1).reshape(b, h, w, num_cuts * s)
    para_w = para_w.transpose(0, 2, 3, 1)                 # [b,h,w,s]
    return cv.astype(jnp.float32), para_w.astype(jnp.float32)


def spatial_cost_volume(
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    search_range: int,
    dilation_rate: int = 1,
    num_cuts: int = 1,
    cv_dtype: jnp.dtype = jnp.bfloat16,
    leaky_slope: float = 0.1,
) -> jnp.ndarray:
    """Spatial-Neighborhood Cost Volume (auto-correlation when c1 is c2).

    For every spatial offset (dy, dx) in a (2r+1)^2 window and every feature
    cut, the per-pixel mean correlation between c1 and the shifted c2, passed
    through leaky-relu. Channel order offset-major / cut-minor (parity:
    utils/depth_operations.py:283-313).

    Returns: [b,h,w,(2r+1)^2 * num_cuts] fp32.
    """
    b, h, w, C = c1.shape
    r = search_range * dilation_rate
    side = 2 * search_range + 1
    cc = C // num_cuts

    pad = jnp.pad(c2, ((0, 0), (r, r), (r, r), (0, 0)))
    c1r = c1.reshape(b, h, w, num_cuts, cc).astype(cv_dtype)

    costs = []
    for dy in range(side):
        for dx in range(side):
            y0, x0 = dy * dilation_rate, dx * dilation_rate
            shifted = pad[:, y0:y0 + h, x0:x0 + w, :]
            prod = c1r * shifted.reshape(b, h, w, num_cuts, cc).astype(cv_dtype)
            costs.append(prod.mean(axis=-1))              # [b,h,w,num_cuts]
    cv = jnp.concatenate(costs, axis=-1).astype(jnp.float32)
    return jnp.where(cv > 0, cv, cv * leaky_slope)
