"""Closed-form 6-DoF parallax/depth geometry.

This module implements the camera-motion-generalized *visual parallax* math
that is the core contribution of M4Depth, as pure jnp functions that fuse into
a single XLA graph per pyramid level.

Definitions (all per batch element):
  * ``rot``  — rotation from the previous camera frame to the current one,
    as a (w, x, y, z) quaternion (or small-angle 3-vector).
  * ``trans`` — camera translation between the two frames, expressed in the
    previous camera frame, axes (x right, y down, z forward).
  * A pixel ray ``h = ((u+0.5-cx)/fx, (v+0.5-cy)/fy, 1)``.
  * ``rc = R @ h``; ``alpha = rc_z``; the rotation-compensated projection
    ``proj = rc * (fx, fy, 1) / alpha`` (pixel coords relative to the
    principal point).
  * ``rho = |(t*f)_xy - t_z * proj_xy|`` — the parallax magnitude direction
    scale for this pixel.
  * parallax (denoted ``disp``):  ``disp = rho / (depth * alpha + t_z)``.

Parity reference (for behavior, not implementation):
  utils/depth_operations.py:140-194 (parallax2depth / depth2parallax),
  :196-215 (prev_d2para), :71-105 (reproject), :108-137 (recompute_depth),
  :223-281 (flow construction inside the DSCV).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from m4depth_tpu.geometry.camera import Camera, pixel_grid
from m4depth_tpu.geometry.rotations import rot_mat


def _apply_rot(R: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate per-pixel 3-vectors: R [b,3,3] applied to v [b,h,w,3].

    Written as explicit VPU element-wise ops rather than einsum/dot: on TPU a
    tiny dot_general would route through the MXU at its default (bf16-class)
    precision — geometry must stay exact fp32.
    """
    b = R.shape[0]
    Rb = R.reshape(b, 1, 1, 3, 3)
    return (
        Rb[..., 0] * v[..., 0:1]
        + Rb[..., 1] * v[..., 1:2]
        + Rb[..., 2] * v[..., 2:3]
    )


class EpipolarTerms(NamedTuple):
    """Per-pixel parallax-independent quantities, reused across ops.

    All fields are fp32:
      alpha: [b, h, w, 1]  z of the rotated ray.
      proj:  [b, h, w, 2]  rotation-compensated projection (pixels, rel. to c).
      delta: [b, h, w, 2]  un-normalized epipolar direction.
      rho:   [b, h, w, 1]  |delta|.
      mesh:  [b, h, w, 2]  pixel centers relative to the principal point.
      t_z:   [b, 1, 1, 1]  forward translation.
    """

    alpha: jnp.ndarray
    proj: jnp.ndarray
    delta: jnp.ndarray
    rho: jnp.ndarray
    mesh: jnp.ndarray
    t_z: jnp.ndarray


def epipolar_terms(h: int, w: int, rot: jnp.ndarray, trans: jnp.ndarray,
                   camera: Camera) -> EpipolarTerms:
    """Compute the shared epipolar quantities for an (h, w) grid."""
    b = camera.batch
    coords, mesh = pixel_grid(h, w, camera)            # [b,h,w,3], [b,h,w,2]
    R = rot_mat(rot)                                    # [b,3,3]
    rc = _apply_rot(R, coords)                          # [b,h,w,3]
    alpha = rc[..., 2:3]
    f_xy = camera.f.reshape(b, 1, 1, 2)
    proj = rc[..., :2] * f_xy / alpha                   # [b,h,w,2]
    scaled_t = trans.reshape(b, 1, 1, 3) * jnp.concatenate(
        [camera.f, jnp.ones((b, 1), jnp.float32)], axis=1
    ).reshape(b, 1, 1, 3)
    t_z = scaled_t[..., 2:3]
    delta = scaled_t[..., :2] - t_z * proj              # [b,h,w,2]
    rho = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    return EpipolarTerms(alpha=alpha, proj=proj, delta=delta, rho=rho,
                         mesh=mesh, t_z=jnp.broadcast_to(t_z, (b, 1, 1, 1)))


def depth_to_parallax(depth: jnp.ndarray, rot: jnp.ndarray, trans: jnp.ndarray,
                      camera: Camera) -> jnp.ndarray:
    """Convert a depth map [b,h,w,1] to a parallax map [b,h,w,1]."""
    _, h, w = depth.shape[:3]
    e = epipolar_terms(h, w, rot, trans, camera)
    return e.rho / (depth * e.alpha + e.t_z)


def parallax_to_depth(parallax: jnp.ndarray, rot: jnp.ndarray,
                      trans: jnp.ndarray, camera: Camera) -> jnp.ndarray:
    """Convert a parallax map [b,h,w,1] to a depth map [b,h,w,1]."""
    _, h, w = parallax.shape[:3]
    e = epipolar_terms(h, w, rot, trans, camera)
    return (e.rho / parallax - e.t_z) / e.alpha


def prev_depth_to_parallax(prev_depth: jnp.ndarray, rot: jnp.ndarray,
                           trans: jnp.ndarray, camera: Camera) -> jnp.ndarray:
    """Parallax observed *now* for a point whose depth was measured in the
    previous frame at the same pixel.

    Rotation-independent (rotation does not create parallax); ``rot`` is
    accepted for signature parity but unused, as in the reference
    (utils/depth_operations.py:196-215). Wrapped in ``stop_gradient`` —
    temporal recurrence is not differentiated through.
    """
    del rot
    b, h, w = prev_depth.shape[:3]
    coords, _ = pixel_grid(h, w, camera)
    f_vec = jnp.concatenate(
        [camera.f, jnp.ones((b, 1), jnp.float32)], axis=1
    ).reshape(b, 1, 1, 3)
    ch = coords * f_vec                                  # (u-cx, v-cy, 1)
    t = trans.reshape(b, 1, 1, 3)
    scaled_t = t * f_vec
    t_z = t[..., 2:3]
    delta = (scaled_t - t_z * ch) / (prev_depth - t_z)
    disp = jnp.linalg.norm(delta[..., :2], axis=-1, keepdims=True)
    return jax.lax.stop_gradient(disp)


def parallax_sweep_flows(parallax: jnp.ndarray, rot: jnp.ndarray,
                         trans: jnp.ndarray, camera: Camera,
                         search_range: int) -> jnp.ndarray:
    """Backward-warp flows for the 2*search_range+1 swept parallax hypotheses.

    For hypothesis k in [-r, r], the sampled position for output pixel p is
    ``proj(p) + (delta(p)/rho(p)) * clip(parallax(p)+k) + c - 0.5`` in source
    index coordinates; the returned flow is that position minus the integer
    index grid, ordered (dx, dy).

    Args:
      parallax: [b, h, w, 1] sweep center.
    Returns:
      flows: [b, s, h, w, 2] with s = 2*search_range+1, (dx, dy) order.

    Parity: flow construction in ``get_parallax_sweeping_cv``
    (utils/depth_operations.py:230-265); hypothesis k is ``parallax + k``
    clipped to [1e-6, 1e6].
    """
    b, h, w = parallax.shape[:3]
    e = epipolar_terms(h, w, rot, trans, camera)
    offsets = jnp.arange(-search_range, search_range + 1, dtype=jnp.float32)
    disp_k = jnp.clip(parallax[:, None] + offsets.reshape(1, -1, 1, 1, 1),
                      1e-6, 1e6)                          # [b,s,h,w,1]
    # rho == 0 (motionless pixel rows under pure rotation / zero translation)
    # would produce 0/0 here; the reference NaN-poisons in that case
    # (depth_operations.py:261-263) — we guard instead.
    unit = e.delta / jnp.maximum(e.rho, 1e-12)            # [b,h,w,2]
    target = e.proj[:, None] + unit[:, None] * disp_k     # [b,s,h,w,2]
    flow = target - e.mesh[:, None]                       # rel. to pixel centers
    return flow


def reprojection_flow(depth: jnp.ndarray, rot: jnp.ndarray, trans: jnp.ndarray,
                      camera: Camera) -> jnp.ndarray:
    """Flow field induced by camera motion over a depth map.

    Backward-warp convention: sampling position for output pixel p is
    ``index_grid(p) + flow(p)``, flow ordered (dx, dy).

    Parity: ``reproject`` (utils/depth_operations.py:71-105) — projects the
    3-D point ``ray * depth`` through ``K [R|t]``.
    """
    b, h, w = depth.shape[:3]
    coords, mesh = pixel_grid(h, w, camera)
    R = rot_mat(rot)
    point = coords * depth                                # [b,h,w,3]
    moved = _apply_rot(R, point) + trans.reshape(b, 1, 1, 3)
    f_xy = camera.f.reshape(b, 1, 1, 2)
    proj = moved[..., :2] * f_xy / moved[..., 2:3]        # pixels rel. to c
    return proj - mesh


def reproject(fmap: jnp.ndarray, depth: jnp.ndarray, rot: jnp.ndarray,
              trans: jnp.ndarray, camera: Camera) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp ``fmap`` [b,h,w,c] into the current frame using depth + motion."""
    from m4depth_tpu.ops.warp import dense_image_warp

    flow = reprojection_flow(depth, rot, trans, camera)
    return dense_image_warp(fmap, flow), flow


def recompute_depth(depth: jnp.ndarray, rot: jnp.ndarray, trans: jnp.ndarray,
                    camera: Camera) -> jnp.ndarray:
    """Depth perceived from the new viewpoint for points at the same pixels.

    Parity: ``recompute_depth`` (utils/depth_operations.py:108-137) — the new
    z is ``(R_3 . ray) * depth - R_3 . t`` with geometry factors detached,
    clipped to [0.1, 2000].
    """
    b, h, w = depth.shape[:3]
    coords, _ = pixel_grid(h, w, camera)
    r3 = rot_mat(rot)[:, 2, :].reshape(b, 1, 1, 3)        # last row of R
    scale = jnp.sum(r3 * coords, axis=-1, keepdims=True)
    shift = jnp.sum(r3 * (-trans).reshape(b, 1, 1, 3), axis=-1, keepdims=True)
    new_depth = jax.lax.stop_gradient(scale) * depth + jax.lax.stop_gradient(shift)
    return jnp.clip(new_depth, 0.1, 2000.0)
