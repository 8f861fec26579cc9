"""Pinhole camera pytree and normalized pixel grids.

Parity reference: camera dict ``{"f": [b,2], "c": [b,2]}`` used throughout the
reference, and ``get_coords_2d`` (utils/depth_operations.py:56-68) which builds
the pixel-center grid normalized by the focal length.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Per-sample pinhole intrinsics.

    f: [b, 2] focal lengths (fx, fy) in pixels.
    c: [b, 2] principal point (cx, cy) in pixels.
    """

    f: jnp.ndarray
    c: jnp.ndarray

    @property
    def batch(self) -> int:
        return self.f.shape[0]


def scale_camera(camera: Camera, factor: float) -> Camera:
    """Scale intrinsics for a pyramid level (f, c divided by 2**level).

    Parity: per-level camera scaling in the decoder pyramid
    (m4depth_network.py:300-302).
    """
    return Camera(f=camera.f / factor, c=camera.c / factor)


def pixel_grid(h: int, w: int, camera: Camera) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized homogeneous pixel coordinates.

    Returns:
      coords: [b, h, w, 3] rays ((u+0.5-cx)/fx, (v+0.5-cy)/fy, 1).
      mesh:   [b, h, w, 2] pixel-center offsets from the principal point,
              ordered (x, y) in pixels.

    Parity: ``get_coords_2d`` (utils/depth_operations.py:56-68) — pixel centers
    at integer index + 0.5.
    """
    b = camera.batch
    xs = jnp.arange(0.5, w, 1.0, dtype=jnp.float32)
    ys = jnp.arange(0.5, h, 1.0, dtype=jnp.float32)
    grid_x = jnp.broadcast_to(xs[None, :], (h, w))
    grid_y = jnp.broadcast_to(ys[:, None], (h, w))
    mesh = jnp.stack([grid_x, grid_y], axis=-1)[None]  # [1, h, w, 2]
    mesh = mesh - camera.c.reshape(b, 1, 1, 2)
    rays = mesh / camera.f.reshape(b, 1, 1, 2)
    ones = jnp.ones((b, h, w, 1), dtype=jnp.float32)
    coords = jnp.concatenate([rays, ones], axis=-1)
    return coords, mesh
