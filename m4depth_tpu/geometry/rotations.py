"""Rotation parameterizations.

Parity reference: ``get_rot_mat`` (utils/depth_operations.py:18-53) — accepts
either a small-angle (x, y, z) 3-vector or a (w, x, y, z) quaternion.
"""

from __future__ import annotations

import jax.numpy as jnp


def rot_mat_small_angle(rot: jnp.ndarray) -> jnp.ndarray:
    """First-order rotation matrix from a small-angle (x, y, z) vector.

    rot: [..., 3] -> [..., 3, 3]
    """
    x, y, z = rot[..., 0], rot[..., 1], rot[..., 2]
    one = jnp.ones_like(x)
    rows = jnp.stack(
        [
            jnp.stack([one, -z, y], axis=-1),
            jnp.stack([z, one, -x], axis=-1),
            jnp.stack([-y, x, one], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rot_mat_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix from a (w, x, y, z) quaternion.

    q: [..., 4] -> [..., 3, 3]. Assumes unit norm (same as the reference).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    rows = jnp.stack(
        [
            jnp.stack([1.0 - (tyy + tzz), txy - twz, txz + twy], axis=-1),
            jnp.stack([txy + twz, 1.0 - (txx + tzz), tyz - twx], axis=-1),
            jnp.stack([txz - twy, tyz + twx, 1.0 - (txx + tyy)], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rot_mat(rot: jnp.ndarray) -> jnp.ndarray:
    """Dispatch on the trailing dimension: 3 = small angle, 4 = quaternion."""
    c = rot.shape[-1]
    if c == 3:
        return rot_mat_small_angle(rot)
    if c == 4:
        return rot_mat_quaternion(rot)
    raise ValueError(
        "Rotation must be a small angle (x,y,z) or quaternion (w,x,y,z); "
        f"got trailing dim {c}"
    )
