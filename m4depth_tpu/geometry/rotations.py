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
    Uses the outer-product identity R = (w^2 - v.v) I + 2 v v^T + 2 w [v]x
    — identical to the expanded per-entry form for unit quaternions, and a
    batched-einsum shape XLA fuses well.
    """
    w = q[..., :1]
    v = q[..., 1:]
    eye = jnp.eye(3, dtype=q.dtype)
    zero = jnp.zeros_like(v[..., 0])
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    skew = jnp.stack(
        [
            jnp.stack([zero, -vz, vy], axis=-1),
            jnp.stack([vz, zero, -vx], axis=-1),
            jnp.stack([-vy, vx, zero], axis=-1),
        ],
        axis=-2,
    )
    vvt = v[..., :, None] * v[..., None, :]
    scal = (w * w - jnp.sum(v * v, axis=-1, keepdims=True))[..., None]
    return scal * eye + 2.0 * vvt + 2.0 * w[..., None] * skew


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
