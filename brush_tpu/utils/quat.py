"""Quaternion helpers (wxyz convention), vectorized over leading axes.

Matches the reference's inherent-method math (brush-cube/src/lib.rs:191-230,
quat_vec.rs) but written as plain jnp so JAX can autodiff through it.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] wxyz (assumed normalized) -> [..., 3, 3] rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x2, y2, z2 = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (y2 + z2), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (x2 + z2), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (x2 + y2),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate_vec(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate [..., 3] vectors by [..., 4] wxyz quaternions."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )
