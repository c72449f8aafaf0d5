"""Rotation utilities (JAX, batched, static-shape).

TPU-first replacements for the reference's scipy/torch rotation helpers
(druglib/utils/geometry_utils/utils.py:16-230, :1229 axis_angle_to_rot).
Everything here is jit/vmap friendly and numerically safe at zero angle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def axis_angle_to_matrix(rotvec: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula; rotvec [..., 3] -> [..., 3, 3].

    Formulated with sinc-style factors of the *unnormalized* vector so both
    the value and the gradient are finite at ||rotvec|| == 0.
    """
    theta2 = jnp.sum(rotvec**2, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-24)
    small = theta < 1e-4
    theta_s = jnp.where(small, 1.0, theta)
    # f1 = sin(t)/t, f2 = (1 - cos(t))/t^2, with Taylor fallbacks near 0
    f1 = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta_s) / theta_s)
    f2 = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta_s)) / theta_s**2)
    vx, vy, vz = rotvec[..., 0], rotvec[..., 1], rotvec[..., 2]
    zero = jnp.zeros_like(vx)
    K = jnp.stack(
        [
            jnp.stack([zero, -vz, vy], axis=-1),
            jnp.stack([vz, zero, -vx], axis=-1),
            jnp.stack([-vy, vx, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rotvec.dtype), K.shape)
    return eye + f1[..., None, None] * K + f2[..., None, None] * (K @ K)


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """R [..., 3, 3] -> quaternion [..., 4] (w, x, y, z), w >= 0.

    Branchless Shepperd extraction: compute all four candidate quaternions
    and select the numerically best (largest pivot) per element — stable for
    every rotation including angles near pi.
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    t0 = 1.0 + r00 + r11 + r22
    t1 = 1.0 + r00 - r11 - r22
    t2 = 1.0 - r00 + r11 - r22
    t3 = 1.0 - r00 - r11 + r22
    q0 = jnp.stack([t0, r21 - r12, r02 - r20, r10 - r01], axis=-1)
    q1 = jnp.stack([r21 - r12, t1, r01 + r10, r02 + r20], axis=-1)
    q2 = jnp.stack([r02 - r20, r01 + r10, t2, r12 + r21], axis=-1)
    q3 = jnp.stack([r10 - r01, r02 + r20, r12 + r21, t3], axis=-1)
    ts = jnp.stack([t0, t1, t2, t3], axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    best = jnp.argmax(ts, axis=-1)
    q = jnp.take_along_axis(qs, best[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def matrix_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of axis_angle_to_matrix; R [..., 3, 3] -> rotvec [..., 3],
    canonical angle in [0, pi]."""
    q = matrix_to_quaternion(R)
    w, v = q[..., 0], q[..., 1:]
    nv = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(nv, w)
    small = nv < 1e-6
    # rotvec = v * theta / nv; as nv -> 0, theta/nv -> 2/w -> 2
    factor = jnp.where(small, 2.0, theta / jnp.where(small, 1.0, nv))
    return v * factor[..., None]


def rot_x(angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation about the local x axis; angle [...] -> [..., 3, 3]."""
    s, c = jnp.sin(angle), jnp.cos(angle)
    one = jnp.ones_like(s)
    zero = jnp.zeros_like(s)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero], axis=-1),
            jnp.stack([zero, c, -s], axis=-1),
            jnp.stack([zero, s, c], axis=-1),
        ],
        axis=-2,
    )


def rot_x_from_sincos(sincos: jnp.ndarray) -> jnp.ndarray:
    """R_x from (sin, cos) pairs; sincos [..., 2] -> [..., 3, 3]."""
    s, c = sincos[..., 0], sincos[..., 1]
    one = jnp.ones_like(s)
    zero = jnp.zeros_like(s)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero], axis=-1),
            jnp.stack([zero, c, -s], axis=-1),
            jnp.stack([zero, s, c], axis=-1),
        ],
        axis=-2,
    )


def random_rotation(key: jax.Array, shape=()) -> jnp.ndarray:
    """Uniform random rotation matrices via normalized quaternions."""
    q = jax.random.normal(key, shape + (4,))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quaternion_to_matrix(q)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """q [..., 4] (w, x, y, z), assumed normalized -> [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y**2 + z**2), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x**2 + z**2), 2 * (y * z - w * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x**2 + y**2)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def wrap_angle(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to (-pi, pi]."""
    return jnp.mod(x + jnp.pi, 2.0 * jnp.pi) - jnp.pi
