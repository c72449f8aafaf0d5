"""Rotation utilities (JAX, batched, static-shape).

TPU-first replacements for the reference's scipy/torch rotation helpers
(druglib/utils/geometry_utils/utils.py:16-230, :1229 axis_angle_to_rot).
Everything here is jit/vmap friendly and numerically safe at zero angle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def axis_angle_to_matrix(rotvec: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Rodrigues formula; rotvec [..., 3] -> [..., 3, 3].

    Safe at ||rotvec|| -> 0 (returns identity smoothly via sinc-style guards).
    """
    theta = jnp.linalg.norm(rotvec, axis=-1, keepdims=True)
    # avoid 0/0; the factors below are analytic at 0
    safe = jnp.maximum(theta, eps)
    k = rotvec / safe
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zero, -kz, ky], axis=-1),
            jnp.stack([kz, zero, -kx], axis=-1),
            jnp.stack([-ky, kx, zero], axis=-1),
        ],
        axis=-2,
    )
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rotvec.dtype), K.shape)
    R = eye + s * K + (1.0 - c) * (K @ K)
    # exact identity when theta ~ 0
    return jnp.where(theta[..., None] > eps, R, eye)


def matrix_to_axis_angle(R: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverse of axis_angle_to_matrix; R [..., 3, 3] -> rotvec [..., 3]."""
    # angle from trace, axis from skew part
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    skew = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin = jnp.sin(theta)
    # generic case
    axis = skew / jnp.maximum(2.0 * sin, eps)[..., None]
    rotvec = axis * theta[..., None]
    # near theta == pi the skew part vanishes; recover axis from diagonal
    near_pi = theta > (jnp.pi - 1e-3)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_pi = jnp.sqrt(jnp.clip((diag + 1.0) / 2.0, 0.0, None))
    # fix signs using off-diagonals
    sx = jnp.where(R[..., 2, 1] - R[..., 1, 2] >= 0, 1.0, -1.0)
    sy = jnp.where(R[..., 0, 2] - R[..., 2, 0] >= 0, 1.0, -1.0)
    sz = jnp.where(R[..., 1, 0] - R[..., 0, 1] >= 0, 1.0, -1.0)
    axis_pi = axis_pi * jnp.stack([sx, sy, sz], axis=-1)
    axis_pi = axis_pi / jnp.maximum(
        jnp.linalg.norm(axis_pi, axis=-1, keepdims=True), eps
    )
    rotvec = jnp.where(near_pi[..., None], axis_pi * theta[..., None], rotvec)
    # near zero rotation
    small = theta < 1e-6
    return jnp.where(small[..., None], skew / 2.0, rotvec)


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
