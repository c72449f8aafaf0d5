"""Rigid-frame algebra as a functional (rot, trans) pytree.

Replaces the reference's object-oriented AAFrame class
(druglib/utils/geometry_utils/aaframe.py:96-1015) with pure functions that
jit/vmap cleanly: a frame is just ``(R [..., 3, 3], t [..., 3])``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Rigid(NamedTuple):
    rot: jnp.ndarray  # [..., 3, 3]
    trans: jnp.ndarray  # [..., 3]


def identity(shape=(), dtype=jnp.float32) -> Rigid:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), shape + (3, 3))
    t = jnp.zeros(shape + (3,), dtype=dtype)
    return Rigid(R, t)


def compose(a: Rigid, b: Rigid) -> Rigid:
    """(a o b)(x) = a(b(x))."""
    rot = a.rot @ b.rot
    trans = jnp.einsum("...ij,...j->...i", a.rot, b.trans) + a.trans
    return Rigid(rot, trans)


def invert(a: Rigid) -> Rigid:
    rot_t = jnp.swapaxes(a.rot, -1, -2)
    return Rigid(rot_t, -jnp.einsum("...ij,...j->...i", rot_t, a.trans))


def apply(a: Rigid, x: jnp.ndarray) -> jnp.ndarray:
    """Apply frame to points x [..., 3] (broadcasting over frame dims)."""
    return jnp.einsum("...ij,...j->...i", a.rot, x) + a.trans


def apply_inverse(a: Rigid, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ji,...j->...i", a.rot, x - a.trans)


def from_4x4(m: jnp.ndarray) -> Rigid:
    return Rigid(m[..., :3, :3], m[..., :3, 3])


def to_4x4(a: Rigid) -> jnp.ndarray:
    shape = a.trans.shape[:-1]
    m = jnp.zeros(shape + (4, 4), dtype=a.trans.dtype)
    m = m.at[..., :3, :3].set(a.rot)
    m = m.at[..., :3, 3].set(a.trans)
    m = m.at[..., 3, 3].set(1.0)
    return m


def from_3_points(
    origin: jnp.ndarray,
    x_axis_point: jnp.ndarray,
    xy_plane_point: jnp.ndarray,
    eps: float = 1e-20,
) -> Rigid:
    """Gram-Schmidt frame: x along origin->x_axis_point, xy-plane through
    xy_plane_point. Matches the reference's ``residue_frame``
    (druglib/utils/geometry_utils/utils.py:125-148)."""
    e0 = x_axis_point - origin
    e1 = xy_plane_point - origin
    e0 = e0 / jnp.sqrt(jnp.sum(e0**2, axis=-1, keepdims=True) + eps)
    e1 = e1 - e0 * jnp.sum(e0 * e1, axis=-1, keepdims=True)
    e1 = e1 / jnp.sqrt(jnp.sum(e1**2, axis=-1, keepdims=True) + eps)
    e2 = jnp.cross(e0, e1)
    rot = jnp.stack([e0, e1, e2], axis=-1)
    return Rigid(rot, origin)
