"""Masked batched Kabsch superposition (JAX).

Replaces the reference's single-molecule torch implementation
(druglib/utils/geometry_utils/superimposition.py:375) with a batched,
mask-aware version used inside the jit-compiled sampler.
"""
from __future__ import annotations

import jax.numpy as jnp


def kabsch_align(
    mobile: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    eps: float = 1e-8,
):
    """Optimal rigid (R, t) aligning ``mobile`` onto ``target``.

    Args:
        mobile, target: [..., N, 3]
        mask: optional [..., N] validity mask.
    Returns:
        (R [..., 3, 3], t [..., 3]) minimizing ||R @ mobile + t - target||
        over masked points.
    """
    if mask is None:
        mask = jnp.ones(mobile.shape[:-1], dtype=mobile.dtype)
    w = mask[..., None].astype(mobile.dtype)
    n = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), eps)
    mu_m = jnp.sum(mobile * w, axis=-2, keepdims=True) / n
    mu_t = jnp.sum(target * w, axis=-2, keepdims=True) / n
    xm = (mobile - mu_m) * w
    xt = (target - mu_t) * w
    # covariance H = xm^T @ xt  -> [..., 3, 3]
    H = jnp.einsum("...ni,...nj->...ij", xm, xt)
    U, _, Vt = jnp.linalg.svd(H, full_matrices=False)
    V = jnp.swapaxes(Vt, -1, -2)
    # proper rotation (det +1): R = V diag(1, 1, det(V U^T)) U^T
    det = jnp.linalg.det(jnp.einsum("...ij,...kj->...ik", V, U))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = (V * D[..., None, :]) @ jnp.swapaxes(U, -1, -2)
    t = mu_t[..., 0, :] - jnp.einsum("...ij,...j->...i", R, mu_m[..., 0, :])
    return R, t


def kabsch_apply(R: jnp.ndarray, t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...nj->...ni", R, x) + t[..., None, :]


def masked_rmsd(
    a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray | None = None, eps=1e-8
) -> jnp.ndarray:
    if mask is None:
        mask = jnp.ones(a.shape[:-1], dtype=a.dtype)
    d2 = jnp.sum((a - b) ** 2, axis=-1) * mask
    n = jnp.maximum(jnp.sum(mask, axis=-1), eps)
    return jnp.sqrt(jnp.sum(d2, axis=-1) / n)
