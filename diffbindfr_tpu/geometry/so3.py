"""IGSO(3) diffusion tables: density, CDF, score, and score-norm lookups.

Matches the reference's truncated-series precomputation
(druglib/utils/geometry_utils/so3.py:30-117, itself from DiffDock): the
isotropic Gaussian on SO(3) with concentration eps has angle-marginal density
  f(w) = [sum_l (2l+1) exp(-l(l+1) eps^2) sin((l+1/2) w) / sin(w/2)]
         * (1 - cos w) / pi.
Tables are precomputed once (numpy, float64) over a log-spaced eps grid and a
uniform omega grid, cached to an .npz next to the package, and exposed as JAX
constants for on-device lookups inside jit.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MIN_EPS, MAX_EPS, N_EPS = 0.01, 2.0, 1000
X_N = 2000
_L_TRUNC = 2000

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "resources", "so3_tables.npz"
)


def _expansion(omega: np.ndarray, eps: float) -> np.ndarray:
    ls = np.arange(_L_TRUNC, dtype=np.float64)[:, None]
    coef = (2 * ls + 1) * np.exp(-ls * (ls + 1) * eps**2)
    return np.sum(coef * np.sin(omega[None] * (ls + 0.5)) / np.sin(omega[None] / 2), axis=0)


def _score_series(exp: np.ndarray, omega: np.ndarray, eps: float) -> np.ndarray:
    ls = np.arange(_L_TRUNC, dtype=np.float64)[:, None]
    coef = (2 * ls + 1) * np.exp(-ls * (ls + 1) * eps**2)
    hi = np.sin(omega[None] * (ls + 0.5))
    dhi = (ls + 0.5) * np.cos(omega[None] * (ls + 0.5))
    lo = np.sin(omega[None] / 2)
    dlo = 0.5 * np.cos(omega[None] / 2)
    dsig = np.sum(coef * (lo * dhi - hi * dlo) / lo**2, axis=0)
    return dsig / exp


def _compute_tables() -> dict:
    eps_grid = 10 ** np.linspace(np.log10(MIN_EPS), np.log10(MAX_EPS), N_EPS)
    omegas = np.linspace(0, np.pi, X_N + 1)[1:]
    exp_vals = np.stack([_expansion(omegas, e) for e in eps_grid])
    pdf_vals = exp_vals * (1 - np.cos(omegas)[None]) / np.pi
    cdf_vals = pdf_vals.cumsum(axis=-1) / X_N * np.pi
    score_norms = np.stack(
        [_score_series(exp_vals[i], omegas, eps_grid[i]) for i in range(N_EPS)]
    )
    exp_score_norms = np.sqrt(
        np.sum(score_norms**2 * pdf_vals, axis=1) / np.sum(pdf_vals, axis=1) / np.pi
    )
    return dict(
        eps_grid=eps_grid,
        omegas=omegas,
        cdf_vals=cdf_vals,
        score_norms=score_norms,
        exp_score_norms=exp_score_norms,
    )


class SO3Tables(NamedTuple):
    eps_grid: np.ndarray  # [N_EPS]
    omegas: np.ndarray  # [X_N]
    cdf_vals: np.ndarray  # [N_EPS, X_N]
    score_norms: np.ndarray  # [N_EPS, X_N]
    exp_score_norms: np.ndarray  # [N_EPS]


@functools.lru_cache(maxsize=1)
def tables() -> SO3Tables:
    if os.path.exists(_CACHE):
        data = np.load(_CACHE)
        return SO3Tables(**{k: data[k] for k in SO3Tables._fields})
    os.makedirs(os.path.dirname(_CACHE), exist_ok=True)
    data = _compute_tables()
    t = SO3Tables(**data)
    # atomic write: concurrent processes must never read a partial file
    tmp = _CACHE + f".{os.getpid()}.tmp.npz"
    np.savez_compressed(tmp, **data)
    os.replace(tmp, _CACHE)
    return t


def _eps_index_np(eps: np.ndarray) -> np.ndarray:
    idx = (
        (np.log10(eps) - np.log10(MIN_EPS))
        / (np.log10(MAX_EPS) - np.log10(MIN_EPS))
        * N_EPS
    )
    return np.clip(np.around(idx).astype(int), 0, N_EPS - 1)


def score_norm_np(eps: np.ndarray) -> np.ndarray:
    """sqrt(E ||score||^2) at concentration eps (reference so3.py:144-149)."""
    return tables().exp_score_norms[_eps_index_np(np.asarray(eps, dtype=np.float64))]


def score_vec_np(eps: float, vec: np.ndarray) -> np.ndarray:
    """Score of IGSO(3) at rotation-vector ``vec`` (so3.py:136-141)."""
    t = tables()
    idx = _eps_index_np(np.asarray(eps))
    om = np.linalg.norm(vec, axis=-1, keepdims=True)
    mag = np.interp(om.ravel(), t.omegas, t.score_norms[idx])
    return mag.reshape(om.shape) * vec / np.maximum(om, 1e-12)


def sample_np(eps: float, rng: np.random.Generator, size=()) -> np.ndarray:
    """Sample rotation angle omega ~ IGSO3(eps) by inverse-CDF (so3.py:120-126)."""
    t = tables()
    idx = _eps_index_np(np.asarray(eps))
    u = rng.uniform(0, 1, size=size)
    return np.interp(u, t.cdf_vals[idx], t.omegas)


def sample_vec_np(eps: float, rng: np.random.Generator, size=()) -> np.ndarray:
    x = rng.normal(0, 1, size=size + (3,))
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    return x * sample_np(eps, rng, size=size)[..., None]


# ---------------------------------------------------------------------------
# JAX on-device lookups (used in the training loss and prior sampling)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _jax_tables():
    t = tables()
    # escape any enclosing trace: these are compile-time constants and the
    # cache must never capture a tracer (first call may happen inside jit)
    with jax.ensure_compile_time_eval():
        return jax.tree.map(lambda x: jnp.asarray(x, dtype=jnp.float32), t)


def _eps_index(eps: jnp.ndarray) -> jnp.ndarray:
    idx = (
        (jnp.log10(eps) - np.log10(MIN_EPS))
        / (np.log10(MAX_EPS) - np.log10(MIN_EPS))
        * N_EPS
    )
    return jnp.clip(jnp.round(idx).astype(jnp.int32), 0, N_EPS - 1)


def score_norm(eps: jnp.ndarray) -> jnp.ndarray:
    t = _jax_tables()
    return t.exp_score_norms[_eps_index(eps)]


def _interp_rows(x: jnp.ndarray, xp: jnp.ndarray, fp_rows: jnp.ndarray) -> jnp.ndarray:
    """jnp.interp with per-element table rows; x [...], fp_rows [..., X_N]."""
    return jax.vmap(lambda xi, fpi: jnp.interp(xi, xp, fpi))(
        x.reshape(-1), fp_rows.reshape(-1, fp_rows.shape[-1])
    ).reshape(x.shape)


def score_vec(eps: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """IGSO(3) score at rotation vectors; eps [...], vec [..., 3]."""
    t = _jax_tables()
    idx = _eps_index(eps)
    om = jnp.linalg.norm(vec, axis=-1)
    mag = _interp_rows(om, t.omegas, t.score_norms[idx])
    return mag[..., None] * vec / jnp.maximum(om[..., None], 1e-12)


def sample_vec(key: jax.Array, eps: jnp.ndarray, shape=()) -> jnp.ndarray:
    """Sample rotation vectors ~ IGSO3(eps) on-device; eps scalar or [shape]."""
    t = _jax_tables()
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, shape + (3,))
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    u = jax.random.uniform(k2, shape)
    idx = jnp.broadcast_to(_eps_index(eps), shape)
    # inverse CDF: interp u against cdf rows (x coords) -> omega grid (y coords)
    omega = jax.vmap(lambda ui, row: jnp.interp(ui, row, t.omegas))(
        u.reshape(-1), t.cdf_vals[idx].reshape(-1, t.cdf_vals.shape[-1])
    ).reshape(shape)
    return x * omega[..., None]
