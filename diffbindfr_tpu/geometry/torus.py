"""Wrapped-normal diffusion tables on the torus (ligand torsions, chi angles).

Matches the reference's truncated wrapped-normal series
(druglib/utils/geometry_utils/torus.py:21-115, from DiffDock):
  p(x, sigma)     = sum_k exp(-(x + 2 pi k)^2 / (2 sigma^2))        (unnorm.)
  score(x, sigma) = d/dx log p.
Tables are precomputed on log-spaced |x| and sigma grids, cached to .npz, and
exposed both as numpy lookups (preprocessing) and JAX constants (on-device).

One deliberate improvement over the reference: score_norm(sigma) = E[score^2]
is computed by deterministic numerical integration of p * score^2 over the
grid rather than a 10k-sample Monte Carlo draw (reference torus.py:102-106),
so the value is reproducible and slightly more accurate.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# grid sizes: the reference uses 5001x5001 float64 (~330MB cached, slow to
# load every process). 2001x2001 float32 keeps the nearest-neighbor lookup
# error far below the score-matching noise floor at 1/10 the footprint.
X_MIN, X_N = 1e-5, 2000  # |x| grid, relative to pi
SIGMA_MIN, SIGMA_MAX, SIGMA_N = 3e-3, 2.0, 2000  # sigma grid, relative to pi
_N_WRAP = 100

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "resources", "torus_tables.npz"
)


class TorusTables(NamedTuple):
    x_grid: np.ndarray  # [X_N + 1]
    sigma_grid: np.ndarray  # [SIGMA_N + 1]
    p: np.ndarray  # [SIGMA_N + 1, X_N + 1]
    score: np.ndarray  # [SIGMA_N + 1, X_N + 1]
    score_norm: np.ndarray  # [SIGMA_N + 1]


def _compute_tables() -> dict:
    x = 10 ** np.linspace(np.log10(X_MIN), 0, X_N + 1) * np.pi
    sigma = 10 ** np.linspace(np.log10(SIGMA_MIN), np.log10(SIGMA_MAX), SIGMA_N + 1) * np.pi

    p = np.zeros((SIGMA_N + 1, X_N + 1))
    grad = np.zeros((SIGMA_N + 1, X_N + 1))
    s2 = sigma[:, None] ** 2
    for k in range(-_N_WRAP, _N_WRAP + 1):
        xk = x[None] + 2 * np.pi * k
        e = np.exp(-(xk**2) / (2 * s2))
        p += e
        grad += -xk / s2 * e
    # where the density underflows (tiny sigma, |x| near pi) the k=0 wrap
    # dominates and the score limit is -x/sigma^2; avoid 0/0 = NaN
    score = np.where(p > 0, grad / np.where(p > 0, p, 1.0), -x[None] / s2)

    # E[score^2] under the wrapped normal, by trapezoid integration over the
    # symmetric log grid (score is odd, p even, so integrate |x| in (0, pi])
    w = np.gradient(x)
    num = np.sum(p * score**2 * w[None], axis=1)
    den = np.sum(p * w[None], axis=1)
    score_norm = num / den

    f32 = lambda a: a.astype(np.float32)
    return dict(
        x_grid=f32(x),
        sigma_grid=f32(sigma),
        p=f32(p),
        score=f32(score),
        score_norm=f32(score_norm),
    )


@functools.lru_cache(maxsize=1)
def tables() -> TorusTables:
    if os.path.exists(_CACHE):
        data = np.load(_CACHE)
        if data["score"].shape == (SIGMA_N + 1, X_N + 1):
            return TorusTables(**{k: data[k] for k in TorusTables._fields})
    os.makedirs(os.path.dirname(_CACHE), exist_ok=True)
    data = _compute_tables()
    # atomic write: concurrent processes must never read a partial file
    tmp = _CACHE + f".{os.getpid()}.tmp.npz"
    np.savez(tmp, **data)
    os.replace(tmp, _CACHE)
    return TorusTables(**data)


def _x_index_np(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = (x + np.pi) % (2 * np.pi) - np.pi
    sign = np.sign(x)
    lx = np.log(np.maximum(np.abs(x), 1e-300) / np.pi)
    idx = (lx - np.log(X_MIN)) / (0 - np.log(X_MIN)) * X_N
    return sign, np.round(np.clip(idx, 0, X_N)).astype(int)


def _sigma_index_np(sigma: np.ndarray) -> np.ndarray:
    ls = np.log(sigma / np.pi)
    idx = (ls - np.log(SIGMA_MIN)) / (np.log(SIGMA_MAX) - np.log(SIGMA_MIN)) * SIGMA_N
    return np.round(np.clip(idx, 0, SIGMA_N)).astype(int)


def score_np(x: np.ndarray, sigma: np.ndarray) -> np.ndarray:
    t = tables()
    sign, xi = _x_index_np(np.asarray(x, dtype=np.float64))
    si = _sigma_index_np(np.asarray(sigma, dtype=np.float64))
    # table rows are the score at +|x| (negative there); odd in x
    return sign * t.score[si, xi]


def score_norm_np(sigma: np.ndarray) -> np.ndarray:
    t = tables()
    return t.score_norm[_sigma_index_np(np.asarray(sigma, dtype=np.float64))]


def sample_np(sigma: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    sigma = np.asarray(sigma)
    out = sigma * rng.standard_normal(sigma.shape)
    return (out + np.pi) % (2 * np.pi) - np.pi


# ---------------------------------------------------------------------------
# JAX on-device lookups
# ---------------------------------------------------------------------------


class _TorusJax(NamedTuple):
    score: jnp.ndarray
    score_norm: jnp.ndarray


@functools.lru_cache(maxsize=1)
def _jax_tables() -> _TorusJax:
    t = tables()
    # the unnormalized density table is only needed host-side; keep the
    # device footprint to the score table (+norms). ensure_compile_time_eval
    # escapes any enclosing trace so the cache never captures a tracer.
    with jax.ensure_compile_time_eval():
        return _TorusJax(
            score=jnp.asarray(t.score, dtype=jnp.float32),
            score_norm=jnp.asarray(t.score_norm, dtype=jnp.float32),
        )


def _sigma_index(sigma: jnp.ndarray) -> jnp.ndarray:
    ls = jnp.log(sigma / jnp.pi)
    idx = (ls - np.log(SIGMA_MIN)) / (np.log(SIGMA_MAX) - np.log(SIGMA_MIN)) * SIGMA_N
    return jnp.clip(jnp.round(idx), 0, SIGMA_N).astype(jnp.int32)


def score(x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Score of the wrapped normal at x (broadcasting sigma)."""
    t = _jax_tables()
    xw = jnp.mod(x + jnp.pi, 2 * jnp.pi) - jnp.pi
    sign = jnp.sign(xw)
    lx = jnp.log(jnp.maximum(jnp.abs(xw), 1e-30) / jnp.pi)
    xi = (lx - np.log(X_MIN)) / (0 - np.log(X_MIN)) * X_N
    xi = jnp.clip(jnp.round(xi), 0, X_N).astype(jnp.int32)
    si = jnp.broadcast_to(_sigma_index(sigma), xi.shape)
    # table rows are the score at +|x| (negative there); odd in x
    return sign * t.score[si, xi]


def score_norm(sigma: jnp.ndarray) -> jnp.ndarray:
    t = _jax_tables()
    return t.score_norm[_sigma_index(sigma)]


def sample(key: jax.Array, sigma: jnp.ndarray, shape=()) -> jnp.ndarray:
    out = sigma * jax.random.normal(key, shape)
    return jnp.mod(out + jnp.pi, 2 * jnp.pi) - jnp.pi
