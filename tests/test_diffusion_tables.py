"""SO(3) and torus diffusion table numerics against analytic limits.

Small-sigma limits: the wrapped normal's score at |x| < pi approaches the
Gaussian score -x/sigma^2; its score norm approaches 1/sigma. The IGSO(3)
angle-marginal score norm approaches ~2/eps for small eps (DiffDock
convention). These catch sign and indexing errors in the table lookups.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffbindfr_tpu.geometry import so3, torus


def test_torus_score_sign_and_magnitude():
    for sigma in (0.1, 0.5):
        for x in (0.5, 1.0, -0.7):
            got = float(torus.score(jnp.asarray(x), jnp.asarray(sigma)))
            want = -x / sigma**2  # Gaussian limit, wraps negligible
            assert abs(got - want) / abs(want) < 0.05, (sigma, x, got, want)
    # odd function
    s = torus.score(jnp.array([0.3, -0.3]), jnp.asarray(0.2))
    np.testing.assert_allclose(np.asarray(s[0]), -np.asarray(s[1]), rtol=1e-5)


def test_torus_score_finite_everywhere():
    xs = jnp.linspace(-np.pi, np.pi, 201)
    for sigma in (0.0314, 0.1, 1.0, 3.14):
        s = torus.score(xs, jnp.asarray(sigma))
        assert bool(jnp.all(jnp.isfinite(s))), sigma
    sn = torus.score_norm(jnp.array([0.0314, 0.1, 1.0, 3.14]))
    assert bool(jnp.all(jnp.isfinite(sn)))
    # small-sigma limit: sqrt(E[score^2]) ~ 1/sigma
    got = float(jnp.sqrt(torus.score_norm(jnp.asarray(0.1))))
    assert abs(got - 10.0) / 10.0 < 0.1, got


def test_torus_np_jax_consistency():
    xs = np.linspace(-3, 3, 17)
    for sigma in (0.05, 0.7, 2.0):
        a = torus.score_np(xs, np.asarray(sigma))
        b = np.asarray(torus.score(jnp.asarray(xs), jnp.asarray(sigma)))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_so3_score_norm_limits():
    sn = so3.score_norm(jnp.array([0.05, 0.5, 1.5]))
    assert bool(jnp.all(jnp.isfinite(sn))) and bool(jnp.all(sn > 0))
    # small-eps scaling: score_norm ~ c/eps (reference normalization with
    # the extra 1/pi inside the sqrt; c ~ 0.69)
    a = float(so3.score_norm(jnp.asarray(0.03)))
    b = float(so3.score_norm(jnp.asarray(0.1)))
    assert abs((a / b) / (0.1 / 0.03) - 1.0) < 0.05, (a, b)
    assert a > b > float(so3.score_norm(jnp.asarray(0.5)))


def test_so3_score_vec_points_inward():
    """Score of IGSO3 pushes rotation vectors toward smaller angles."""
    eps = jnp.asarray(0.3)
    v = jnp.array([0.0, 0.0, 1.2])  # angle well beyond eps
    s = so3.score_vec(eps, v)
    assert float(s[2]) < 0  # radial score negative -> toward identity
    # equivariance: direction is radial
    np.testing.assert_allclose(np.asarray(s[:2]), 0.0, atol=1e-6)


def test_so3_sampling_matches_tables():
    key = jax.random.PRNGKey(0)
    eps = jnp.asarray(0.5)
    v = so3.sample_vec(key, eps, (4000,))
    ang = np.asarray(jnp.linalg.norm(v, axis=-1))
    assert (ang <= np.pi + 1e-6).all() and (ang >= 0).all()
    # compare mean angle against the table cdf expectation
    t = so3.tables()
    i = int(np.argmin(np.abs(t.eps_grid - 0.5)))
    pdf = np.gradient(t.cdf_vals[i])
    want = float((t.omegas * pdf).sum() / pdf.sum())
    got = float(ang.mean())
    assert abs(got - want) < 0.05, (got, want)
