"""Sampler: prior init statistics, full reverse-SDE scan, determinism."""
import jax
import jax.numpy as jnp
import numpy as np

from diffbindfr_tpu import sampler as sp
from diffbindfr_tpu.models import score_net as sn

from test_score_net import random_sample

CFG = sn.ScoreNetConfig(ns=8, nv=4, num_conv_layers=2, dropout=0.0)
SCFG = sp.SamplerConfig(inference_steps=5, actual_steps=4)


def _batch(n=2, seed=0):
    rng = np.random.default_rng(seed)
    samples = [jax.tree.map(jnp.asarray, random_sample(rng)) for _ in range(n)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *samples)


def test_init_pose_stats():
    rng = np.random.default_rng(1)
    s = jax.tree.map(jnp.asarray, random_sample(rng))
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    pos, chi, atm = jax.vmap(lambda k: sp.init_pose(k, s, SCFG))(keys)
    assert bool(jnp.all(jnp.isfinite(pos)))
    # centroids ~ N(0, 10 I): std across draws should be near 10
    w = s.lig_mask[:, None]
    cent = (pos * w).sum(1) / w.sum()
    std = float(jnp.std(cent))
    assert 6.0 < std < 14.0, std
    # masked chi entries keep their input values
    fixed = (s.chi_mask == 0)
    ref = s.torsion_angle[:, 1:]
    assert bool(jnp.all(jnp.where(fixed, chi[0] == ref, True)))
    # padded ligand atoms stay at origin
    assert bool(jnp.all(pos[:, s.lig_mask == 0] == 0.0))


def test_sample_runs_and_is_deterministic():
    batch = _batch()
    params = sn.init_params(jax.random.PRNGKey(0), CFG)
    run = jax.jit(
        lambda k: sp.sample(params, CFG, SCFG, batch, k)
    )
    r1 = run(jax.random.PRNGKey(42))
    r2 = run(jax.random.PRNGKey(42))
    r3 = run(jax.random.PRNGKey(7))
    assert r1.lig_pos.shape == batch.lig_pos.shape
    assert r1.atom14_pos.shape == batch.atom14_mask.shape + (3,)
    for leaf in (r1.lig_pos, r1.atom14_pos, r1.chi):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    np.testing.assert_array_equal(np.asarray(r1.lig_pos), np.asarray(r2.lig_pos))
    assert float(jnp.abs(r1.lig_pos - r3.lig_pos).max()) > 1e-3


def test_trajectory_shapes():
    batch = _batch()
    params = sn.init_params(jax.random.PRNGKey(0), CFG)
    res = sp.sample(
        params, CFG, SCFG, batch, jax.random.PRNGKey(0), keep_trajectory=True
    )
    assert res.lig_traj.shape == (SCFG.actual_steps,) + batch.lig_pos.shape
    assert res.atom14_traj.shape == (SCFG.actual_steps,) + batch.atom14_mask.shape + (3,)


def test_zero_score_identity():
    """With zeroed head parameters and no noise, the pose must not move."""
    batch = _batch()
    params = sn.init_params(jax.random.PRNGKey(0), CFG)
    # zero the magnitude/score heads -> all scores identically 0
    for name in ("tr_final", "rot_final", "tor_final", "sc_tor_final"):
        params[name] = jax.tree.map(jnp.zeros_like, params[name])
    scfg = sp.SamplerConfig(inference_steps=5, actual_steps=4, no_random=True)
    lig0, chi0, atm0 = jax.vmap(
        lambda k, s: sp.init_pose(k, s, scfg)
    )(jax.random.split(jax.random.PRNGKey(3), 2), batch)
    res = sp.sample(
        params, CFG, scfg, batch, jax.random.PRNGKey(0), init=(lig0, chi0, atm0)
    )
    np.testing.assert_allclose(
        np.asarray(res.lig_pos), np.asarray(lig0), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(res.chi), np.asarray(chi0), atol=1e-6)
