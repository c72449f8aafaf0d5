"""use_pallas=True score net matches the XLA path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from diffbindfr_tpu.models import score_net as sn
from test_score_net import random_sample

import pytest


MODES = {
    "cmt": {},  # transposed-layout kernels (default pallas_layout)
    "cmt_bwd": {"pallas_bwd": True},  # + hand-written backward kernels
    "three_kernel": {"pallas_layout": "rowmajor"},
    "epilogue": {"pallas_layout": "rowmajor", "fused_epilogue": True},
    "layer": {"pallas_layout": "rowmajor", "fused_layer": True},
}


@pytest.mark.parametrize("mode", list(MODES))
def test_pallas_apply_matches_xla(mode):
    rng = np.random.default_rng(5)
    s = jax.tree.map(jnp.asarray, random_sample(rng))
    base = dict(ns=8, nv=4, num_conv_layers=2, dropout=0.0)
    cfg_x = sn.ScoreNetConfig(**base)
    cfg_p = sn.ScoreNetConfig(**base, use_pallas=True, **MODES[mode])
    params = sn.init_params(jax.random.PRNGKey(0), cfg_x)
    t = jnp.asarray(0.5)
    sig = sn.Sigmas(*(jnp.asarray(v) for v in (1.2, 0.5, 1.0, 1.0)))
    out_x = sn.apply(params, cfg_x, s, t, sig)
    out_p = sn.apply(params, cfg_p, s, t, sig)
    # the pallas path drops the reference's duplicate bonded+radius message
    # only in the denominator treatment; outputs agree when no bonded pair
    # exceeds the radius cutoff (always true physically)
    np.testing.assert_allclose(np.asarray(out_p.tr), np.asarray(out_x.tr),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_p.rot), np.asarray(out_x.rot),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_p.tor), np.asarray(out_x.tor),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_p.sc_tor), np.asarray(out_x.sc_tor),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("mode", list(MODES))
def test_pallas_grads_match_xla(mode):
    """End-to-end custom-VJP check: grads of a scalar loss over the full
    score net (2 layers, remat on) agree between the fused-pallas path and
    the pure XLA path."""
    rng = np.random.default_rng(6)
    s = jax.tree.map(jnp.asarray, random_sample(rng))
    base = dict(ns=8, nv=4, num_conv_layers=2, dropout=0.0, remat=True)
    cfg_x = sn.ScoreNetConfig(**base)
    cfg_p = sn.ScoreNetConfig(**base, use_pallas=True, **MODES[mode])
    params = sn.init_params(jax.random.PRNGKey(0), cfg_x)
    t = jnp.asarray(0.5)
    sig = sn.Sigmas(*(jnp.asarray(v) for v in (1.2, 0.5, 1.0, 1.0)))

    def loss(p, cfg):
        out = sn.apply(p, cfg, s, t, sig)
        return (jnp.sum(out.tr ** 2) + jnp.sum(out.rot ** 2)
                + jnp.sum(out.tor ** 2) + jnp.sum(out.sc_tor ** 2))

    g_x = jax.grad(loss)(params, cfg_x)
    g_p = jax.grad(loss)(params, cfg_p)
    lx, lp = jax.tree.leaves(g_x), jax.tree.leaves(g_p)
    assert len(lx) == len(lp)
    for a, b in zip(lx, lp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4)
