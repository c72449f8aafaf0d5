"""Training: loss finiteness, gradient flow, step improvement, mesh sharding."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from diffbindfr_tpu import parallel, train
from diffbindfr_tpu.models import score_net as sn
from diffbindfr_tpu.sampler import SamplerConfig

from test_score_net import random_sample

CFG = sn.ScoreNetConfig(ns=8, nv=4, num_conv_layers=2, dropout=0.0)
SCFG = SamplerConfig()
TCFG = train.TrainConfig(lr=1e-3, warmup_steps=2, total_steps=100)


def _batch(n=2, seed=0):
    rng = np.random.default_rng(seed)
    samples = [jax.tree.map(jnp.asarray, random_sample(rng)) for _ in range(n)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *samples)


def test_loss_and_grads_finite():
    batch = _batch()
    params = sn.init_params(jax.random.PRNGKey(0), CFG)
    (loss, metrics), grads = jax.value_and_grad(train.loss_fn, has_aux=True)(
        params, CFG, SCFG, TCFG, batch, jax.random.PRNGKey(1)
    )
    assert bool(jnp.isfinite(loss))
    for k in ("tr_loss", "rot_loss", "tor_loss", "sc_loss"):
        assert bool(jnp.isfinite(metrics[k])), k
    gnorm = float(jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_train_step_reduces_loss():
    batch = _batch(n=4)
    state = train.init_state(jax.random.PRNGKey(0), CFG, TCFG)
    step = jax.jit(train.make_train_step(CFG, SCFG, TCFG))
    # fixed key: the loss on the same noise draw must go down over steps
    key = jax.random.PRNGKey(5)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    # EMA drifted from init but stays close to params
    d = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()) if a.size else 0.0,
        state.params, state.ema_params,
    )
    assert max(jax.tree.leaves(d)) > 0


def test_train_step_sharded_mesh():
    """Full train step under pjit on the virtual 8-device mesh."""
    mesh = parallel.make_mesh(jax.devices()[:8])
    batch = _batch(n=8)
    batch = parallel.shard_batch(mesh, batch)
    state = train.init_state(jax.random.PRNGKey(0), CFG, TCFG)
    state = parallel.replicate(mesh, state)
    step = jax.jit(
        train.make_train_step(CFG, SCFG, TCFG),
        in_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P("dp")),
            NamedSharding(mesh, P()),
        ),
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
    )
    key = parallel.replicate(mesh, jax.random.PRNGKey(2))
    state2, metrics = step(state, batch, key)
    state2, metrics = step(state2, batch, key)  # step 1 has warmup lr = 0
    assert bool(jnp.isfinite(metrics["loss"]))
    # params identical across devices (replicated) and changed from init
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(state2.params)[0]
    assert float(jnp.abs(p1 - p0).max()) > 0
