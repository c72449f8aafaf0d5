"""pipeline.dock's multi-device mesh branch on the virtual 8-device mesh.

The e2e CLI tests drive dock at batch_size < device_count, which skips
the sharded branch (app/pipeline.py mesh path); this test exercises the
actual sharded sampler: batch_size = 8 replicas over 8 virtual CPU
devices (VERDICT round-2 weak #8 / task #5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbindfr_tpu.app import pipeline as P
from diffbindfr_tpu.data.sample import Buckets
from diffbindfr_tpu.data.synthetic import synthetic_batch
from diffbindfr_tpu.models import score_net as sn
from diffbindfr_tpu.sampler import SamplerConfig


class _Pair:
    """Minimal PreparedPair stand-in for dock()."""

    def __init__(self, sample, bucket):
        self.sample = sample
        self.bucket = bucket
        self.conformers = None


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_dock_mesh_branch_8_devices():
    assert jax.device_count() >= 8
    rng = np.random.default_rng(0)
    buckets = Buckets(n_lig=12, n_lig_edges=28, n_tor=4, n_res=6, n_atm=32)
    batch = synthetic_batch(rng, 2, buckets)
    # two distinct pairs sharing one bucket
    s0 = jax.tree.map(lambda x: np.asarray(x[0]), batch)
    s1 = jax.tree.map(lambda x: np.asarray(x[1]), batch)
    prepared = [_Pair(s0, buckets), _Pair(s1, buckets)]

    cfg = sn.ScoreNetConfig(ns=8, nv=4, num_conv_layers=2, dropout=0.0)
    scfg = SamplerConfig(inference_steps=4, actual_steps=2)
    params = sn.init_params(jax.random.PRNGKey(0), cfg)

    # 4 poses x 2 pairs = 8 replicas = one full sharded batch
    results = P.dock(prepared, params, cfg, scfg, num_poses=4,
                     batch_size=8, verbose=True)
    assert len(results) == 8
    assert {(r.pair_idx, r.pose_idx) for r in results} == {
        (i, p) for i in range(2) for p in range(4)
    }
    for r in results:
        assert np.isfinite(r.lig_pos).all()
        assert np.isfinite(r.atom14_pos).all()
    # replicas of the same pair from different devices diverge only by
    # their init noise — all must be in the pocket frame scale
    assert np.abs(np.stack([r.lig_pos for r in results])).max() < 1e3
