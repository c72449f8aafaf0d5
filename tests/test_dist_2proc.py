"""2-process `jax.distributed` integration test (VERDICT r3 task 4).

Launches a real coordinator+worker CPU rendezvous on localhost and drives
init_distributed -> shard_jobs_for_host -> a tiny pjit train step over the
global 2-host mesh, checking the gradient allreduce merges both hosts'
shards. Reference analogue: druglib/core/runner/dist_utils.py:31-122.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_rendezvous(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    outs = [str(tmp_path / f"proc{p}.json") for p in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, str(p), "2", outs[p]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for p in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)

    res = [json.load(open(o)) for o in outs]
    assert res[0]["is_main"] and not res[1]["is_main"]
    assert all(r["n_global_devices"] == 4 for r in res)

    # job table sharding: contiguous, disjoint, covering
    assert res[0]["jobs"] == [f"job{i}" for i in range(5)]
    assert res[1]["jobs"] == [f"job{i}" for i in range(5, 10)]

    # both hosts computed the SAME global loss/grad (allreduce merged the
    # per-host batch shards) and they match the host-local recomputation
    for r in res:
        assert r["loss"] == pytest.approx(r["exp_loss"], rel=1e-5)
        np.testing.assert_allclose(r["grad"], r["exp_grad"], rtol=1e-5)
    assert res[0]["loss"] == res[1]["loss"]
    np.testing.assert_allclose(res[0]["w2"], res[1]["w2"], rtol=1e-6)

    # sharded 20-step-sampler contract (VERDICT r4 task 8, tiny steps):
    # the two hosts' merged per-host pose results cover disjoint global
    # row ranges and equal a single-process run of the same global batch
    nrep = res[0]["sampler_nrep"]
    stitched = np.zeros((nrep,) + np.asarray(
        res[0]["sampler_lig_pos"]).shape[1:], np.float32)
    seen = np.zeros(nrep, bool)
    for r in res:
        vals = np.asarray(r["sampler_lig_pos"], np.float32)
        rows_per_shard = vals.shape[0] // len(r["sampler_rows"])
        for j, start in enumerate(r["sampler_rows"]):
            sl = slice(start, start + rows_per_shard)
            assert not seen[sl].any(), "overlapping host shards"
            seen[sl] = True
            stitched[sl] = vals[j * rows_per_shard:(j + 1) * rows_per_shard]
    assert seen.all(), "hosts did not cover the global replica batch"

    expected = _single_process_sampler_expectation(nrep)
    # f32: sharded vs single-device compilations fuse/reassociate
    # differently (measured max dev ~5e-5 over 20 steps); anything beyond
    # 1e-3 would mean a real sharding bug, not layout noise
    np.testing.assert_allclose(stitched, expected, rtol=2e-4, atol=2e-4)


def _single_process_sampler_expectation(nrep: int) -> np.ndarray:
    """The same global sampler batch run single-process (virtual-mesh-free
    CPU): the per-replica RNG folds on the replica index, so pose results
    must not depend on how the batch was sharded across hosts."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from diffbindfr_tpu.data.sample import Buckets
    from diffbindfr_tpu.data.synthetic import synthetic_batch
    from diffbindfr_tpu.models import score_net as sn
    from diffbindfr_tpu.sampler import SamplerConfig, sample

    net_cfg = sn.ScoreNetConfig(ns=8, nv=4, num_conv_layers=2, dropout=0.0)
    scfg = SamplerConfig(inference_steps=4, actual_steps=2)
    buckets = Buckets(n_lig=12, n_lig_edges=28, n_tor=4, n_res=6, n_atm=32)
    batch = synthetic_batch(np.random.default_rng(7), nrep, buckets)
    params = sn.init_params(jax.random.PRNGKey(3), net_cfg)
    res = jax.jit(lambda p, b, k: sample(p, net_cfg, scfg, b, k))(
        params, batch, jax.random.PRNGKey(11))
    return np.asarray(res.lig_pos)
