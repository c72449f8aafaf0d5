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
