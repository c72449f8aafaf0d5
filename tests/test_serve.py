"""Serving daemon: warm-engine docking over HTTP (app/serve.py).

In-process server on a random port, tiny score net, real 3dbs example
inputs. Exercises: prep-in-handler, dynamic batching of two concurrent
requests into one device round, EC + MDN stage toggles, inline SDF
payloads, pair cache reuse, /health, /shutdown-free stop().
"""
import json
import os
import threading
import urllib.request

import jax
import numpy as np
import pytest

from diffbindfr_tpu.app.serve import DockServer, DockService
from diffbindfr_tpu.models import mdn_scorer as mdn
from diffbindfr_tpu.models import score_net as sn
from diffbindfr_tpu.sampler import SamplerConfig

FWD = "/root/reference/examples/forward"


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = sn.ScoreNetConfig(ns=8, nv=4, num_conv_layers=2, dropout=0.0)
    scfg = SamplerConfig(inference_steps=4, actual_steps=2)
    params = sn.init_params(jax.random.PRNGKey(0), cfg)
    mdn_cfg = mdn.MDNConfig()
    mdn_params = mdn.init_params(jax.random.PRNGKey(1), mdn_cfg)
    svc = DockService(
        params, cfg, scfg, mdn_params=mdn_params, mdn_cfg=mdn_cfg,
        batch_size=4, ec_steps=5, pocket_radius=8.0,
        cache_dir=str(tmp_path_factory.mktemp("serve_cache")),
        max_wait_s=0.5, verbose=False)
    srv = DockServer(svc, port=0).start()
    yield srv
    srv.stop()


def _post(port, path, payload, timeout=1700):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_health(server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/health", timeout=30) as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok"


def test_dock_two_concurrent_requests_share_a_round(server, tmp_path):
    payload = {
        "protein": f"{FWD}/3dbs_protein.pdb",
        "ligand": f"{FWD}/mols/BDB12915.sdf",
        "num_poses": 2,
        "ec": True,
        "score": True,
    }
    out = {}

    def call(tag, p):
        out[tag] = _post(server.port, "/dock", p)

    t1 = threading.Thread(target=call, args=("a", payload))
    p2 = dict(payload, num_poses=1, ec=False, score=False)
    t2 = threading.Thread(target=call, args=("b", p2))
    t1.start(); t2.start(); t1.join(1200); t2.join(1200)

    st_a, body_a = out["a"]
    st_b, body_b = out["b"]
    assert st_a == 200 and st_b == 200, (body_a, body_b)
    assert len(body_a["poses"]) == 2
    assert len(body_b["poses"]) == 1
    # request a ran EC + MDN; request b skipped both
    for pose in body_a["poses"]:
        assert pose["vina_score"] is not None
        assert pose["mdn_score"] is not None
        assert "V2000" in pose["sdf"]
    assert body_b["poses"][0]["vina_score"] is None
    assert body_b["poses"][0]["mdn_score"] is None
    # poses sorted best-first by mdn score
    scores = [p["mdn_score"] for p in body_a["poses"]]
    assert scores == sorted(scores, reverse=True)
    # SDF coordinates are world-frame: the docked pose sits near the
    # 3dbs pocket (defined by the auto-discovered crystal ligand), not
    # at the decoy input file's origin-centered coordinates
    from diffbindfr_tpu.io.sdf import parse_sdf

    sdf_path = tmp_path / "pose.sdf"
    sdf_path.write_text(body_a["poses"][0]["sdf"])
    mol = parse_sdf(str(sdf_path))[0]
    crystal = parse_sdf(f"{FWD}/3dbs_protein_crystal.sdf")[0]
    decoy = parse_sdf(f"{FWD}/mols/BDB12915.sdf")[0]
    d_pocket = np.linalg.norm(mol.coords.mean(0) - crystal.coords.mean(0))
    d_input = np.linalg.norm(mol.coords.mean(0) - decoy.coords.mean(0))
    # (random weights + 2 steps => poses carry prior noise, so no tight
    # radius; but the world frame is the pocket's, not the input file's)
    assert d_pocket < d_input


def test_second_request_reuses_pair_and_engines(server):
    svc = server.service
    warm_before = svc.warm_buckets
    served_before = svc.requests_served
    payload = {
        "protein": f"{FWD}/3dbs_protein.pdb",
        "ligand": f"{FWD}/mols/BDB12915.sdf",
        "num_poses": 1, "ec": False, "score": False,
    }
    status, body = _post(server.port, "/dock", payload)
    assert status == 200
    assert svc.warm_buckets == warm_before  # no new compile
    assert svc.requests_served == served_before + 1
    assert len(svc._pair_cache) == 1  # same pair key reused


def test_bad_request_is_a_400(server):
    status, body = _post(server.port, "/dock",
                         {"protein": "/nonexistent.pdb",
                          "ligand": "/nonexistent.sdf"})
    assert status in (400, 500)
    assert "error" in body


def test_warmup_compiles_request_path(server):
    """warmup() runs the full request path on an example pair."""
    n = server.service.warmup(
        f"{FWD}/3dbs_protein.pdb", f"{FWD}/mols/ZINC04090693.sdf")
    assert n == 1
