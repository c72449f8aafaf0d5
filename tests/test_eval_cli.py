"""Benchmark eval driver: dataset job makers + protocol smoke.

Reference: DiffBindFR/evaluation/eval.py:237-276, file_utils.py.
"""
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

FWD = "/root/reference/examples/forward"
AF2 = "/root/reference/examples/AF2"


@pytest.fixture(scope="module")
def pb_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pb")
    for cid, prot, lig in [
        ("3dbs", f"{FWD}/3dbs_protein.pdb", f"{FWD}/3dbs_protein_crystal.sdf"),
        ("2zec", f"{AF2}/2zec.pdb", f"{AF2}/ligand.sdf"),
    ]:
        d = root / cid
        d.mkdir()
        shutil.copy(prot, d / f"{cid}_protein.pdb")
        shutil.copy(lig, d / f"{cid}_ligand.sdf")
    return str(root)


def test_make_jobs_pbtest_contact_chains(pb_root):
    from diffbindfr_tpu.app import eval_cli as E

    jobs = E.make_jobs_pbtest(pb_root)
    assert [j.complex_name for j in jobs] == ["2zec", "3dbs"]
    for j in jobs:
        assert j.protein.endswith("_protein_contact_chains.pdb")
        assert os.path.exists(j.protein)
        assert j.crystal_ligand == j.ligand

    # the extraction must keep every residue within 10 A of the ligand
    from diffbindfr_tpu.io.pdb import parse_pdb
    from diffbindfr_tpu.io.sdf import parse_sdf

    full = parse_pdb(os.path.join(pb_root, "2zec", "2zec_protein.pdb"))
    sub = parse_pdb(jobs[0].protein)
    lig = parse_sdf(jobs[0].ligand)[0]
    pos = full.atom_positions[full.atom_mask > 0]
    d = np.linalg.norm(pos[:, None] - lig.coords[None], axis=-1).min(1)
    n_near_full = int((d <= 10.0).sum())
    spos = sub.atom_positions[sub.atom_mask > 0]
    ds = np.linalg.norm(spos[:, None] - lig.coords[None], axis=-1).min(1)
    assert int((ds <= 10.0).sum()) == n_near_full


def test_make_jobs_pbtest_readonly_fallback(pb_root, tmp_path, monkeypatch):
    """When the dataset dir is not writable, the contact-chain PDB is
    cached in the eval outdir instead. (os.access is patched because the
    test runs as root, for whom chmod 555 is not binding.)"""
    from diffbindfr_tpu.app import eval_cli as E

    ro = tmp_path / "ro"
    shutil.copytree(pb_root, ro)
    for d in ro.iterdir():
        for f in d.glob("*_contact_chains.pdb"):
            f.unlink()
    real_access = os.access
    monkeypatch.setattr(
        E.os, "access",
        lambda p, m: False if str(p).startswith(str(ro)) else real_access(p, m),
    )
    cache = tmp_path / "cache"
    jobs = E.make_jobs_pbtest(str(ro), cache_dir=str(cache))
    assert all(str(cache) in j.protein for j in jobs)
    assert all(os.path.exists(j.protein) for j in jobs)


def test_make_jobs_tstest(tmp_path):
    from diffbindfr_tpu.app import eval_cli as E

    root = tmp_path / "ts"
    (root / "3dbs").mkdir(parents=True)
    shutil.copy(f"{FWD}/3dbs_protein.pdb", root / "3dbs" / "3dbs_fix.pdb")
    shutil.copy(f"{FWD}/3dbs_protein_crystal.sdf",
                root / "3dbs" / "3dbs_ligand.sdf")
    (root / "timesplit_test").write_text("3dbs\n")
    jobs = E.make_jobs_tstest(str(root))
    assert len(jobs) == 1
    assert jobs[0].protein.endswith("3dbs_fix.pdb")
    assert jobs[0].crystal_ligand.endswith("3dbs_ligand.sdf")


def test_make_jobs_cdtest(tmp_path):
    from diffbindfr_tpu.app import eval_cli as E

    root = tmp_path / "cd" / "crossdock-sub"
    (root / "pairA").mkdir(parents=True)
    shutil.copy(f"{FWD}/3dbs_protein.pdb", root / "pairA" / "protein.pdb")
    shutil.copy(f"{FWD}/3dbs_protein_crystal.sdf", root / "pairA" / "ligand.sdf")
    jobs = E.make_jobs_cdtest(str(tmp_path / "cd"), "crossdock-sub")
    assert len(jobs) == 1 and jobs[0].complex_name == "pairA"


@pytest.fixture(scope="module")
def eval_run(pb_root, tmp_path_factory):
    """Full protocol on one complex (dock -> EC -> MDN -> export); the
    outdir is shared by the protocol assertions and the rescore tests."""
    tmp = tmp_path_factory.mktemp("evalrun")
    out = str(tmp / "eval")
    train_out = str(tmp / "ckpt")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "diffbindfr_tpu.app.train_cli",
         "-l", f"{FWD}/3dbs_protein_crystal.sdf",
         "-p", f"{FWD}/3dbs_protein.pdb",
         "-o", train_out, "--steps", "2", "-bs", "1", "--ns", "8", "--nv", "4",
         "--layers", "1", "--dtype", "float32", "-dr", "8", "--cpu",
         "--log-every", "2", "--ckpt-every", "2"],
        capture_output=True, text=True, env=env, timeout=1500, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout + r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "diffbindfr_tpu.app.eval_cli",
         "--lib", "pb", "-d", pb_root, "-o", out,
         "-ckt", os.path.join(train_out, "ckpt_0000002.npz"),
         "-np", "1", "-bs", "1", "-st", "2", "-dr", "8",
         "--ns", "8", "--nv", "4", "--layers", "1", "--dtype", "float32",
         "--cpu", "--ec-steps", "5", "-e", "1"],
        capture_output=True, text=True, env=env, timeout=1500, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return out


def test_eval_protocol_end_to_end(eval_run):
    """Protocol artifacts: metrics, enrichment report, validity csv."""
    import csv

    out = eval_run
    with open(os.path.join(out, "results.csv")) as fh:
        rows = list(csv.DictReader(fh))
    assert rows and rows[0]["l_rmsd"] != ""
    assert os.path.exists(os.path.join(out, "metrics_report.txt"))
    with open(os.path.join(out, "validity.csv")) as fh:
        vrows = list(csv.DictReader(fh))
    assert vrows and "pass" in vrows[0]


@pytest.fixture(scope="module")
def tiny_mdn_ckpt(tmp_path_factory):
    import jax

    from diffbindfr_tpu.models import mdn_scorer as mdn
    from diffbindfr_tpu.utils.checkpoint import save_checkpoint

    path = str(tmp_path_factory.mktemp("mdn") / "mdn_ckpt.npz")
    params = mdn.init_params(jax.random.PRNGKey(7), mdn.MDNConfig())
    save_checkpoint(path, params, step=0)
    return path


def test_rescore_saved_poses(eval_run, pb_root, tiny_mdn_ckpt, tmp_path):
    """Fast path: rescore a previous run's poses.npz with a different MDN
    checkpoint, without re-docking (app/rescore_cli.py --poses)."""
    import csv

    assert os.path.exists(os.path.join(eval_run, "poses.npz"))
    out = str(tmp_path / "rescored")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "diffbindfr_tpu.app.rescore_cli",
         "--poses", eval_run, "--lib", "pb", "-d", pb_root, "-e", "1",
         "-dr", "8", "-mdn", tiny_mdn_ckpt, "-o", out, "--cpu",
         "--cluster-rank", "1.0"],
        capture_output=True, text=True, env=env, timeout=1500, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout + r.stderr
    with open(os.path.join(out, "results.csv")) as fh:
        rows = list(csv.DictReader(fh))
    assert rows and rows[0]["mdn_score"] not in ("", None)
    assert rows[0]["l_rmsd"] != ""  # crystal metrics survive the round-trip
    # no structures were (re)written
    assert rows[0]["lig_sdf"] == ""
    # --cluster-rank on the rescore surface writes the clustered top-1
    with open(os.path.join(out, "results_cluster_top1.csv")) as fh:
        crows = list(csv.DictReader(fh))
    assert len(crows) == 1 and crows[0]["l_rmsd"] != ""


def test_rescore_exported_structures(eval_run, tiny_mdn_ckpt, tmp_path):
    """Generic path: score poses given only exported structure files
    (poses docked by any program)."""
    import csv

    out = str(tmp_path / "rescored_csv")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "diffbindfr_tpu.app.rescore_cli",
         "-i", os.path.join(eval_run, "results.csv"),
         "-dr", "8", "-mdn", tiny_mdn_ckpt, "-o", out, "--cpu"],
        capture_output=True, text=True, env=env, timeout=1500, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout + r.stderr
    with open(os.path.join(out, "results.csv")) as fh:
        rows = list(csv.DictReader(fh))
    assert rows and rows[0]["mdn_score"] not in ("", None)
