"""End-to-end CLI smoke: predict on the reference 3dbs example (tiny)."""
import csv
import os
import subprocess
import sys

FWD = "/root/reference/examples/forward"


def test_predict_cli_end_to_end(tmp_path):
    out = str(tmp_path / "run")
    cmd = [
        sys.executable, "-m", "diffbindfr_tpu.app.cli", "predict",
        "-p", f"{FWD}/3dbs_protein.pdb",
        "-l", f"{FWD}/mols/BDB12915.sdf",
        "-o", out, "-np", "2", "-bs", "2", "-st", "2", "-dr", "8",
        "--ec-steps", "10", "--cart-relax", "--cart-steps", "20",
        "--dtype", "float32", "--cpu",
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=1500, cwd="/root/repo")
    assert r.returncode == 0, r.stdout + r.stderr

    with open(os.path.join(out, "results.csv")) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 2
    for row in rows:
        assert os.path.exists(row["lig_sdf"])
        assert os.path.exists(row["prot_pdb"])
        assert row["mdn_score"] != ""
        assert row["vina_score"] != ""
    assert os.path.exists(os.path.join(out, "results_mdn_top1.csv"))
    assert os.path.exists(os.path.join(out, "results_vina_top1.csv"))
    # sdf parses back
    from diffbindfr_tpu.io.sdf import parse_sdf

    mols = parse_sdf(rows[0]["lig_sdf"])
    assert len(mols) == 1 and mols[0].num_atoms == 23

    # standalone validity CLI runs over the exported table (pb.py surface)
    r2 = subprocess.run(
        [sys.executable, "-m", "diffbindfr_tpu.app.validity",
         os.path.join(out, "results.csv")],
        capture_output=True, text=True, env=env, timeout=600,
        cwd="/root/repo",
    )
    assert r2.returncode == 0, r2.stdout + r2.stderr
    vpath = os.path.join(out, "validity.csv")
    assert os.path.exists(vpath)
    vrows = list(csv.DictReader(open(vpath)))
    assert len(vrows) == 2
    assert all(c in vrows[0] for c in
               ("bond_lengths", "protein_clash", "volume_overlap", "pass"))

    # standalone Cartesian relax CLI re-minimizes the exported poses in
    # place (the reference's standalone OpenMM relax surface, relax/pl.py)
    r3 = subprocess.run(
        [sys.executable, "-m", "diffbindfr_tpu.app.cli", "relax",
         "-i", os.path.join(out, "results.csv"),
         "--cartesian", "--steps", "20", "--cpu"],
        capture_output=True, text=True, env=env, timeout=900,
        cwd="/root/repo",
    )
    assert r3.returncode == 0, r3.stdout + r3.stderr
    stem = os.path.splitext(rows[0]["lig_sdf"])[0]
    assert os.path.exists(stem + "_relaxed.pdb")
    mols = parse_sdf(rows[0]["lig_sdf"])
    assert len(mols) == 1 and mols[0].num_atoms == 23


def test_train_cli_validation_loop(tmp_path):
    """Held-out validation: val DSM loss (raw + EMA) and small-N sampling
    L-RMSD must appear in the JSONL metrics (EvalHook analogue)."""
    import json

    out = str(tmp_path / "train")
    cmd = [
        sys.executable, "-m", "diffbindfr_tpu.app.train_cli",
        "-l", f"{FWD}/3dbs_protein_crystal.sdf", f"{FWD}/mols/BDB12915.sdf",
        "-p", f"{FWD}/3dbs_protein.pdb",
        "-o", out, "--steps", "2", "-bs", "2", "--ns", "8", "--nv", "4",
        "--layers", "2", "--dtype", "float32", "-dr", "8", "--cpu",
        "--holdout", "BDB12915", "--val-every", "2", "--val-batches", "1",
        "--val-poses", "2", "--log-every", "2", "--ckpt-every", "2",
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=1500, cwd="/root/repo")
    assert r.returncode == 0, r.stdout + r.stderr

    recs = [json.loads(l) for l in open(os.path.join(out, "train_log.jsonl"))]
    val = [rec for rec in recs if "val_loss" in rec]
    assert val, recs
    for k in ("val_loss", "val_ema_loss", "val_best_lrmsd_mean",
              "val_best_lrmsd_lt2"):
        assert k in val[-1] and val[-1][k] == val[-1][k]  # present, not NaN

    # checkpoint-selection policy: with --val-poses on, ckpt_best.npz is
    # selected on the sampling eval (not the DSM proxy)
    assert os.path.exists(os.path.join(out, "ckpt_best.npz"))
    assert "new best val_best_lrmsd_mean" in r.stdout
