"""Leave-one-out training rotation over the in-env complexes (VERDICT r5
task 4).

Every quality conclusion so far rests on ONE held-out complex (2zec). This
driver trains the full stack with each pb_bench complex held out in turn —
diffusion score net, sampler-generated scorer pose set, pose-discrimination
MDN — then evaluates the held-out complex with the fold's own checkpoints,
giving every complex a genuinely held-out oracle / top-1 measurement
(reference training role: druglib/core/trainer/base_trainer.py:65-192).

Selection policy inside a fold: FIXED final-step checkpoints (no
validation-based selection — the held-out complex must not pick its own
model). Stages are resumable per fold (a stage is skipped when its
artifact exists).

Run on the chip (hours — budget via the step args):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/loo_rotation.py \
      -o runs/loo [--diff-steps 3000] [--mdn-steps 1500] [--folds 2src,...]
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PB = os.path.join(ROOT, "runs", "pb_bench")
COMPLEXES = ["2src", "2zec", "3dbs", "3mhw", "3pp0"]
ENV = {**os.environ, "PYTHONPATH": f"{ROOT}:/root/.axon_site"}


def sh(cmd: list, log: str) -> None:
    t0 = time.time()
    print(f"[loo] $ {' '.join(cmd)} > {log}", flush=True)
    with open(log, "w") as fh:
        subprocess.run(cmd, env=ENV, stdout=fh, stderr=subprocess.STDOUT,
                       check=True, cwd=ROOT)
    print(f"[loo]   done in {time.time() - t0:.0f}s", flush=True)


def write_jobs_csv(path: str, names: list) -> None:
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["protein", "protein_name", "ligand", "ligand_name",
                    "complex_name", "crystal_ligand"])
        for n in names:
            prot = os.path.join(PB, n, f"{n}_protein_contact_chains.pdb")
            if not os.path.exists(prot):
                prot = os.path.join(PB, n, f"{n}_protein.pdb")
            lig = os.path.join(PB, n, f"{n}_ligand.sdf")
            w.writerow([prot, n, lig, f"{n}_lig", n, lig])


def run_fold(held: str, out: str, args) -> dict:
    os.makedirs(out, exist_ok=True)
    train_names = [c for c in COMPLEXES if c != held]
    train_csv = os.path.join(out, "train.csv")
    write_jobs_csv(train_csv, train_names)

    # 1) diffusion training (fixed final step, no val-based selection)
    diff_ckpt = os.path.join(out, "diff",
                             f"ckpt_{args.diff_steps:07d}.npz")
    if not os.path.exists(diff_ckpt):
        sh([sys.executable, "-m", "diffbindfr_tpu.app.train_cli",
            "-i", train_csv, "-o", os.path.join(out, "diff"),
            "--steps", str(args.diff_steps), "-bs", "8", "--lr", "1e-3",
            "--ckpt-every", str(args.diff_steps), "--log-every", "100",
            "--pallas"],
           os.path.join(out, "diff_train.log"))
    assert os.path.exists(diff_ckpt), diff_ckpt

    # 2) sampler-generated scorer pose set (held-out complex excluded)
    pose_dir = os.path.join(out, "scorer_poses")
    marker = [f for f in (os.listdir(pose_dir) if os.path.isdir(pose_dir)
                          else []) if f.endswith(".npz")]
    if len(marker) < len(train_names) ** 2:
        sh([sys.executable, "tools/make_scorer_poses.py", diff_ckpt,
            pose_dir, str(args.np_self), str(args.np_cross), "8",
            "--train", ",".join(train_names)],
           os.path.join(out, "scorer_poses.log"))

    # 3) MDN pose-discrimination training
    mdn_ckpt = os.path.join(out, "mdn",
                            f"mdn_ckpt_{args.mdn_steps:07d}.npz")
    if not os.path.exists(mdn_ckpt):
        sh([sys.executable, "-m", "diffbindfr_tpu.app.train_cli",
            "--model", "mdn", "--pose-dir", pose_dir,
            "-o", os.path.join(out, "mdn"),
            "--steps", str(args.mdn_steps), "-bs", "8", "--lr", "3e-4",
            "--ckpt-every", str(args.mdn_steps), "--log-every", "100"],
           os.path.join(out, "mdn_train.log"))
    assert os.path.exists(mdn_ckpt), mdn_ckpt

    # 4) held-out eval with the fold's checkpoints
    eval_dir = os.path.join(out, "eval")
    res_csv = os.path.join(eval_dir, "results.csv")
    if not os.path.exists(res_csv):
        idx = sorted(COMPLEXES).index(held)
        sh([sys.executable, "-m", "diffbindfr_tpu.app.eval_cli",
            "--lib", "pb", "-d", PB, "-o", eval_dir,
            "-ckt", diff_ckpt, "-mdn", mdn_ckpt,
            "-np", str(args.eval_np), "-bs", "16", "-st",
            str(args.eval_st), "-nc", "8", "--pallas", "--cart-relax",
            "--cluster-rank", "1.0",
            "-s", str(idx), "-e", str(idx + 1)],
           os.path.join(out, "eval.log"))

    # fold summary from results.csv
    rows = [r for r in csv.DictReader(open(res_csv))
            if r["complex_name"] == held]
    lr = [float(r["l_rmsd"]) for r in rows]
    nll = [float(r["mdn_nll"]) if r.get("mdn_nll") not in (None, "", "None")
           else 1e30 for r in rows]
    vina = [float(r["vina_score"]) if r.get("vina_score") not in
            (None, "", "None") else 1e30 for r in rows]
    sc = [float(r["sc_rmsd"]) for r in rows if r.get("sc_rmsd")]
    chi = [float(r["chi1_rate"]) for r in rows if r.get("chi1_rate")]
    top_nll = lr[nll.index(min(nll))]
    top_vina = lr[vina.index(min(vina))]
    top_cluster = None
    ccsv = os.path.join(eval_dir, "results_cluster_top1.csv")
    if os.path.exists(ccsv):
        crows = [r for r in csv.DictReader(open(ccsv))
                 if r["complex_name"] == held]
        if crows:
            top_cluster = round(float(crows[0]["l_rmsd"]), 3)
    return {
        "held_out": held,
        "poses": len(rows),
        "oracle_lrmsd": round(min(lr), 3),
        "top1_mdn_nll": round(top_nll, 3),
        "top1_cluster": top_cluster,
        "top1_vina": round(top_vina, 3),
        "best_sc_rmsd": round(min(sc), 3) if sc else None,
        "best_chi1_rate": round(max(chi), 3) if chi else None,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--outdir", default="runs/loo")
    ap.add_argument("--diff-steps", type=int, default=3000)
    ap.add_argument("--mdn-steps", type=int, default=1500)
    ap.add_argument("--np-self", type=int, default=24)
    ap.add_argument("--np-cross", type=int, default=4)
    ap.add_argument("--eval-np", type=int, default=40)
    ap.add_argument("--eval-st", type=int, default=14)
    ap.add_argument("--folds", help="comma list (default: all 5)")
    args = ap.parse_args(argv)

    folds = args.folds.split(",") if args.folds else COMPLEXES
    os.makedirs(args.outdir, exist_ok=True)
    table = []
    tpath = os.path.join(args.outdir, "fold_table.json")
    if os.path.exists(tpath):
        table = json.load(open(tpath))
    done = {t["held_out"] for t in table}
    for held in folds:
        if held in done:
            print(f"[loo] fold {held}: already in table, skip")
            continue
        print(f"[loo] ===== fold {held} (train on the other "
              f"{len(COMPLEXES) - 1}) =====", flush=True)
        entry = run_fold(held, os.path.join(args.outdir, held), args)
        table.append(entry)
        with open(tpath, "w") as fh:
            json.dump(table, fh, indent=1)
        print(f"[loo] fold {held}: {entry}", flush=True)
    print(json.dumps(table, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
