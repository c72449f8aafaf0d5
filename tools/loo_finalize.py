"""Finalize the leave-one-out fold table with the FIXED MDN scorer.

The 2src/2zec/3dbs fold evals ran before the contact-free-pose ranking fix
(mean_nll on an empty <5 A support scored 0.0 and beat every real pose —
see ROUND5_NOTES section 6a and tests/test_mdn_scorer.py); 3mhw/3pp0 ran
after it. This tool rescans EVERY fold uniformly: it rescores the saved
pose arrays (rescore_cli fast path, CPU) with the fold's own MDN under the
fixed scorer, including cluster ranking over the rescored scores, and
rebuilds `fold_table_final.json` from the rescored tables. L-RMSD /
side-chain metrics are recomputed by the rescore export from the same
poses, so oracle columns must reproduce the original eval exactly — a
mismatch would flag a metric regression.

  PYTHONPATH=/root/repo python tools/loo_finalize.py [-o runs/loo]
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

COMPLEXES = ["2src", "2zec", "3dbs", "3mhw", "3pp0"]
ENV = {**os.environ, "PYTHONPATH": f"{ROOT}:/root/.axon_site"}


def _num(v, default):
    return default if v in (None, "", "None") else float(v)


def summarize(held: str, res_csv: str, cluster_csv: str) -> dict:
    rows = [r for r in csv.DictReader(open(res_csv))
            if r["complex_name"] == held]
    lr = [float(r["l_rmsd"]) for r in rows]
    nll = [_num(r.get("mdn_nll"), 1e30) for r in rows]
    vina = [_num(r.get("vina_score"), 1e30) for r in rows]
    sc = [float(r["sc_rmsd"]) for r in rows if r.get("sc_rmsd")]
    chi = [float(r["chi1_rate"]) for r in rows if r.get("chi1_rate")]
    top_cluster = None
    if os.path.exists(cluster_csv):
        crows = [r for r in csv.DictReader(open(cluster_csv))
                 if r["complex_name"] == held]
        if crows:
            top_cluster = round(float(crows[0]["l_rmsd"]), 3)
    return {
        "held_out": held,
        "poses": len(rows),
        "oracle_lrmsd": round(min(lr), 3),
        "top1_mdn_nll": round(lr[nll.index(min(nll))], 3),
        "top1_cluster": top_cluster,
        "top1_vina": round(lr[vina.index(min(vina))], 3),
        "best_sc_rmsd": round(min(sc), 3) if sc else None,
        "best_chi1_rate": round(max(chi), 3) if chi else None,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--outdir", default="runs/loo")
    ap.add_argument("--mdn-steps", type=int, default=1500)
    ap.add_argument("--cluster-rank", type=float, default=1.0)
    args = ap.parse_args(argv)

    table = []
    for held in COMPLEXES:
        fold = os.path.join(args.outdir, held)
        eval_dir = os.path.join(fold, "eval")
        out = os.path.join(fold, "rescore_final")
        res_csv = os.path.join(out, "results.csv")
        if not os.path.exists(res_csv):
            idx = sorted(COMPLEXES).index(held)
            cmd = [sys.executable, "-m", "diffbindfr_tpu.app.rescore_cli",
                   "-mdn", os.path.join(
                       fold, "mdn", f"mdn_ckpt_{args.mdn_steps:07d}.npz"),
                   "-o", out, "--poses", eval_dir,
                   "--lib", "pb", "-d", os.path.join(ROOT, "runs",
                                                     "pb_bench"),
                   "-s", str(idx), "-e", str(idx + 1),
                   "--cluster-rank", str(args.cluster_rank), "--cpu"]
            t0 = time.time()
            print(f"[finalize] $ {' '.join(cmd)}", flush=True)
            with open(os.path.join(fold, "rescore_final.log"), "w") as fh:
                subprocess.run(cmd, env=ENV, stdout=fh,
                               stderr=subprocess.STDOUT, check=True,
                               cwd=ROOT)
            print(f"[finalize]   done in {time.time() - t0:.0f}s",
                  flush=True)
        entry = summarize(
            held, res_csv, os.path.join(out, "results_cluster_top1.csv"))
        # cross-check: the rescore recomputes L-RMSD from the same poses;
        # the oracle must reproduce the original eval
        orig = os.path.join(eval_dir, "results.csv")
        if os.path.exists(orig):
            olr = min(float(r["l_rmsd"])
                      for r in csv.DictReader(open(orig))
                      if r["complex_name"] == held)
            if abs(olr - entry["oracle_lrmsd"]) > 5e-3:
                print(f"[finalize] WARNING {held}: oracle mismatch "
                      f"{olr:.3f} vs {entry['oracle_lrmsd']:.3f}")
        table.append(entry)
        print(f"[finalize] fold {held}: {entry}", flush=True)

    tpath = os.path.join(args.outdir, "fold_table_final.json")
    with open(tpath, "w") as fh:
        json.dump(table, fh, indent=1)
    print(json.dumps(table, indent=1))
    print(f"[finalize] -> {tpath}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
