"""Ranking-mode study over saved pose sets (round 5).

The LOO rotation showed the two pose scores fail in complementary ways:
fold-trained MDNs can prefer far-out poses the physics term would never
pick (3pp0: mdn_nll top-1 17.1 A where vina is at-oracle 1.6 A), while
vina alone is weak on the full-model pose sets (0/5 <= 2 A at 320 poses
where mdn_nll gets 2/5). This tool measures every candidate ranking mode
on every saved pose set so the shipped default is chosen on evidence:

  raw:        mdn_nll | vina | ranksum (sum of the two rank positions)
  clustered:  single-linkage at --cutoff A over symmetric pose RMSDs
              (app/cluster.py), representatives ranked by mean/best of
              the same three scores

Usage (CPU, seconds per run dir):
  PYTHONPATH=/root/repo python tools/rank_modes.py \
      runs/pose_budget runs/loo/2src/eval:2src ... [--cutoff 1.0]

A run-dir argument is `<dir>[:held]` — when `:held` is given only that
complex is scored (LOO folds). Each dir must hold poses.npz + prep_cache
+ results.csv (+ rescore_final/results.csv preferred for LOO folds).
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _num(v, d=1e30):
    return d if v in (None, "", "None") else float(v)


def load_run(run_dir: str, res_csv: str):
    """-> {complex: dict(lr[P], nll[P], vina[P], pos[P,A,3], bonds,
    elements)} with pose order joined on (complex, pose_idx)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from diffbindfr_tpu.app import pipeline as P
    from diffbindfr_tpu.app.eval_cli import make_jobs

    jobs = make_jobs("pb", os.path.join(ROOT, "runs", "pb_bench"),
                     cache_dir=os.path.join(run_dir, "contact_chains"))
    prepared, failures = P.prep(
        jobs, cache_dir=os.path.join(run_dir, "prep_cache"))
    assert not failures, failures
    results = P.load_poses(os.path.join(run_dir, "poses.npz"), prepared)

    rows = {}
    for r in csv.DictReader(open(res_csv)):
        rows[(r["complex_name"], int(r["pose"]))] = r

    out = {}
    for res in results:
        pair = prepared[res.pair_idx]
        nm = pair.job.complex_name
        row = rows.get((nm, res.pose_idx))
        if row is None:
            continue
        d = out.setdefault(nm, {"lr": [], "nll": [], "vina": [],
                                "pos": [],
                                "bonds": pair.lig.bonds,
                                "elements": pair.lig.elements,
                                "na": pair.lig.num_atoms})
        d["lr"].append(float(row["l_rmsd"]))
        d["nll"].append(_num(row.get("mdn_nll")))
        d["vina"].append(_num(row.get("vina_score")))
        d["pos"].append(np.asarray(res.lig_pos)[:pair.lig.num_atoms])
    for d in out.values():
        for k in ("lr", "nll", "vina"):
            d[k] = np.asarray(d[k])
        d["pos"] = np.stack(d["pos"])
    return out


def rank_positions(x: np.ndarray) -> np.ndarray:
    return np.argsort(np.argsort(x))


def study_complex(d: dict, cutoff: float) -> dict:
    from diffbindfr_tpu.app import cluster as CL

    lr = d["lr"]
    scores = {
        "nll": d["nll"],
        "vina": d["vina"],
        "ranksum": (rank_positions(d["nll"])
                    + rank_positions(d["vina"])).astype(np.float64),
    }
    res = {"oracle": float(lr.min())}
    for nm, s in scores.items():
        res[f"raw_{nm}"] = float(lr[int(np.argmin(s))])
    dmat = CL.pose_rmsd_matrix(d["pos"], d["bonds"], d["elements"])
    labels = CL.single_linkage(dmat, cutoff)
    for nm, s in scores.items():
        for mode in ("mean", "best"):
            order = CL.cluster_rank(labels, s, mode)
            res[f"cl_{nm}_{mode}"] = float(lr[int(order[0])])
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="<dir>[:held_complex]")
    ap.add_argument("--cutoff", type=float, default=1.0)
    ap.add_argument("-o", "--out", help="write the table as JSON")
    args = ap.parse_args(argv)

    table = {}
    for spec in args.runs:
        run_dir, _, held = spec.partition(":")
        res_csv = os.path.join(run_dir, "results.csv")
        # LOO folds: prefer the fixed-scorer rescore table
        alt = os.path.join(os.path.dirname(run_dir), "rescore_final",
                           "results.csv")
        if held and os.path.exists(alt):
            res_csv = alt
        data = load_run(run_dir, res_csv)
        for nm, d in sorted(data.items()):
            if held and nm != held:
                continue
            key = f"{spec}|{nm}" if not held else spec
            table[key] = study_complex(d, args.cutoff)
            print(key, json.dumps(
                {k: round(v, 3) for k, v in table[key].items()}),
                flush=True)

    modes = [k for k in next(iter(table.values())) if k != "oracle"]
    print("\nmode          <=2A    mean_top1")
    for m in ["oracle"] + modes:
        v = np.asarray([t[m] for t in table.values()])
        print(f"{m:<13s} {np.mean(v <= 2.0):.2f}    {v.mean():.3f}")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(table, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
