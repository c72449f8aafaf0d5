"""5x5 cross-dock matrix over the in-environment complexes.

Docks every ligand into every pocket (pocket defined by the POCKET's own
crystal ligand), -np poses each with fresh DG conformers, EC + MDN, and
reports per-pocket ligand ranking under each scoring mode — the closest
in-environment proxy for target-selectivity generalization the 5-complex
data permits (VERDICT round-3 task #6).

Usage: python tools/crossdock5.py <ckpt> <mdn_ckpt> <outdir> [np] [nc]
"""
import json
import os
import sys

import numpy as np

from diffbindfr_tpu.utils import compile_cache

compile_cache.enable()

PB = "/root/repo/runs/pb_bench"
NAMES = ["2src", "2zec", "3dbs", "3mhw", "3pp0"]


def main():
    ckpt, mdn_ckpt, outdir = sys.argv[1:4]
    num_poses = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    n_conf = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    os.makedirs(outdir, exist_ok=True)

    import jax

    from diffbindfr_tpu.app import pipeline as P
    from diffbindfr_tpu.app.jobs import Job
    from diffbindfr_tpu.models import mdn_scorer as mdn
    from diffbindfr_tpu.models import score_net as sn
    from diffbindfr_tpu.sampler import SamplerConfig
    from diffbindfr_tpu.utils.checkpoint import load_checkpoint
    from diffbindfr_tpu.app.eval_cli import resolve_checkpoint

    jobs = []
    for pocket in NAMES:
        for lig in NAMES:
            jobs.append(Job(
                protein=f"{PB}/{pocket}/{pocket}_protein.pdb",
                protein_name=pocket,
                ligand=f"{PB}/{lig}/{lig}_ligand.sdf",
                ligand_name=lig,
                complex_name=f"{pocket}__{lig}",
                crystal_ligand=f"{PB}/{pocket}/{pocket}_ligand.sdf",
            ))
    prepared, failures = P.prep(
        jobs, pocket_radius=12.0, num_workers=4,
        cache_dir=os.path.join(outdir, "prep_cache"),
        n_conformers=n_conf)
    print(f"[prep] {len(prepared)} pairs, {len(failures)} failed")
    for f in failures:
        print(f"  FAIL {f}")

    net_cfg = sn.ScoreNetConfig(dropout=0.0, use_pallas=True)
    scfg = SamplerConfig()
    params, step = load_checkpoint(resolve_checkpoint(ckpt), use_ema=True)
    print(f"[model] step {step}")
    mdn_cfg = mdn.MDNConfig()
    mdn_params, _ = load_checkpoint(resolve_checkpoint(mdn_ckpt),
                                    use_ema=True)

    results = P.dock(prepared, params, net_cfg, scfg,
                     num_poses=num_poses, batch_size=16)
    P.error_correct(prepared, results, steps=150, batch_size=16)
    P.score_mdn(prepared, results, mdn_params, mdn_cfg, batch_size=16)
    P.export_and_rank(prepared, results, outdir,
                      export_structures=False, compute_metrics=False)

    # ---- 5x5 best-score matrices + per-pocket native-ligand rank
    best = {}
    for r in results:
        pr = prepared[r.pair_idx]
        pocket, lig = pr.job.complex_name.split("__")
        cur = best.setdefault((pocket, lig),
                              {"mdn": -1e30, "nll": 1e30, "vina": 1e30})
        if r.mdn_score is not None and r.mdn_score > cur["mdn"]:
            cur["mdn"] = r.mdn_score
        if r.mdn_nll is not None and r.mdn_nll < cur["nll"]:
            cur["nll"] = r.mdn_nll
        if r.vina_score is not None and r.vina_score < cur["vina"]:
            cur["vina"] = r.vina_score

    report = []
    for mode, sign in (("mdn", -1), ("nll", 1), ("vina", 1)):
        report.append(f"\n[{mode}] best-pose score matrix "
                      "(rows = pockets, cols = ligands)")
        report.append("pocket  " + "".join(f"{n:>10}" for n in NAMES)
                      + "   native_rank")
        ranks = []
        for pocket in NAMES:
            vals = [best.get((pocket, lig), {}).get(
                mode, 1e30 * sign) for lig in NAMES]
            order = sorted(range(5), key=lambda i: sign * vals[i])
            rank = order.index(NAMES.index(pocket)) + 1
            ranks.append(rank)
            report.append(
                f"{pocket:>6}  "
                + "".join(f"{v:10.2f}" for v in vals)
                + f"   {rank}"
            )
        report.append(f"[{mode}] native ligand top-1: "
                      f"{sum(r == 1 for r in ranks)}/5, "
                      f"mean rank {np.mean(ranks):.2f}")
    text = "\n".join(report)
    print(text)
    with open(os.path.join(outdir, "crossdock_report.txt"), "w") as fh:
        fh.write(text + "\n")
    with open(os.path.join(outdir, "crossdock_best.json"), "w") as fh:
        json.dump({f"{p}__{l}": v for (p, l), v in best.items()}, fh,
                  indent=1)


if __name__ == "__main__":
    main()
