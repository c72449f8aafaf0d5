"""Generate the pose-augmented MDN scorer training set (VERDICT r3 task 2).

A KarmaDock-class scorer must be trained to DISCRIMINATE pose quality, not
just model crystal contact statistics (reference scoring semantics:
DiffBindFR/scoring/architecture/KarmaDock_sc.py:88-102). This tool uses
the framework's own sampler as the decoy generator:

  * self-dock: for every training complex, -np poses from fresh DG
    conformers, EC-minimized, each labeled with its symmetric L-RMSD to
    the crystal — near-native positives + hard decoys from the production
    pose distribution (the exact distribution the scorer ranks at
    inference).
  * cross-dock: every training ligand docked into every OTHER training
    pocket — binding-site negatives for absolute calibration.

Output: <outdir>/<pocket>__<ligand>.npz per pair with the full
DockingSample (s_* keys), pose arrays (lig_pos [K,NL,3] pocket-frame,
atom14_pos [K,R,14,3]), l_rmsd [K] (NaN for cross-dock pairs), and the
crystal pose flag. Consumed by train_cli --model mdn --pose-dir.

Usage:
    python tools/make_scorer_poses.py <diffusion_ckpt> <outdir> \
        [np_self] [np_cross] [nc] [--train a,b,c]

Default training set holds out 2zec (the ranking protocol's held-out
complex); --train overrides the complex list for leave-one-out folds
(tools/loo_rotation.py).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffbindfr_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

PB = "/root/repo/runs/pb_bench"
TRAIN = ["2src", "3dbs", "3mhw", "3pp0"]  # 2zec held out


def main():
    global TRAIN
    argv = list(sys.argv[1:])
    if "--train" in argv:
        i = argv.index("--train")
        TRAIN = argv[i + 1].split(",")
        del argv[i : i + 2]
    ckpt, outdir = argv[0:2]
    np_self = int(argv[2]) if len(argv) > 2 else 32
    np_cross = int(argv[3]) if len(argv) > 3 else 8
    n_conf = int(argv[4]) if len(argv) > 4 else 8
    os.makedirs(outdir, exist_ok=True)

    from diffbindfr_tpu.app import pipeline as P
    from diffbindfr_tpu.app.export import pose_metrics
    from diffbindfr_tpu.app.jobs import Job
    from diffbindfr_tpu.models import score_net as sn
    from diffbindfr_tpu.sampler import SamplerConfig
    from diffbindfr_tpu.utils.checkpoint import (load_checkpoint,
                                                 resolve_checkpoint)

    jobs = []
    for pocket in TRAIN:
        for lig in TRAIN:
            jobs.append(Job(
                protein=f"{PB}/{pocket}/{pocket}_protein.pdb",
                protein_name=pocket,
                ligand=f"{PB}/{lig}/{lig}_ligand.sdf",
                ligand_name=lig,
                complex_name=f"{pocket}__{lig}",
                crystal_ligand=f"{PB}/{pocket}/{pocket}_ligand.sdf",
            ))
    prepared, failures = P.prep(
        jobs, pocket_radius=12.0,
        cache_dir=os.path.join(outdir, "prep_cache"), n_conformers=n_conf)
    print(f"[prep] {len(prepared)} pairs, {len(failures)} failed")
    for f in failures:
        print(f"  FAIL {f}")

    net_cfg = sn.ScoreNetConfig(dropout=0.0, use_pallas=True)
    scfg = SamplerConfig(inference_steps=22, actual_steps=20)
    params, step = load_checkpoint(resolve_checkpoint(ckpt), use_ema=True)
    print(f"[model] step {step}")

    self_pairs = [p for p in prepared
                  if p.job.protein_name == p.job.ligand_name]
    cross_pairs = [p for p in prepared
                   if p.job.protein_name != p.job.ligand_name]

    for pairs, npp, tag in ((self_pairs, np_self, "self"),
                            (cross_pairs, np_cross, "cross")):
        if not pairs:
            continue
        results = P.dock(pairs, params, net_cfg, scfg,
                         num_poses=npp, batch_size=16, seed=17)
        P.error_correct(pairs, results, steps=150, batch_size=16)
        by_pair: dict = {}
        for r in results:
            by_pair.setdefault(r.pair_idx, []).append(r)
        for pi, rs in by_pair.items():
            pr = pairs[pi]
            rs.sort(key=lambda r: r.pose_idx)
            lig_pos = np.stack([np.asarray(r.lig_pos) for r in rs])
            a14 = np.stack([np.asarray(r.atom14_pos) for r in rs])
            if tag == "self" and pr.crystal_pos is not None:
                rmsd = np.array([
                    pose_metrics(pr.lig, pr.pocket, r.lig_pos, r.atom14_pos,
                                 crystal_lig_pos=pr.crystal_pos).l_rmsd
                    for r in rs], np.float32)
            else:
                rmsd = np.full(len(rs), np.nan, np.float32)
            out = {f"s_{k}": v for k, v in pr.sample._asdict().items()}
            out.update(lig_pos=lig_pos.astype(np.float32),
                       atom14_pos=a14.astype(np.float32),
                       l_rmsd=rmsd,
                       is_self=np.array(tag == "self"))
            path = os.path.join(outdir, f"{pr.job.complex_name}.npz")
            np.savez(path, **out)
            good = int((rmsd <= 2.5).sum()) if tag == "self" else 0
            bad = int((rmsd >= 4.0).sum()) if tag == "self" else len(rs)
            print(f"[{tag}] {pr.job.complex_name}: {len(rs)} poses"
                  + (f", rmsd {np.nanmin(rmsd):.2f}-{np.nanmax(rmsd):.2f}"
                     f" ({good} good / {bad} bad)" if tag == "self" else ""),
                  flush=True)
    print(f"[done] -> {outdir}")


if __name__ == "__main__":
    main()
