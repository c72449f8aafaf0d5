"""Backfill a poses.npz for a pre-save_poses eval/predict outdir.

Reads <outdir>/results.csv + the exported structures and rebuilds the
padded pose arrays against the ORIGINAL prep-cache pockets (so rescore
--poses scoring is bit-comparable to the original pipeline run, unlike
the generic -i path which re-derives the pocket from the pose). Needs the
outdir's prep_cache/ and the dataset args used for the run.

Usage:
    python tools/poses_from_results.py <outdir> <lib> <data_dir> [radius]
"""
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    outdir, lib, data_dir = sys.argv[1:4]
    radius = float(sys.argv[4]) if len(sys.argv) > 4 else 12.0

    from diffbindfr_tpu.app import pipeline as P
    from diffbindfr_tpu.app.eval_cli import make_jobs
    from diffbindfr_tpu.chem.protein_feats import atom37_to_atom14
    from diffbindfr_tpu.io.pdb import parse_pdb
    from diffbindfr_tpu.io.sdf import parse_ligand_file

    jobs = make_jobs(lib, data_dir,
                     cache_dir=os.path.join(outdir, "contact_chains"))
    prepared, failures = P.prep(
        jobs, pocket_radius=radius,
        cache_dir=os.path.join(outdir, "prep_cache"))
    assert not failures, failures
    by_name = {p.job.complex_name: (i, p) for i, p in enumerate(prepared)}

    rows = [r for r in csv.DictReader(
        open(os.path.join(outdir, "results.csv")))
        if r.get("lig_sdf") and r.get("prot_pdb")]
    results = []
    for r in rows:
        pi, pair = by_name[r["complex_name"]]
        b, pocket = pair.bucket, pair.pocket
        na, nr = pair.lig.num_atoms, pocket.num_res
        raw = parse_ligand_file(r["lig_sdf"])[0]
        lp = np.zeros((b.n_lig, 3), np.float32)
        lp[:na] = raw.coords - pocket.center
        p14, _ = atom37_to_atom14(parse_pdb(r["prot_pdb"]))
        a14 = np.zeros((b.n_res, 14, 3), np.float32)
        a14[:nr] = (p14[pocket.pocket_res_indices]
                    - pocket.center[None, None, :]
                    ) * pocket.atom14_mask[..., None]
        vina = r.get("vina_score")
        results.append(P.PoseResult(
            pair_idx=pi, pose_idx=int(r["pose"]), lig_pos=lp,
            atom14_pos=a14, chi=np.zeros(0, np.float32),
            vina_score=float(vina) if vina else None))
    path = P.save_poses(outdir, prepared, results)
    print(f"[backfill] {len(results)} poses -> {path}")


if __name__ == "__main__":
    main()
