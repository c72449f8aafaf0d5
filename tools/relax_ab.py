"""A/B the angular H-bond term in the joint flex relax (VERDICT r3 task 8).

Starting from the round-2 eval protocol's Vina-top-1 poses
(runs/eval_r2/results_vina_top1.csv), runs the joint ligand+side-chain
relax twice per complex — angular_hb=False (round-2 behavior) vs
angular_hb=True — and reports, for each arm: the symmetry-corrected
L-RMSD to the crystal ligand and the number of REALIZED directional
hydrogen bonds (donor/acceptor heavy-atom distance <= 3.5 A AND both
implicit-H cones within 60 deg of axis, the same axis model the energy
term uses: ops/vina.py _hb_dirs/_res_local_dirs).  The reference
counterpart is the explicit-proton force-field relax of
DiffBindFR/relax/pl.py:38-766; parity target is H-bond count >= the
distance-only arm at unchanged L-RMSD.

Usage: python tools/relax_ab.py [outdir] [steps]
"""
import csv
import json
import os
import sys

import numpy as np

from diffbindfr_tpu.utils import compile_cache

compile_cache.enable()

PB = "/root/repo/runs/pb_bench"
TOP1 = "/root/repo/runs/eval_r2/results_vina_top1.csv"
HB_DIST = 3.5
HB_COS = 0.5  # 60 deg cone for *counting* (tighter than the energy ramp)


def count_hbonds(lig_pos, vlig, pos14, frec, center):
    """Directional ligand<->receptor H-bond count (numpy, pocket frame)."""
    import jax.numpy as jnp

    from diffbindfr_tpu.ops import vina

    e_l, has_l = map(np.asarray, vina._hb_dirs(
        jnp.asarray(lig_pos), vlig.bond_adj))
    e_r, has_r = map(np.asarray, vina._res_local_dirs(
        jnp.asarray(pos14), frec.atom14_mask))
    lp = np.asarray(lig_pos)
    lm = np.asarray(vlig.mask) > 0
    ld, la = np.asarray(vlig.donor), np.asarray(vlig.acceptor)
    rp = np.asarray(pos14).reshape(-1, 3)
    rm = np.asarray(frec.atom14_mask).reshape(-1) > 0
    rd = np.asarray(frec.donor).reshape(-1)
    ra = np.asarray(frec.acceptor).reshape(-1)
    e_r, has_r = e_r.reshape(-1, 3), has_r.reshape(-1)

    d = np.linalg.norm(lp[:, None, :] - rp[None, :, :] + 1e-9, axis=-1)
    u = (rp[None, :, :] - lp[:, None, :]) / d[..., None]
    cl = np.sum(u * e_l[:, None, :], axis=-1)
    cr = np.sum(-u * e_r[None, :, :], axis=-1)
    # cone satisfied, or no defined axis at that end (terminal/free atom)
    ok_l = (cl >= HB_COS) | (has_l[:, None] < 0.5)
    ok_r = (cr >= HB_COS) | (has_r[None, :] < 0.5)
    comp = (ld[:, None] * ra[None, :] + la[:, None] * rd[None, :]) > 0.5
    pair = (
        (d <= HB_DIST) & comp & ok_l & ok_r
        & lm[:, None] & rm[None, :]
    )
    # distance-only count for reference
    pair_dist = (d <= HB_DIST) & comp & lm[:, None] & rm[None, :]
    return int(pair.sum()), int(pair_dist.sum())


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "runs/relax_ab"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    os.makedirs(outdir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
    from diffbindfr_tpu.chem.mol import perceive
    from diffbindfr_tpu.chem.protein_feats import build_pocket_record
    from diffbindfr_tpu.io.pdb import parse_pdb
    from diffbindfr_tpu.io.sdf import parse_ligand_file
    from diffbindfr_tpu.metrics.pose import ligand_rmsd
    from diffbindfr_tpu.ops import vina

    rows = list(csv.DictReader(open(TOP1)))
    relax_a = jax.jit(lambda lp, l, fr: vina.joint_minimize(
        lp, l, fr, steps=steps, angular_hb=False))
    relax_b = jax.jit(lambda lp, l, fr: vina.joint_minimize(
        lp, l, fr, steps=steps, angular_hb=True))

    report = {}
    for row in rows:
        name = row["complex_name"]
        lig_raw = parse_ligand_file(row["lig_sdf"])[0]
        lig = featurize_ligand(perceive(lig_raw), lig_raw.name)
        ref_lig = featurize_ligand(perceive(
            parse_ligand_file(f"{PB}/{name}/{name}_ligand.sdf")[0]), name)
        prot = parse_pdb(row["prot_pdb"])
        # radius 8.0 / steps 300 = the relax CLI defaults the round-2 demo used
        pocket = build_pocket_record(prot, lig.pos, cutoff=8.0)
        na = lig.num_atoms
        pad_n = -(-na // 8) * 8
        vlig = vina.build_ligand(lig, pad_n, max(lig.num_torsions, 1))
        pos0 = jnp.asarray(
            np.pad(lig.pos - pocket.center, ((0, pad_n - na), (0, 0))),
            jnp.float32)
        frec = vina.build_flex_receptor(pocket, -(-pocket.num_res // 8) * 8)
        pos14_0 = vina.flex_atom14(frec, jnp.zeros_like(frec.chi_mask))

        def lrmsd(pos):
            world = np.asarray(pos)[:na] + pocket.center[None, :]
            return ligand_rmsd(world, ref_lig.pos, lig.bonds, lig.elements)

        hb0, hb0d = count_hbonds(pos0, vlig, pos14_0, frec, pocket.center)
        rec = {"before": {"l_rmsd": float(row["l_rmsd"]),
                          "hb": hb0, "hb_dist_only": hb0d}}
        for tag, fn in (("dist_hb", relax_a), ("angular_hb", relax_b)):
            pos, pos14, aff = fn(pos0, vlig, frec)
            hb, hbd = count_hbonds(pos, vlig, pos14, frec, pocket.center)
            rec[tag] = {"l_rmsd": lrmsd(pos), "hb": hb,
                        "hb_dist_only": hbd, "affinity": float(aff)}
        report[name] = rec
        print(f"[{name}] before hb={hb0} lrmsd={rec['before']['l_rmsd']:.2f}"
              f" | dist_hb: hb={rec['dist_hb']['hb']}"
              f" lrmsd={rec['dist_hb']['l_rmsd']:.2f}"
              f" | angular_hb: hb={rec['angular_hb']['hb']}"
              f" lrmsd={rec['angular_hb']['l_rmsd']:.2f}")

    with open(os.path.join(outdir, "relax_ab.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    tot = {t: sum(r[t]["hb"] for r in report.values())
           for t in ("before", "dist_hb", "angular_hb")}
    print(f"[total directional H-bonds] before={tot['before']}"
          f" dist_hb={tot['dist_hb']} angular_hb={tot['angular_hb']}")


if __name__ == "__main__":
    main()
