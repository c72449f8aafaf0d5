"""A/B the explicit-H protonation model in the rigid relax.

Starting from the eval protocol's Vina-top-1 poses, runs the rigid
`vina.minimize` with the angular H-bond term twice per complex:

  A (cone)       — heavy-atom cone axes (round-3 --angular-hb behavior)
  B (explicit-H) — receptor donor axes from placed polar hydrogens with
                   rotamer optimization (--explicit-h; chem/protonate.py)

Referee (independent of both energy models): standard geometric H-bond
count with EXPLICIT hydrogens on both sides — receptor H's from
protonate.protein_polar_h (rotamers optimized against the relaxed
ligand's acceptors), ligand H's placed from the relaxed pose geometry;
bond if min_H |H..A| <= 2.6 A and angle(D-H..A) >= 120 deg.

Usage: python tools/relax_eh.py [outdir] [steps]
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
HA_MAX = 2.6
COS_DHA = -0.5  # angle(D-H..A) >= 120 deg


def _geom_hbonds(lig, lig_pos, pocket, mol):
    """Explicit-H geometric H-bond count, both directions."""
    from diffbindfr_tpu.chem import protonate as PT
    from diffbindfr_tpu.ops import vina

    rad, hyd, don, acc = vina._PTABLES
    aat = pocket.aatype
    pos14 = pocket.atom14_pos
    msk14 = pocket.atom14_mask > 0
    racc = (acc[aat] > 0) & msk14
    rdon = (don[aat] > 0) & msk14
    rpos = pos14.reshape(-1, 3)
    racc_pos = rpos[racc.reshape(-1)]

    na = lig.num_atoms
    lp = np.asarray(lig_pos)[:na]
    vlig = vina.build_ligand(lig, -(-na // 8) * 8, max(lig.num_torsions, 1))
    lacc = np.asarray(vlig.acceptor)[:na] > 0
    lacc_pos = lp[lacc]

    n = 0
    # receptor donors -> ligand acceptors
    ph_r = PT.protein_polar_h(aat, pos14, pocket.atom14_mask)
    if len(lacc_pos):
        ph_r = PT.optimize_rotatable(ph_r, np.concatenate(
            [lacc_pos, racc_pos]) if len(racc_pos) else lacc_pos)
    for h, parent in zip(ph_r.pos, ph_r.parent):
        if not len(lacc_pos):
            break
        dpos = rpos[parent]
        dv = np.linalg.norm(lacc_pos - h[None], axis=-1)
        j = int(np.argmin(dv))
        if dv[j] <= HA_MAX:
            u1 = (dpos - h) / (np.linalg.norm(dpos - h) + 1e-9)
            u2 = (lacc_pos[j] - h) / (dv[j] + 1e-9)
            if float(u1 @ u2) <= COS_DHA:
                n += 1
    # ligand donors -> receptor acceptors
    ph_l = PT.ligand_polar_h(mol.elements, lp, mol.bonds, mol.bond_orders,
                             mol.implicit_h)
    if len(racc_pos) and len(ph_l.pos):
        ph_l = PT.optimize_rotatable(ph_l, racc_pos)
    for h, parent in zip(ph_l.pos, ph_l.parent):
        if not len(racc_pos):
            break
        dpos = lp[parent]
        dv = np.linalg.norm(racc_pos - h[None], axis=-1)
        j = int(np.argmin(dv))
        if dv[j] <= HA_MAX:
            u1 = (dpos - h) / (np.linalg.norm(dpos - h) + 1e-9)
            u2 = (racc_pos[j] - h) / (dv[j] + 1e-9)
            if float(u1 @ u2) <= COS_DHA:
                n += 1
    return n


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "runs/relax_eh"
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
    relax = jax.jit(lambda lp, l, r: vina.minimize(
        lp, l, r, steps=steps, angular_hb=True))

    report = {}
    for row in rows:
        name = row["complex_name"]
        lig_raw = parse_ligand_file(row["lig_sdf"])[0]
        mol = perceive(lig_raw)
        lig = featurize_ligand(mol, lig_raw.name)
        ref_lig = featurize_ligand(perceive(
            parse_ligand_file(f"{PB}/{name}/{name}_ligand.sdf")[0]), name)
        prot = parse_pdb(row["prot_pdb"])
        pocket = build_pocket_record(prot, lig.pos, cutoff=8.0)
        na = lig.num_atoms
        pad_n = -(-na // 8) * 8
        pad_a = -(-int(pocket.atom14_mask.sum()) // 8) * 8
        vlig = vina.build_ligand(lig, pad_n, max(lig.num_torsions, 1))
        pos0 = jnp.asarray(
            np.pad(lig.pos - pocket.center, ((0, pad_n - na), (0, 0))),
            jnp.float32)
        lig_acc = np.asarray(vlig.acceptor)[:na] > 0
        opt_acc = (lig.pos - pocket.center)[lig_acc]
        rec_cone = vina.build_receptor(pocket, pad_a)
        rec_eh = vina.build_receptor(
            pocket, pad_a, explicit_polar_h=True, opt_acceptors=opt_acc)

        def lrmsd(pos):
            world = np.asarray(pos)[:na] + pocket.center[None, :]
            return ligand_rmsd(world, ref_lig.pos, lig.bonds, lig.elements)

        def referee(pos):
            # pocket frame throughout: pocket.atom14_pos is already
            # decentered and the ligand pos arg is pocket-frame
            return _geom_hbonds(lig, np.asarray(pos), pocket, mol)

        rec = {"before": {"l_rmsd": float(row["l_rmsd"]),
                          "hb_explicit": referee(pos0)}}
        for tag, r in (("cone", rec_cone), ("explicit_h", rec_eh)):
            pos, aff = relax(pos0, vlig, r)
            rec[tag] = {"l_rmsd": lrmsd(pos),
                        "hb_explicit": referee(pos),
                        "affinity": float(aff)}
        report[name] = rec
        print(f"[{name}] before hb={rec['before']['hb_explicit']}"
              f" lrmsd={rec['before']['l_rmsd']:.2f}"
              f" | cone: hb={rec['cone']['hb_explicit']}"
              f" lrmsd={rec['cone']['l_rmsd']:.2f}"
              f" | explicit_h: hb={rec['explicit_h']['hb_explicit']}"
              f" lrmsd={rec['explicit_h']['l_rmsd']:.2f}", flush=True)

    with open(os.path.join(outdir, "relax_eh.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    for t in ("before", "cone", "explicit_h"):
        tot = sum(r[t]["hb_explicit"] for r in report.values())
        mean = np.mean([r[t]["l_rmsd"] for r in report.values()])
        print(f"[{t}] total explicit-H H-bonds={tot} mean L-RMSD={mean:.2f}")


if __name__ == "__main__":
    main()
