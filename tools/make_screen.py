"""Generate the screen-scale ligand library used by the round-3 screens.

Expands the 15 reference example ligands into N distinct-geometry
conformer variants (DG-embedded via chem.embed, the ETKDG analogue) and
writes one SDF per variant plus a jobs CSV against the 3dbs receptor.
Usage: python tools/make_screen.py <outdir> [n_ligands=1200]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# host-side tool: must never touch the TPU (a concurrent attach can wedge
# an active training/screen claim — CLAUDE.md axon semantics)
jax.config.update("jax_platforms", "cpu")

from diffbindfr_tpu.chem.embed import embed_conformers
from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
from diffbindfr_tpu.chem.mol import perceive
from diffbindfr_tpu.io.sdf import parse_sdf, to_sdf_block

FWD = "/root/reference/examples/forward"


def main():
    outdir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    mols_dir = os.path.join(outdir, "mols")
    os.makedirs(mols_dir, exist_ok=True)
    import glob

    files = sorted(glob.glob(f"{FWD}/mols/*.sdf"))
    per = -(-n // len(files))
    crystal = f"{FWD}/3dbs_protein_crystal.sdf"
    rows = ["complex_name,protein,ligand,crystal_ligand"]
    made = 0
    for f in files:
        if made >= n:
            break
        raw = parse_sdf(f)[0]
        rec = featurize_ligand(perceive(raw), os.path.basename(f))
        k = min(per, n - made)
        confs = embed_conformers(rec, k,
                                 seed=hash(os.path.basename(f)) % 2**31)
        base = os.path.splitext(os.path.basename(f))[0]
        for c in range(k):
            name = f"{base}_v{c}"
            # heavy-atom record (featurize drops explicit hydrogens)
            raw2 = raw.__class__(
                name=name, elements=list(rec.elements),
                coords=np.asarray(confs[c], np.float32),
                bonds=np.asarray(rec.bonds),
                bond_orders=np.asarray(rec.bond_orders),
                formal_charges=np.asarray(rec.formal_charges), props={})
            p = os.path.join(mols_dir, f"{name}.sdf")
            with open(p, "w") as fh:
                fh.write(to_sdf_block(raw2))
            rows.append(f"{name},{FWD}/3dbs_protein.pdb,{p},{crystal}")
            made += 1
    csv_path = os.path.join(outdir, "jobs.csv")
    with open(csv_path, "w") as fh:
        fh.write("\n".join(rows) + "\n")
    print(f"{made} ligand variants -> {mols_dir}; jobs at {csv_path}")


if __name__ == "__main__":
    main()
