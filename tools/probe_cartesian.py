"""Probe: does the Cartesian fine-relax fix validity failures on a real
complex without moving the pose?

Builds the 3dbs example, manufactures the failure modes the round-3 eval
measured (protein clash 54.5%, internal clash 87%, double-bond flatness
85% — runs/eval_r3_move/validity.csv) by perturbing the crystal pose, then
relaxes and re-runs the PoseBusters-style checks.

Usage: JAX_PLATFORMS=cpu python tools/probe_cartesian.py [steps]
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diffbindfr_tpu.app import validity as V  # noqa: E402
from diffbindfr_tpu.chem.ligand_feats import featurize_ligand  # noqa: E402
from diffbindfr_tpu.chem.mol import perceive  # noqa: E402
from diffbindfr_tpu.chem.protein_feats import build_pocket_record  # noqa: E402
from diffbindfr_tpu.io.pdb import parse_pdb  # noqa: E402
from diffbindfr_tpu.io.sdf import parse_sdf  # noqa: E402
from diffbindfr_tpu.ops import cartesian as C  # noqa: E402
from diffbindfr_tpu.ops import vina  # noqa: E402

PDB = "/root/reference/examples/forward/3dbs_protein.pdb"
SDF = "/root/reference/examples/forward/3dbs_protein_crystal.sdf"


def checks_line(tag, lig, pocket, pos):
    c = V.check_pose(lig, pocket, np.asarray(pos)[: lig.num_atoms])
    fails = [k for k, v in c.items() if not v and k != "pass"]
    print(f"{tag}: pass={c['pass']} fails={fails}")
    return c


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    prot = parse_pdb(PDB)
    lig = featurize_ligand(perceive(parse_sdf(SDF)[0]), "3dbs")
    pocket = build_pocket_record(prot, lig.pos, cutoff=8.0)
    na = lig.num_atoms
    crystal = np.asarray(lig.pos - pocket.center, np.float32)

    cl = C.build_cartesian_ligand(lig, 64)
    vl = vina.build_ligand(lig, 64, 8)
    cr = C.build_cartesian_receptor(pocket, 512)
    a14 = jnp.asarray(pocket.atom14_pos, jnp.float32)

    rng = np.random.default_rng(0)
    # manufacture failures: push the ligand 0.8 A toward the nearest
    # receptor atom region + per-atom jitter that wrecks planarity/clash
    start = crystal + rng.normal(size=crystal.shape).astype(np.float32) * 0.35
    start += np.float32([0.5, -0.4, 0.3])
    start_pad = jnp.asarray(
        np.pad(start, ((0, 64 - na), (0, 0))), jnp.float32)

    c0 = checks_line("start ", lig, pocket, start)

    run = jax.jit(lambda lp, a: C.cartesian_minimize(
        lp, a, cl, vl, cr, steps=steps))
    pos, a14_new = run(start_pad, a14)
    pos = np.asarray(pos)[:na]
    # validity vs the RELAXED receptor (what the exporter writes)
    import dataclasses

    pocket_new = dataclasses.replace(
        pocket, atom14_pos=np.asarray(a14_new)) if dataclasses.is_dataclass(
        pocket) else pocket._replace(atom14_pos=np.asarray(a14_new))
    c1 = checks_line("relaxed", lig, pocket_new, pos)

    move = np.sqrt(np.mean(np.sum((pos - start) ** 2, -1)))
    drec = np.asarray(a14_new) - np.asarray(a14)
    drec = drec[np.asarray(pocket.atom14_mask) > 0]
    print(f"lig RMSD(start->relaxed) = {move:.3f} A")
    print(f"rec max|d| = {np.abs(drec).max():.3f}  "
          f"mean|d| = {np.linalg.norm(drec, axis=-1).mean():.3f} A")
    d_rmsd = np.sqrt(np.mean(np.sum((pos - crystal) ** 2, -1)))
    d0 = np.sqrt(np.mean(np.sum((start - crystal) ** 2, -1)))
    print(f"RMSD to crystal: start {d0:.3f} -> relaxed {d_rmsd:.3f} A")


if __name__ == "__main__":
    main()
