"""Vina-style scorer/minimizer on the real 3dbs example."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
from diffbindfr_tpu.chem.mol import perceive
from diffbindfr_tpu.chem.protein_feats import build_pocket_record
from diffbindfr_tpu.io.pdb import parse_pdb
from diffbindfr_tpu.io.sdf import parse_sdf
from diffbindfr_tpu.ops import vina

PDB = "/root/reference/examples/forward/3dbs_protein.pdb"
SDF = "/root/reference/examples/forward/3dbs_protein_crystal.sdf"


@pytest.fixture(scope="module")
def system():
    prot = parse_pdb(PDB)
    lig = featurize_ligand(perceive(parse_sdf(SDF)[0]), "3dbs")
    pocket = build_pocket_record(prot, lig.pos, cutoff=8.0)
    crystal = jnp.asarray(lig.pos - pocket.center, jnp.float32)
    npad = 64
    vlig = vina.build_ligand(lig, pad_atoms=npad, pad_tor=8)
    vrec = vina.build_receptor(pocket, pad_atoms=512)
    crystal = jnp.pad(crystal, ((0, npad - crystal.shape[0]), (0, 0)))
    return vlig, vrec, crystal


def test_crystal_pose_is_favorable(system):
    vlig, vrec, crystal = system
    aff = float(vina.affinity(crystal, vlig, vrec))
    assert np.isfinite(aff)
    # the crystal pose of a real complex must score clearly negative
    assert aff < -2.0, aff
    # a pose shifted out of the pocket scores ~0
    far = crystal + jnp.asarray([50.0, 0.0, 0.0]) * vlig.mask[:, None]
    aff_far = float(vina.affinity(far, vlig, vrec))
    assert abs(aff_far) < 0.5, aff_far
    # an overlapping (clashing) pose is worse than the crystal
    clash = crystal * jnp.asarray([[0.2, 0.2, 0.2]]) * vlig.mask[:, None]
    assert float(vina.affinity(clash, vlig, vrec)) > aff


def test_minimize_improves_perturbed_pose(system):
    vlig, vrec, crystal = system
    rng = np.random.default_rng(0)
    jitter = jnp.asarray(rng.normal(size=crystal.shape) * 0.8, jnp.float32)
    start = crystal + jitter * vlig.mask[:, None]
    e0 = float(vina.inter_energy(start, vlig, vrec) + vina.intra_energy(start, vlig))
    pos, aff = jax.jit(
        lambda p: vina.minimize(p, vlig, vrec, steps=120, lr=0.05)
    )(start)
    e1 = float(vina.inter_energy(pos, vlig, vrec) + vina.intra_energy(pos, vlig))
    assert e1 < e0, (e0, e1)
    assert np.isfinite(float(aff))
    # minimization is a LOCAL pose-space move: the ligand must not fly away
    # (single terminal atoms may swing farther through torsion moves)
    n = int(np.sum(np.asarray(vlig.mask)))
    rmsd = float(jnp.sqrt(jnp.mean(jnp.sum((pos[:n] - start[:n]) ** 2, -1))))
    assert rmsd < 3.5, rmsd
    # and the minimized pose must be clearly bound (negative affinity)
    assert float(aff) < -2.0, float(aff)


def test_minimize_batch(system):
    vlig, vrec, crystal = system
    batch = jax.tree.map(lambda x: jnp.stack([x, x]), (vlig, vrec, crystal))
    bl, br, bc = batch
    pos, aff = jax.jit(
        lambda c, l, r: vina.minimize_batch(c, l, r, steps=30)
    )(bc, bl, br)
    assert pos.shape == bc.shape
    np.testing.assert_allclose(np.asarray(aff[0]), np.asarray(aff[1]), rtol=1e-5)
