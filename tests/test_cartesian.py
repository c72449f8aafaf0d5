"""All-atom Cartesian fine-relax (ops/cartesian.py — the OpenMM relax
role, reference DiffBindFR/relax/pl.py:38-766) on the real 3dbs complex."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbindfr_tpu.app import validity as V
from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
from diffbindfr_tpu.chem.mol import perceive
from diffbindfr_tpu.chem.protein_feats import build_pocket_record
from diffbindfr_tpu.io.pdb import parse_pdb
from diffbindfr_tpu.io.sdf import parse_sdf
from diffbindfr_tpu.ops import cartesian as C
from diffbindfr_tpu.ops import vina

FWD = "/root/reference/examples/forward"


@pytest.fixture(scope="module")
def system():
    prot = parse_pdb(os.path.join(FWD, "3dbs_protein.pdb"))
    lig = featurize_ligand(
        perceive(parse_sdf(os.path.join(FWD, "3dbs_protein_crystal.sdf"))[0]),
        "3dbs")
    pocket = build_pocket_record(prot, lig.pos, cutoff=8.0)
    crystal = np.asarray(lig.pos - pocket.center, np.float32)
    cl = C.build_cartesian_ligand(lig, 64)
    vl = vina.build_ligand(lig, 64, 8)
    cr = C.build_cartesian_receptor(pocket, 512)
    a14 = jnp.asarray(pocket.atom14_pos, jnp.float32)
    return lig, pocket, crystal, cl, vl, cr, a14


def _pad(pos, n=64):
    return jnp.asarray(np.pad(pos, ((0, n - pos.shape[0]), (0, 0))),
                       jnp.float32)


def test_builder_shapes_and_masks(system):
    lig, pocket, crystal, cl, vl, cr, a14 = system
    na = lig.num_atoms
    nb = lig.bonds.shape[0]
    assert cl.bonds.shape == (128, 2)
    assert int(cl.bond_mask.sum()) == nb
    # reference lengths are real covalent lengths
    real = np.asarray(cl.ref_len)[: nb]
    assert np.all((real > 1.1) & (real < 1.9)), (real.min(), real.max())
    # angle cosines are in range and masked rows follow the count
    ng = int(cl.angle_mask.sum())
    assert ng > nb  # more angles than bonds for a branched molecule
    assert np.all(np.abs(np.asarray(cl.ref_cos)[:ng]) <= 1.0)
    # every planar quad crosses a double/aromatic bond
    nq = int(cl.quad_mask.sum())
    planar = {tuple(sorted(map(int, b)))
              for b, o in zip(lig.bonds, lig.bond_orders) if int(o) in (2, 4)}
    for q in np.asarray(cl.quads)[:nq]:
        assert tuple(sorted((int(q[1]), int(q[2])))) in planar
    # receptor gather map points at existing atoms only
    n_rec = int(cr.mask.sum())
    exists = pocket.atom14_mask.reshape(-1) > 0
    assert np.all(exists[np.asarray(cr.pack_idx)[:n_rec]])
    assert na == int(cl.mask.sum())


def test_relax_fixes_manufactured_failures(system):
    lig, pocket, crystal, cl, vl, cr, a14 = system
    na = lig.num_atoms
    rng = np.random.default_rng(0)
    # jitter wrecks bond lengths/angles/planarity; the shift adds protein
    # clash — the same failure classes the round-3 eval measured
    start = crystal + rng.normal(size=crystal.shape).astype(np.float32) * 0.35
    start += np.float32([0.5, -0.4, 0.3])
    c0 = V.check_pose(lig, pocket, start)
    assert not c0["pass"]  # the perturbation does break the checks

    pos, a14_new = jax.jit(lambda lp, a: C.cartesian_minimize(
        lp, a, cl, vl, cr, steps=300))(_pad(start), a14)
    pos = np.asarray(pos)[:na]
    pocket_new = dataclasses.replace(pocket, atom14_pos=np.asarray(a14_new))
    c1 = V.check_pose(lig, pocket_new, pos)
    assert c1["pass"], {k: v for k, v in c1.items() if not v}
    # the relax repairs geometry without re-docking
    move = np.sqrt(np.mean(np.sum((pos - start) ** 2, -1)))
    assert move < 1.5, move
    # receptor displacements stay in the restrained regime
    drec = np.asarray(a14_new) - np.asarray(a14)
    drec = drec[np.asarray(pocket.atom14_mask) > 0]
    assert np.abs(drec).max() < 1.0


def test_crystal_pose_stays_put(system):
    lig, pocket, crystal, cl, vl, cr, a14 = system
    na = lig.num_atoms
    pos, a14_new = jax.jit(lambda lp, a: C.cartesian_minimize(
        lp, a, cl, vl, cr, steps=200))(_pad(crystal), a14)
    pos = np.asarray(pos)[:na]
    move = np.sqrt(np.mean(np.sum((pos - crystal) ** 2, -1)))
    assert move < 0.35, move
    pocket_new = dataclasses.replace(pocket, atom14_pos=np.asarray(a14_new))
    assert V.check_pose(lig, pocket_new, pos)["pass"]


def test_batch_matches_single(system):
    lig, pocket, crystal, cl, vl, cr, a14 = system
    rng = np.random.default_rng(1)
    s1 = _pad(crystal + rng.normal(size=crystal.shape).astype(np.float32) * 0.2)
    s2 = _pad(crystal)
    lp = jnp.stack([s1, s2])
    a = jnp.stack([a14, a14])
    blk = jax.tree.map(lambda x: jnp.stack([x, x]), (cl, vl, cr))
    pos_b, a14_b = jax.jit(lambda p, aa: C.cartesian_minimize_batch(
        p, aa, *blk, steps=50))(lp, a)
    pos_s, a14_s = jax.jit(lambda p, aa: C.cartesian_minimize(
        p, aa, cl, vl, cr, steps=50))(s2, a14)
    np.testing.assert_allclose(
        np.asarray(pos_b[1]), np.asarray(pos_s), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(a14_b[1]), np.asarray(a14_s), atol=1e-4)


def test_padded_atoms_never_move(system):
    lig, pocket, crystal, cl, vl, cr, a14 = system
    na = lig.num_atoms
    pos, _ = jax.jit(lambda lp, a: C.cartesian_minimize(
        lp, a, cl, vl, cr, steps=20))(_pad(crystal), a14)
    np.testing.assert_array_equal(np.asarray(pos)[na:], 0.0)


def test_chirality_term_restores_inverted_center(system):
    """Reflect one pyramidal center through its neighbor plane (a pure
    stereo inversion, bond lengths to the 3 neighbors preserved) and check
    the signed-volume hinge pushes it back to the input-record side —
    the eval_r4_cart failure mode (tetrahedral_stereo 5 -> 40 poses
    before the term)."""
    lig, pocket, crystal, cl, vl, cr, a14 = system
    na = lig.num_atoms
    nc = int(cl.chiral_mask.sum())
    assert nc > 0
    q = np.asarray(cl.chiral)[0]
    s0 = float(np.asarray(cl.chiral_sign)[0])

    def vol(p):
        return float(np.dot(
            np.cross(p[q[1]] - p[q[0]], p[q[2]] - p[q[0]]),
            p[q[3]] - p[q[0]]))

    assert np.sign(vol(crystal)) == s0  # builder sign matches geometry
    start = np.array(crystal, np.float32)
    p1, p2, p3 = start[q[1]], start[q[2]], start[q[3]]
    n = np.cross(p2 - p1, p3 - p1)
    n /= np.linalg.norm(n)
    h = float(np.dot(start[q[0]] - p1, n))
    start[q[0]] -= 2.0 * h * n
    assert np.sign(vol(start)) == -s0

    pos, _ = jax.jit(lambda lp, a: C.cartesian_minimize(
        lp, a, cl, vl, cr, steps=300))(_pad(start), a14)
    pos = np.asarray(pos)[:na]
    assert np.sign(vol(pos)) == s0, vol(pos)
