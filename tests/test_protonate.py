"""Explicit polar-hydrogen placement (chem/protonate.py)."""
import os

import numpy as np
import pytest

from diffbindfr_tpu.chem import protonate as PT
from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
from diffbindfr_tpu.chem.mol import perceive
from diffbindfr_tpu.chem.protein_feats import build_pocket_record
from diffbindfr_tpu.constants import residues as rc
from diffbindfr_tpu.io.pdb import parse_pdb
from diffbindfr_tpu.io.sdf import parse_sdf

FWD = "/root/reference/examples/forward"


@pytest.fixture(scope="module")
def pocket():
    prot = parse_pdb(os.path.join(FWD, "3dbs_protein.pdb"))
    raw = parse_sdf(os.path.join(FWD, "3dbs_protein_crystal.sdf"))[0]
    lig = featurize_ligand(perceive(raw), "3dbs")
    pk = build_pocket_record(prot, lig.pos, cutoff=8.0)
    return pk, lig, raw


def test_protein_backbone_amide_geometry(pocket):
    pk, _, _ = pocket
    ph = PT.protein_polar_h(pk.aatype, pk.atom14_pos, pk.atom14_mask)
    assert ph.pos.shape[0] > 0
    pos14 = pk.atom14_pos.reshape(-1, 3)
    # every H sits ~1 bond length from its parent
    d = np.linalg.norm(ph.pos - pos14[ph.parent], axis=-1)
    assert (d > 0.9).all() and (d < 1.4).all()
    # backbone amide H's: in the C_prev-N-CA plane, away from both
    bb = [k for k, p in enumerate(ph.parent) if p % 14 == 0]
    assert len(bb) > 5
    checked = 0
    for k in bb:
        r = ph.parent[k] // 14
        if r == 0 or pk.atom14_mask[r - 1, 2] == 0:
            continue
        n, ca, cp = (pk.atom14_pos[r, 0], pk.atom14_pos[r, 1],
                     pk.atom14_pos[r - 1, 2])
        if np.linalg.norm(cp - n) > 2.0:
            continue
        h = ph.pos[k]
        nrm = np.cross(ca - n, cp - n)
        nrm = nrm / np.linalg.norm(nrm)
        # coplanar
        assert abs(np.dot(h - n, nrm)) < 0.15
        # trans to both heavy neighbors
        u = (h - n) / np.linalg.norm(h - n)
        assert np.dot(u, (ca - n) / np.linalg.norm(ca - n)) < -0.2
        assert np.dot(u, (cp - n) / np.linalg.norm(cp - n)) < -0.2
        checked += 1
    assert checked >= 3


def test_protein_rotatable_groups_and_counts(pocket):
    pk, _, _ = pocket
    ph = PT.protein_polar_h(pk.aatype, pk.atom14_pos, pk.atom14_mask)
    res3 = [rc.restype_1to3.get(rc.restypes_with_x[a], "UNK")
            for a in pk.aatype[: pk.num_res]]
    n_rot_expected = sum(
        1 for r3 in res3 if r3 in ("SER", "THR", "TYR", "CYS", "LYS"))
    # rot groups only for residues whose donor atoms exist in the pocket
    assert 0 < len(ph.rot_groups) <= n_rot_expected
    for rows, ax_o, ax_d in ph.rot_groups:
        assert abs(np.linalg.norm(ax_d) - 1.0) < 1e-6
        # Lys NH3 groups have 3 H's with ~109.5 deg H-N-H angles
        if len(rows) == 3:
            hs = ph.pos[rows] - ax_o
            hs = hs / np.linalg.norm(hs, axis=-1, keepdims=True)
            for i in range(3):
                c = np.dot(hs[i], hs[(i + 1) % 3])
                assert abs(np.degrees(np.arccos(c)) - 109.5) < 12.0


def test_hydroxyl_rotamer_optimization_points_at_acceptor():
    # Ser-like fragment: CB-OG with an acceptor off-axis
    og = np.array([0.0, 0.0, 0.0])
    cb = np.array([1.43, 0.0, 0.0])
    ca = np.array([2.0, 1.2, 0.3])
    acc = np.array([-0.8, 1.6, 0.9])
    hs, ax_o, ax_d = PT._tetra_h(og, cb, ca, PT.OH_LEN, 1)
    ph = PT.PolarHydrogens(
        pos=np.asarray(hs, np.float32), parent=np.zeros(1, np.int32),
        rot_groups=[([0], ax_o, ax_d)])
    opt = PT.optimize_rotatable(ph, acc[None])
    u = (opt.pos[0] - og) / np.linalg.norm(opt.pos[0] - og)
    v = (acc - og) / np.linalg.norm(acc - og)
    # optimized O-H points toward the acceptor as well as the 109.5 deg
    # tilt cone allows (the acceptor sits ~60 deg off the O-CB axis)
    assert np.dot(u, v) > 0.8
    # and the O-H length is preserved
    assert abs(np.linalg.norm(opt.pos[0] - og) - PT.OH_LEN) < 1e-5
    # the unoptimized rotamer was worse or equal
    u0 = (hs[0] - og) / np.linalg.norm(hs[0] - og)
    assert np.dot(u, v) >= np.dot(u0, v) - 1e-9


def test_ligand_polar_h_covers_donors(pocket):
    _, lig, raw = pocket
    mol = perceive(raw)
    ph = PT.ligand_polar_h(mol.elements, mol.coords, mol.bonds,
                           mol.bond_orders, mol.implicit_h)
    from diffbindfr_tpu.constants import ligands as lc

    don = lig.node_feat[:, -lc.num_pharmacophores +
                        lc.pharmacophore_to_id["Donor"]]
    donors = set(np.nonzero(don > 0)[0].tolist())
    covered = set(ph.parent.tolist())
    # every pharmacophore donor heavy atom received >= 1 hydrogen
    assert donors <= covered
    # H count respects the implied-H model
    for i in donors:
        n_h = int((ph.parent == i).sum())
        assert 1 <= n_h <= int(mol.implicit_h[i])
    d = np.linalg.norm(ph.pos - mol.coords[ph.parent], axis=-1)
    assert (d > 0.9).all() and (d < 1.4).all()


def test_donor_h_axes_replace_cone_axis(pocket):
    pk, _, _ = pocket
    ph = PT.protein_polar_h(pk.aatype, pk.atom14_pos, pk.atom14_mask)
    pos14 = pk.atom14_pos.reshape(-1, 3)
    axes, has = PT.donor_h_axes(ph, pos14, pos14.shape[0])
    nz = has > 0
    assert nz.sum() == len(set(ph.parent.tolist()))
    n = np.linalg.norm(axes[nz], axis=-1)
    assert np.allclose(n, 1.0, atol=1e-5)


def test_build_receptor_explicit_h_changes_hydroxyl_axes(pocket):
    import jax.numpy as jnp

    from diffbindfr_tpu.ops import vina

    pk, lig, _ = pocket
    pad = -(-int(pk.atom14_mask.sum()) // 8) * 8
    rec0 = vina.build_receptor(pk, pad)
    rec1 = vina.build_receptor(pk, pad, explicit_polar_h=True,
                               opt_acceptors=lig.pos[:4])
    # donor axes changed somewhere (hydroxyls move off the bond axis);
    # acceptor-only atoms untouched
    d0, d1 = np.asarray(rec0.hb_dir), np.asarray(rec1.hb_dir)
    don = np.asarray(rec0.donor) > 0
    acc_only = (np.asarray(rec0.acceptor) > 0) & ~don
    assert (np.abs(d0[don] - d1[don]).max() > 0.1)
    np.testing.assert_allclose(d0[acc_only], d1[acc_only], atol=1e-6)
    # every donor with hydrogens now has a defined axis
    assert (np.asarray(rec1.hb_has)[don].sum()
            >= np.asarray(rec0.hb_has)[don].sum())
    # the angular energy path still evaluates finitely
    nlig = -(-lig.num_atoms // 8) * 8
    vlig = vina.build_ligand(lig, nlig, max(lig.num_torsions, 1))
    lp = jnp.asarray(np.pad(lig.pos, ((0, nlig - lig.num_atoms), (0, 0))))
    e = vina.inter_energy(lp, vlig, rec1, angular_hb=True)
    assert np.isfinite(float(e))
