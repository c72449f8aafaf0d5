"""DSSP-lite + SASA on the real 3dbs structure."""
import numpy as np
import pytest

from diffbindfr_tpu.chem import secondary_structure as ssmod
from diffbindfr_tpu.io.pdb import parse_pdb

PDB = "/root/reference/examples/forward/3dbs_protein.pdb"


@pytest.fixture(scope="module")
def prot():
    return parse_pdb(PDB)


def test_ss_fractions_sane(prot):
    ss = ssmod.assign_ss(prot)
    n = prot.num_res
    frac_h = float((ss == "H").sum()) / n
    frac_e = float((ss == "E").sum()) / n
    # PI3K gamma is an alpha/beta kinase: substantial helix AND sheet
    assert 0.15 < frac_h < 0.7, frac_h
    assert 0.05 < frac_e < 0.5, frac_e
    assert set(ss) <= {"H", "E", "C"}


def test_helix_dihedrals(prot):
    """Residues assigned H should cluster in the alpha-helical phi/psi bin."""
    ss = ssmod.assign_ss(prot)
    phi, psi = ssmod.backbone_dihedrals(prot)
    hmask = (ss == "H")
    hmask[0] = hmask[-1] = False
    phi_h = np.degrees(phi[hmask])
    psi_h = np.degrees(psi[hmask])
    in_bin = ((phi_h > -120) & (phi_h < -20) & (psi_h > -80) & (psi_h < 20))
    assert in_bin.mean() > 0.8, in_bin.mean()


def test_sasa(prot):
    sub = prot.select(np.arange(120))  # keep runtime bounded
    sasa, rasa = ssmod.shrake_rupley_sasa(sub)
    assert sasa.shape == (120,)
    assert (sasa >= 0).all() and (rasa >= 0).all() and (rasa <= 1).all()
    # a protein has both buried and exposed residues
    assert (rasa < 0.05).any() and (rasa > 0.4).any()


def test_residue_depth(prot):
    """MSMS residue-depth role (reference protein.py:822-830). Needs a
    selection large enough to have a real hydrophobic core (a 120-residue
    slab is all near-surface); 400 residues keeps runtime bounded."""
    sub = prot.select(np.arange(400))
    depth = ssmod.residue_depth(sub)
    _, rasa = ssmod.shrake_rupley_sasa(sub)
    assert depth.shape == (400,)
    assert (depth >= 0).all() and depth.max() < 30.0
    # solvent-exposed residues sit at the surface; buried ones sit deeper,
    # and depth anti-correlates with relative accessibility
    exposed = depth[rasa > 0.4]
    buried = depth[rasa < 0.05]
    assert exposed.size and buried.size
    assert exposed.mean() + 1.0 < buried.mean(), (
        exposed.mean(), buried.mean())
    assert np.corrcoef(rasa, depth)[0, 1] < -0.4


def test_pocket_record_extra_res_feats(prot):
    from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
    from diffbindfr_tpu.chem.mol import perceive
    from diffbindfr_tpu.chem.protein_feats import build_pocket_record
    from diffbindfr_tpu.io.sdf import parse_sdf

    lig = featurize_ligand(
        perceive(parse_sdf(
            "/root/reference/examples/forward/3dbs_protein_crystal.sdf")[0]),
        "3dbs")
    pocket = build_pocket_record(prot, lig.pos, cutoff=8.0,
                                 extra_res_feats=("rasa", "depth"))
    assert pocket.res_extra is not None
    assert pocket.res_extra.shape == (pocket.num_res, 2)
    assert np.isfinite(pocket.res_extra).all()
    # default stays off, matching the shipped reference config
    p0 = build_pocket_record(prot, lig.pos, cutoff=8.0)
    assert p0.res_extra is None
