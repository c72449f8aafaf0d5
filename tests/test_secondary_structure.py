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
