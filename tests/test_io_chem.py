import os

import numpy as np
import pytest

from diffbindfr_tpu.chem.ligand_feats import featurize_ligand, find_torsions
from diffbindfr_tpu.chem.mol import perceive
from diffbindfr_tpu.chem.protein_feats import (
    atom37_to_atom14,
    build_pocket_record,
)
from diffbindfr_tpu.constants import ligands as lc
from diffbindfr_tpu.io import pdb as pdb_io
from diffbindfr_tpu.io import sdf as sdf_io

REF = "/root/reference/examples"
has_ref = os.path.isdir(REF)

ASPIRIN_SDF = """aspirin
  test

 13 13  0  0  0  0  0  0  0  0999 V2000
    1.2333    0.5540    0.7792 O   0  0  0  0  0  0  0  0  0  0  0  0
   -0.6952   -2.7148   -0.7502 O   0  0  0  0  0  0  0  0  0  0  0  0
    0.7958   -2.1843    0.8685 O   0  0  0  0  0  0  0  0  0  0  0  0
    1.7813    0.8105   -1.4821 O   0  0  0  0  0  0  0  0  0  0  0  0
   -0.0857    0.6088    0.4403 C   0  0  0  0  0  0  0  0  0  0  0  0
   -0.7927   -0.5515    0.1244 C   0  0  0  0  0  0  0  0  0  0  0  0
   -0.7288    1.8464    0.4133 C   0  0  0  0  0  0  0  0  0  0  0  0
   -2.1426   -0.4741   -0.2184 C   0  0  0  0  0  0  0  0  0  0  0  0
   -2.0787    1.9238    0.0706 C   0  0  0  0  0  0  0  0  0  0  0  0
   -2.7855    0.7636   -0.2453 C   0  0  0  0  0  0  0  0  0  0  0  0
   -0.1409   -1.8536    0.1477 C   0  0  0  0  0  0  0  0  0  0  0  0
    2.1094    0.6715   -0.3113 C   0  0  0  0  0  0  0  0  0  0  0  0
    3.5305    0.5996    0.1635 C   0  0  0  0  0  0  0  0  0  0  0  0
  1  5  1  0
  1 12  1  0
  2 11  1  0
  3 11  2  0
  4 12  2  0
  5  6  4  0
  5  7  4  0
  6  8  4  0
  6 11  1  0
  7  9  4  0
  8 10  4  0
  9 10  4  0
 12 13  1  0
M  END
$$$$
"""


@pytest.fixture
def aspirin(tmp_path):
    p = tmp_path / "aspirin.sdf"
    p.write_text(ASPIRIN_SDF)
    return sdf_io.parse_sdf(str(p))[0]


def test_sdf_parse_roundtrip(aspirin, tmp_path):
    assert aspirin.num_atoms == 13
    assert len(aspirin.bonds) == 13
    out = tmp_path / "out.sdf"
    sdf_io.write_sdf(str(out), aspirin, props_list=[{"score": 1.25}])
    back = sdf_io.parse_sdf(str(out))[0]
    assert back.num_atoms == 13
    assert np.allclose(back.coords, aspirin.coords, atol=1e-3)
    assert back.props["score"] == "1.25"
    assert list(back.bond_orders) == list(aspirin.bond_orders)


def test_perceive_aspirin(aspirin):
    mol = perceive(aspirin)
    assert mol.num_atoms == 13
    assert len(mol.rings) == 1 and len(mol.rings[0]) == 6
    assert mol.aromatic_atoms.sum() == 6
    # carboxyl O-H: the acid O (index 1, bonded single to C11) needs an H
    assert mol.implicit_h[1] == 1
    # ester O has no H
    assert mol.implicit_h[0] == 0
    hyb = [mol.hybridization[i] for i in range(13)]
    assert hyb[4] == "SP2"  # aromatic carbon
    assert hyb[12] == "SP3"  # methyl


def test_featurize_aspirin(aspirin):
    rec = featurize_ligand(perceive(aspirin))
    assert rec.node_feat.shape == (13, lc.LIG_NODE_FEAT_DIM)
    assert rec.edge_feat.shape == (26, lc.LIG_EDGE_FEAT_DIM)
    assert rec.edge_index.shape == (2, 26)
    # aspirin has 3 rotatable bonds in this definition: C5-O1(ester link has
    # fragment >1), O1-C12, C6-C11 ... C12-C13 methyl is terminal (frag==1)
    assert rec.num_torsions >= 2
    # every torsion's fragment contains the edge target
    src, dst = rec.edge_index
    tor_ids = np.where(rec.tor_edge_mask)[0]
    for t, k in enumerate(tor_ids):
        assert rec.rot_node_mask[t, dst[k]]
        assert not rec.rot_node_mask[t, src[k]]
    # partial charges roughly neutral in total
    q = rec.node_feat[:, 12]
    assert abs(q.sum()) < 0.5


@pytest.mark.skipif(not has_ref, reason="reference examples not mounted")
def test_parse_reference_ligands():
    import glob

    files = sorted(glob.glob(f"{REF}/forward/mols/*.sdf"))[:5]
    for f in files:
        mol = perceive(sdf_io.parse_sdf(f)[0])
        rec = featurize_ligand(mol, name=os.path.basename(f))
        assert rec.num_atoms > 5
        assert np.isfinite(rec.node_feat).all()
        assert rec.num_torsions >= 0


@pytest.mark.skipif(not has_ref, reason="reference examples not mounted")
def test_parse_reference_protein_and_pocket():
    prot = pdb_io.parse_pdb(f"{REF}/forward/3dbs_protein.pdb")
    assert prot.num_res > 100
    pos14, mask14 = atom37_to_atom14(prot)
    assert pos14.shape == (prot.num_res, 14, 3)
    # crystal ligand defines the pocket
    lig = sdf_io.parse_sdf(f"{REF}/forward/3dbs_protein_crystal.sdf")[0]
    rec = build_pocket_record(prot, lig.coords, cutoff=12.0)
    assert 20 < rec.num_res < 200
    assert rec.node_feat.shape == (rec.num_res, 14, 5)
    assert np.isfinite(rec.atom14_pos).all()
    # decentered: CA centroid ~ 0
    ca = rec.atom14_pos[rec.atom14_mask[:, 1] > 0, 1]
    assert np.abs(ca.mean(axis=0)).max() < 1e-3
    # torsion angles defined where chi_mask set
    assert rec.chi_mask.any()


@pytest.mark.skipif(not has_ref, reason="reference examples not mounted")
def test_pdb_write_read_roundtrip(tmp_path):
    prot = pdb_io.parse_pdb(f"{REF}/AF2/2zec.pdb")
    out = tmp_path / "out.pdb"
    pdb_io.write_pdb(str(out), prot)
    back = pdb_io.parse_pdb(str(out))
    assert back.num_res == prot.num_res
    assert np.allclose(back.atom_positions, prot.atom_positions, atol=2e-3)
    assert (back.aatype == prot.aatype).all()


@pytest.mark.skipif(not has_ref, reason="reference examples not mounted")
def test_pdb_template_byte_identical(tmp_path):
    """The incremental per-pose PDB serializer must produce byte-identical
    output to the full to_pdb_string path for arbitrary pocket poses."""
    from diffbindfr_tpu.app.export import (
        PoseStructWriter,
        export_pose,
        full_protein_with_pocket,
    )

    prot = pdb_io.parse_pdb(f"{REF}/forward/3dbs_protein.pdb")
    ligmol = perceive(sdf_io.parse_sdf(f"{REF}/forward/3dbs_protein_crystal.sdf")[0])
    lig = featurize_ligand(ligmol, name="3dbs")
    pocket = build_pocket_record(prot, lig.pos, cutoff=8.0)
    lig.pos = lig.pos - pocket.center

    rng = np.random.default_rng(7)
    writer = PoseStructWriter()
    for trial in range(3):
        a14 = pocket.atom14_pos + rng.normal(
            size=pocket.atom14_pos.shape).astype(np.float32) * 0.3
        pos37, mask37 = full_protein_with_pocket(prot, pocket, a14)
        legacy = pdb_io.to_pdb_string(
            pdb_io.Protein(
                atom_positions=pos37, atom_mask=mask37, aatype=prot.aatype,
                residue_index=prot.residue_index,
                chain_index=prot.chain_index, b_factors=prot.b_factors,
                chain_ids=prot.chain_ids, resnames=prot.resnames,
                insertion_codes=prot.insertion_codes,
            )
        )
        tpl, ks, ss = writer.get(prot, pocket)
        world = np.asarray(a14) + pocket.center[None, None, :]
        assert tpl.render(world[ks, ss]) == legacy
    # template cache: same (prot, pocket) layout -> one template
    assert len(writer._templates) == 1

    # end-to-end export_pose with the writer matches the legacy path
    d_new = tmp_path / "new"
    d_old = tmp_path / "old"
    a14 = pocket.atom14_pos
    export_pose(str(d_new), lig, pocket, prot, lig.pos, a14,
                struct_writer=writer)
    export_pose(str(d_old), lig, pocket, prot, lig.pos, a14)
    new_txt = (d_new / "prot_final.pdb").read_text()
    old_txt = (d_old / "prot_final.pdb").read_text()
    assert new_txt == old_txt
    assert (d_new / "lig_final.sdf").read_text() == (
        d_old / "lig_final.sdf").read_text()
