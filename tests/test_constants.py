import numpy as np

from diffbindfr_tpu.constants import residues as rc


def test_vocabulary_sizes():
    assert len(rc.restypes) == 20
    assert rc.atom37_num == 37
    assert rc.restype_atom14_mask.shape == (21, 14)
    assert rc.restype_rigid_group_default_frame.shape == (21, 8, 4, 4)
    assert rc.restype_atom14_rigid_group_positions.shape == (21, 14, 3)
    assert len(rc.coarse_atom_types) == 22
    assert len(rc.atom_elements) == 4


def test_atom_counts_per_residue():
    # well-known heavy-atom counts
    expected = {"GLY": 4, "ALA": 5, "ARG": 11, "TRP": 14, "SER": 6, "LYS": 9}
    for res3, n in expected.items():
        ri = rc.restype_order[rc.restype_3to1[res3]]
        assert int(rc.restype_atom14_mask[ri].sum()) == n


def test_chi_masks():
    gly = rc.restype_order["G"]
    ala = rc.restype_order["A"]
    arg = rc.restype_order["R"]
    ser = rc.restype_order["S"]
    assert rc.chi_angles_mask[gly].sum() == 0
    assert rc.chi_angles_mask[ala].sum() == 0
    assert rc.chi_angles_mask[arg].sum() == 4
    assert rc.chi_angles_mask[ser].sum() == 1


def test_default_frames_are_rigid():
    f = rc.restype_rigid_group_default_frame
    R = f[..., :3, :3]
    should_be_eye = np.einsum("...ij,...kj->...ik", R, R)
    assert np.allclose(should_be_eye, np.eye(3), atol=1e-5)
    det = np.linalg.det(R)
    assert np.allclose(det, 1.0, atol=1e-5)


def test_backbone_geometry_sanity():
    # ideal N-CA distance ~1.46 A, CA-C ~1.52 A for every residue
    for res3 in rc.resnames:
        ri = rc.restype_order[rc.restype_3to1[res3]]
        pos = rc.restype_atom14_rigid_group_positions[ri]
        n_ca = np.linalg.norm(pos[0] - pos[1])
        ca_c = np.linalg.norm(pos[2] - pos[1])
        assert 1.3 < n_ca < 1.6, res3
        assert 1.4 < ca_c < 1.6, res3


def test_torsion_edges_point_at_chi_bond():
    # for ARG chi1 the rotation bond is CA-CB: edges[1] == (CA_idx, CB_idx)
    arg = rc.restype_order["R"]
    a14 = rc.restype_name_to_atom14_names["ARG"]
    j, k = rc.restype_chi_bond_atom14[arg, 0]
    assert a14[j] == "CA" and a14[k] == "CB"
    # last pair is flipped to l->k
    i2, j2 = rc.restype_atom14_torsion_edges[arg, 0, 2]
    assert a14[j2] == "CB"  # k stays the target


def test_atom14_to_atom37_round_trip():
    for ri in range(20):
        for slot in range(14):
            if rc.restype_atom14_mask[ri, slot]:
                a37 = rc.restype_atom14_to_atom37[ri, slot]
                assert rc.restype_atom37_to_atom14[ri, a37] == slot
