"""In-process TM-align: invariances + real apo/holo pair."""
import numpy as np
import pytest

from diffbindfr_tpu.io.pdb import parse_pdb
from diffbindfr_tpu.ops.tmalign import tmalign


def _ca(prot):
    # atom14 slot 1 = CA in this repo's ordering (N, CA, C, O, CB)
    from diffbindfr_tpu.chem.protein_feats import atom37_to_atom14

    pos14, mask14 = atom37_to_atom14(prot)
    keep = mask14[:, 1] > 0
    return pos14[keep, 1]


def _rot(seed):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_self_alignment_is_perfect():
    rng = np.random.default_rng(0)
    ca = np.cumsum(rng.normal(size=(80, 3)) * 1.5, axis=0)  # chain-like
    r = tmalign(ca, ca)
    assert r.tm_target > 0.999
    assert r.rmsd < 1e-3
    assert r.n_aligned == 80


def test_rigid_motion_invariance():
    rng = np.random.default_rng(1)
    ca = np.cumsum(rng.normal(size=(120, 3)) * 1.5, axis=0)
    moved = ca @ _rot(2).T + np.array([30.0, -12.0, 5.0])
    r = tmalign(moved, ca)
    assert r.tm_target > 0.999, r.tm_target
    assert r.rmsd < 1e-3


def test_partial_overlap_recovers_alignment():
    rng = np.random.default_rng(3)
    ca = np.cumsum(rng.normal(size=(100, 3)) * 1.5, axis=0)
    # mobile = middle 70 residues, rotated
    mob = ca[15:85] @ _rot(4).T + 7.0
    r = tmalign(mob, ca)
    assert r.n_aligned >= 65
    # recovered pairing maps i -> i + 15
    good = np.mean(r.pairs[:, 1] - r.pairs[:, 0] == 15)
    assert good > 0.9, good
    assert r.tm_target > 0.6


def test_unrelated_scores_low():
    rng = np.random.default_rng(5)
    a = np.cumsum(rng.normal(size=(90, 3)) * 1.5, axis=0)
    b = np.cumsum(rng.normal(size=(90, 3)) * 1.5, axis=0)
    r = tmalign(a, b)
    assert r.tm_target < 0.45, r.tm_target


def test_af2_model_vs_crystal():
    """The AF2 model of Q15661 must align to the 2zec crystal with a high
    TM-score (same fold) — the reference's AF2 apo/holo analysis anchor."""
    holo = parse_pdb("/root/reference/examples/AF2/2zec.pdb")
    apo = parse_pdb("/root/reference/examples/AF2/Q15661_AF2.pdb")
    r = tmalign(_ca(apo), _ca(holo))
    assert r.tm_target > 0.7, r.tm_target
    assert r.n_aligned > 150


def test_apo_holo_analysis_includes_tm_score():
    from diffbindfr_tpu.app.analysis import compare_binding_sites
    from diffbindfr_tpu.io.sdf import parse_ligand_file

    ref = parse_ligand_file("/root/reference/examples/AF2/ligand.sdf")[0].coords
    out = compare_binding_sites(
        "/root/reference/examples/AF2/Q15661_AF2.pdb",
        "/root/reference/examples/AF2/2zec.pdb",
        ref,
    )
    assert 0.7 < out["tm_score"] <= 1.0, out["tm_score"]
    # the published anchor: pocket CA-RMSD ~0.30 A on this pair
    assert out["pocket_ca_rmsd"] < 0.5
