"""Metrics: symmetry handling in L-RMSD, chi1, and sc-RMSD."""
import numpy as np

from diffbindfr_tpu.constants import residues as rc
from diffbindfr_tpu.metrics import (
    centroid_distance,
    chi1_accuracy,
    ligand_rmsd,
    sidechain_rmsd,
)


def test_lrmsd_symmetry():
    # para-substituted benzene-like ring: flipping equivalent atoms must
    # give RMSD 0 even though the naive atom order differs
    theta = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    ring = np.stack([np.cos(theta), np.sin(theta), np.zeros(6)], axis=-1)
    bonds = np.array([[i, (i + 1) % 6] for i in range(6)])
    elements = ["C"] * 6
    # mirror the ring: a graph automorphism (reflection) maps it onto itself
    flipped = ring.copy()
    flipped[:, 1] *= -1
    r_naive = float(np.sqrt(np.mean(np.sum((ring - flipped) ** 2, -1))))
    assert r_naive > 0.5
    assert ligand_rmsd(flipped, ring, bonds, elements) < 1e-6
    # but a genuinely displaced ring is nonzero
    assert ligand_rmsd(ring + 1.0, ring, bonds, elements) > 1.0


def test_lrmsd_element_labels_prevent_false_matches():
    pos = np.array([[0.0, 0, 0], [1.5, 0, 0], [3.0, 0, 0]])
    bonds = np.array([[0, 1], [1, 2]])
    # O-C-N chain: ends are NOT interchangeable
    r = ligand_rmsd(pos[::-1].copy(), pos, bonds, ["O", "C", "N"])
    assert r > 1.0
    # O-C-O chain: ends ARE interchangeable
    r2 = ligand_rmsd(pos[::-1].copy(), pos, bonds, ["O", "C", "O"])
    assert r2 < 1e-6


def test_centroid():
    a = np.zeros((4, 3))
    b = np.ones((4, 3))
    assert abs(centroid_distance(a, b) - np.sqrt(3.0)) < 1e-6


def _leu_pose(chi1, chi2=0.0):
    """Build a fake LEU residue atom14 with given chi1 via the ideal frames."""
    from diffbindfr_tpu.geometry import chi as chi_geo
    import jax.numpy as jnp

    aa = rc.restype_order["L"]
    tors = np.zeros((1, 5), np.float32)
    tors[0, 1] = chi1
    tors[0, 2] = chi2
    sincos = np.stack([np.sin(tors), np.cos(tors)], axis=-1)
    pos = chi_geo.build_atom14(
        jnp.asarray(sincos),
        jnp.eye(3)[None],
        jnp.zeros((1, 3)),
        jnp.asarray(rc.restype_rigid_group_default_frame[aa][None], jnp.float32),
        jnp.asarray(rc.restype_atom14_rigid_group_positions[aa][None], jnp.float32),
        jnp.asarray(rc.restype_atom14_to_rigid_group[aa][None]),
        jnp.asarray(rc.restype_atom14_mask[aa][None], jnp.float32),
    )
    return np.asarray(pos), rc.restype_atom14_mask[aa][None], np.array([aa])


def test_chi1_accuracy_and_scrmsd():
    p0, m, aa = _leu_pose(0.3)
    p1, _, _ = _leu_pose(0.3 + np.radians(10))
    p2, _, _ = _leu_pose(0.3 + np.radians(60))
    assert chi1_accuracy(aa, p1, p0, m) == 1.0
    assert chi1_accuracy(aa, p2, p0, m) == 0.0
    assert sidechain_rmsd(aa, p0, p0, m) < 1e-6
    assert sidechain_rmsd(aa, p2, p0, m) > 0.5


def test_scrmsd_symmetric_swap():
    """ASP OD1/OD2 exchange must not count as error."""
    aa = np.array([rc.restype_order["D"]])
    names = rc.restype_name_to_atom14_names["ASP"]
    i, j = names.index("OD1"), names.index("OD2")
    rng = np.random.default_rng(0)
    ref = rng.normal(size=(1, 14, 3)).astype(np.float32)
    mask = rc.restype_atom14_mask[aa]
    pred = ref.copy()
    pred[0, [i, j]] = pred[0, [j, i]]
    assert sidechain_rmsd(aa, pred, ref, mask) < 1e-6
