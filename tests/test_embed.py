"""DG-lite conformer embedding: validity + stereo preservation + diversity."""
import numpy as np
import pytest

from diffbindfr_tpu.app.validity import (_chiral_volumes, _neighbor_lists,
                                         _plane_dev, _sp2_rings,
                                         _stereo_double_bonds)
from diffbindfr_tpu.chem.embed import embed_conformers
from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
from diffbindfr_tpu.chem.mol import perceive
from diffbindfr_tpu.io.sdf import parse_sdf

SDF = "/root/reference/examples/forward/3dbs_protein_crystal.sdf"


@pytest.fixture(scope="module")
def embedded():
    lig = featurize_ligand(perceive(parse_sdf(SDF)[0]), "3dbs")
    confs = embed_conformers(lig, n_conf=4, seed=0, steps=500)
    return lig, confs


def test_bond_and_angle_geometry(embedded):
    lig, confs = embedded
    b = lig.bonds
    ref = np.linalg.norm(lig.pos[b[:, 0]] - lig.pos[b[:, 1]], axis=-1)
    for c in confs:
        got = np.linalg.norm(c[b[:, 0]] - c[b[:, 1]], axis=-1)
        np.testing.assert_allclose(got, ref, rtol=0.1)


def test_stereo_preserved(embedded):
    lig, confs = embedded
    nbrs = _neighbor_lists(lig.bonds, lig.num_atoms)
    ref = {j: np.sign(v) for j, v in _chiral_volumes(lig.pos, nbrs)
           if abs(v) > 0.25}
    assert ref, "fixture ligand should have at least one defined center"
    for c in confs:
        got = dict(_chiral_volumes(c, nbrs))
        for j, s in ref.items():
            assert np.sign(got[j]) == s, (j, got[j], s)
    # E/Z preserved: 1-4 distance class across stereo double bonds
    for a, bb, sa, sb, saa, sbb in _stereo_double_bonds(lig):
        ref_d = np.linalg.norm(lig.pos[sa] - lig.pos[sb])
        for c in confs:
            assert abs(np.linalg.norm(c[sa] - c[sb]) - ref_d) < 0.6


def test_aromatic_rings_flat(embedded):
    lig, confs = embedded
    rings = _sp2_rings(lig)
    assert rings
    for c in confs:
        for ring in rings:
            assert _plane_dev(c[np.asarray(ring)]) < 0.25


def test_no_internal_clashes(embedded):
    from diffbindfr_tpu.app.validity import _graph_distance_ge3

    lig, confs = embedded
    nb = _graph_distance_ge3(lig.bonds, lig.num_atoms)
    for c in confs:
        d = np.linalg.norm(c[:, None] - c[None, :] + 1e-9, axis=-1)
        assert d[nb].min() > 1.8, d[nb].min()


def test_conformer_diversity_and_no_crystal_reuse(embedded):
    lig, confs = embedded

    def dmat(p):
        return np.linalg.norm(p[:, None] - p[None, :] + 1e-9, axis=-1)

    ref = dmat(lig.pos)
    n = lig.num_atoms
    # each embedded conformer's internal distance pattern differs from the
    # crystal's (no geometry reuse) ...
    for c in confs:
        assert np.abs(dmat(c) - ref).mean() > 0.1
    # ... and from each other (ring pucker / torsion diversity)
    diffs = [
        np.abs(dmat(confs[i]) - dmat(confs[j])).mean()
        for i in range(len(confs)) for j in range(i + 1, len(confs))
    ]
    assert max(diffs) > 0.1


def test_prep_populates_conformers(tmp_path):
    from diffbindfr_tpu.app import jobs as J
    from diffbindfr_tpu.app import pipeline as P

    jobs = J.make_jobs(
        [SDF], ["/root/reference/examples/forward/3dbs_protein.pdb"]
    )
    prepared, failures = P.prep(
        jobs, pocket_radius=8.0, verbose=False,
        cache_dir=str(tmp_path / "cache"), n_conformers=2,
    )
    assert not failures
    pr = prepared[0]
    assert pr.conformers is not None and pr.conformers.shape[0] == 2
    assert pr.conformers.shape[1] == pr.lig.num_atoms
    # resume path keeps them
    prepared2, _ = P.prep(
        jobs, pocket_radius=8.0, verbose=False,
        cache_dir=str(tmp_path / "cache"), n_conformers=2,
    )
    np.testing.assert_allclose(prepared2[0].conformers, pr.conformers)
