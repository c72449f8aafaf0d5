import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from diffbindfr_tpu.constants import residues as rc
from diffbindfr_tpu.geometry import chi as chi_mod
from diffbindfr_tpu.geometry import frames, kabsch, rotations, torsion


def test_axis_angle_matches_scipy(rng):
    v = rng.normal(size=(32, 3))
    R_ours = np.asarray(rotations.axis_angle_to_matrix(jnp.asarray(v)))
    R_scipy = Rotation.from_rotvec(v).as_matrix()
    assert np.allclose(R_ours, R_scipy, atol=2e-3)  # float32 path


def test_axis_angle_round_trip(rng):
    v = rng.normal(size=(64, 3)) * 1.5
    R = rotations.axis_angle_to_matrix(jnp.asarray(v))
    v2 = rotations.matrix_to_axis_angle(R)
    # rotvec is only canonical up to angle <= pi: compare matrices
    R2 = np.asarray(rotations.axis_angle_to_matrix(v2))
    assert np.allclose(np.asarray(R), R2, atol=5e-3)  # f32, noisy near pi
    small = np.linalg.norm(v, axis=-1) < np.pi - 1e-2
    assert np.allclose(np.asarray(v2)[small], v[small], atol=1e-3)


def test_axis_angle_zero_safe():
    R = rotations.axis_angle_to_matrix(jnp.zeros((3,)))
    assert np.allclose(np.asarray(R), np.eye(3))
    g = jax.grad(lambda v: rotations.axis_angle_to_matrix(v).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_random_rotation_uniformity():
    key = jax.random.PRNGKey(0)
    R = np.asarray(rotations.random_rotation(key, (256,)))
    assert np.allclose(np.linalg.det(R), 1.0, atol=1e-4)
    # mean rotation matrix of a uniform distribution tends to 0
    assert np.abs(R.mean(axis=0)).max() < 0.2


def test_frame_compose_invert(rng):
    a = frames.Rigid(
        jnp.asarray(Rotation.random(5, random_state=0).as_matrix()),
        jnp.asarray(rng.normal(size=(5, 3))),
    )
    ident = frames.compose(a, frames.invert(a))
    assert np.allclose(np.asarray(ident.rot), np.eye(3), atol=1e-5)
    assert np.allclose(np.asarray(ident.trans), 0.0, atol=1e-5)


def test_kabsch_recovers_transform(rng):
    x = rng.normal(size=(4, 20, 3))
    R_true = Rotation.random(4, random_state=1).as_matrix()
    t_true = rng.normal(size=(4, 3)) * 3
    y = np.einsum("bij,bnj->bni", R_true, x) + t_true[:, None]
    mask = np.ones((4, 20))
    mask[:, 15:] = 0  # ignore garbage points
    y[:, 15:] += rng.normal(size=(4, 5, 3)) * 10
    R, t = kabsch.kabsch_align(jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))
    assert np.allclose(np.asarray(R), R_true, atol=1e-4)
    assert np.allclose(np.asarray(t), t_true, atol=1e-4)


def _butane_like():
    """4-atom chain with one rotatable central bond."""
    pos = np.array(
        [[0.0, 0, 0], [1.5, 0, 0], [2.2, 1.3, 0], [3.7, 1.3, 0]], dtype=np.float32
    )
    # torsion bond 1->2, fragment = {atoms 2, 3} (the v side rotates)
    tor_bonds = np.array([[1, 2]], dtype=np.int32)
    frag = np.array([[False, False, True, True]])
    return pos, tor_bonds, frag


def _dihedral(p0, p1, p2, p3):
    b0, b1, b2 = p1 - p0, p2 - p1, p3 - p2
    b1 = b1 / np.linalg.norm(b1)
    v = b0 - np.dot(b0, b1) * b1
    w = b2 - np.dot(b2, b1) * b1
    x = np.dot(v, w)
    y = np.dot(np.cross(b1, v), w)
    return np.arctan2(y, x)


def test_torsion_update_changes_dihedral_only():
    pos, tor_bonds, frag = _butane_like()
    theta = 0.7
    new = np.asarray(
        torsion.apply_torsion_updates(
            jnp.asarray(pos),
            jnp.asarray(tor_bonds),
            jnp.asarray(frag),
            jnp.asarray([theta]),
            jnp.asarray([True]),
        )
    )
    # bond lengths preserved
    for i, j in [(0, 1), (1, 2), (2, 3)]:
        assert np.isclose(
            np.linalg.norm(new[i] - new[j]), np.linalg.norm(pos[i] - pos[j]), atol=1e-5
        )
    # atoms outside the fragment unchanged
    assert np.allclose(new[:2], pos[:2])
    d0 = _dihedral(*pos)
    d1 = _dihedral(*new)
    assert np.isclose(
        np.mod(d1 - d0 + np.pi, 2 * np.pi) - np.pi, theta, atol=1e-5
    ) or np.isclose(np.mod(d1 - d0 + np.pi, 2 * np.pi) - np.pi, -theta, atol=1e-5)


def test_modify_conformer_masks_and_rmsd():
    pos, tor_bonds, frag = _butane_like()
    L = 8  # pad
    pos_p = np.zeros((L, 3), dtype=np.float32)
    pos_p[:4] = pos
    node_mask = np.zeros(L, dtype=bool)
    node_mask[:4] = True
    frag_p = np.zeros((2, L), dtype=bool)
    frag_p[0, :4] = frag[0]
    bonds_p = np.zeros((2, 2), dtype=np.int32)
    bonds_p[0] = tor_bonds[0]
    new = np.asarray(
        torsion.modify_conformer(
            jnp.asarray(pos_p),
            jnp.asarray(node_mask),
            jnp.asarray([1.0, -2.0, 0.5]),
            jnp.asarray([0.1, 0.2, -0.3]),
            jnp.asarray(bonds_p),
            jnp.asarray(frag_p),
            jnp.asarray([0.5, 0.0]),
            jnp.asarray([True, False]),
        )
    )
    assert np.all(np.isfinite(new))
    assert np.allclose(new[4:], 0.0)  # padding untouched
    # centroid moved approximately by tr_update (Kabsch keeps rigid frame)
    c0 = pos.mean(axis=0)
    c1 = new[:4].mean(axis=0)
    assert np.linalg.norm((c1 - c0) - np.array([1.0, -2.0, 0.5])) < 0.35


def _fake_residues(rng, resnames=("ARG", "LEU", "SER", "TRP", "GLY")):
    """Build pseudo-structures by posing ideal residues with random frames and
    random chi angles, using the JAX rebuild as generator."""
    n = len(resnames)
    aatype = np.array([rc.aatype_from_resname(r) for r in resnames])
    chis = rng.uniform(-np.pi, np.pi, size=(n, 4)) * rc.chi_angles_mask[aatype]
    psi = rng.uniform(-np.pi, np.pi, size=(n,))
    angles = np.concatenate([psi[:, None], chis], axis=1).astype(np.float32)
    R = Rotation.random(n, random_state=3).as_matrix().astype(np.float32)
    t = rng.normal(size=(n, 3)).astype(np.float32) * 10
    sincos = np.stack([np.sin(angles), np.cos(angles)], axis=-1)
    pos14 = np.asarray(
        chi_mod.build_atom14(
            jnp.asarray(sincos),
            jnp.asarray(R),
            jnp.asarray(t),
            jnp.asarray(rc.restype_rigid_group_default_frame[aatype]),
            jnp.asarray(rc.restype_atom14_rigid_group_positions[aatype]),
            jnp.asarray(rc.restype_atom14_to_rigid_group[aatype]),
            jnp.asarray(rc.restype_atom14_mask[aatype]),
        )
    )
    mask14 = rc.restype_atom14_mask[aatype]
    return aatype, pos14, mask14, angles, R, t


def test_chi_extract_then_rebuild_round_trip(rng):
    aatype, pos14, mask14, angles, R, t = _fake_residues(rng)
    tpl = chi_mod.extract_chi_and_template(aatype, pos14, mask14)
    # extracted angles match the generating ones
    chi_ok = rc.chi_angles_mask[aatype].astype(bool)
    diff = np.mod(tpl.torsion_angle[:, 1:] - angles[:, 1:] + np.pi, 2 * np.pi) - np.pi
    assert np.abs(diff[chi_ok]).max() < 1e-3
    # psi matches
    dpsi = np.mod(tpl.torsion_angle[:, 0] - angles[:, 0] + np.pi, 2 * np.pi) - np.pi
    assert np.abs(dpsi).max() < 1e-3
    # rebuild with the extracted template reproduces input coordinates
    sincos = np.stack(
        [np.sin(tpl.torsion_angle), np.cos(tpl.torsion_angle)], axis=-1
    )
    rebuilt = np.asarray(
        chi_mod.build_atom14(
            jnp.asarray(sincos),
            jnp.asarray(tpl.backbone_rots),
            jnp.asarray(tpl.backbone_transl),
            jnp.asarray(tpl.default_frame),
            jnp.asarray(tpl.rigid_group_positions),
            jnp.asarray(rc.restype_atom14_to_rigid_group[aatype]),
            jnp.asarray(mask14),
        )
    )
    err = np.abs(rebuilt - pos14 * mask14[..., None]).max()
    assert err < 1e-3, err


def test_rebuild_with_new_chis_preserves_backbone(rng):
    aatype, pos14, mask14, angles, R, t = _fake_residues(rng)
    tpl = chi_mod.extract_chi_and_template(aatype, pos14, mask14)
    new_angles = tpl.torsion_angle.copy()
    new_angles[:, 1:] = rng.uniform(-np.pi, np.pi, size=new_angles[:, 1:].shape)
    sincos = np.stack([np.sin(new_angles), np.cos(new_angles)], axis=-1)
    rebuilt = np.asarray(
        chi_mod.build_atom14(
            jnp.asarray(sincos.astype(np.float32)),
            jnp.asarray(tpl.backbone_rots),
            jnp.asarray(tpl.backbone_transl),
            jnp.asarray(tpl.default_frame),
            jnp.asarray(tpl.rigid_group_positions),
            jnp.asarray(rc.restype_atom14_to_rigid_group[aatype]),
            jnp.asarray(mask14),
        )
    )
    # N, CA, C, O backbone fixed under chi changes (O moves with psi, kept)
    bb = [0, 1, 2]
    assert np.abs(rebuilt[:, bb] - pos14[:, bb]).max() < 1e-3
    # bond CA-CB length preserved where CB exists
    has_cb = mask14[:, 4].astype(bool)
    d_old = np.linalg.norm(pos14[has_cb, 4] - pos14[has_cb, 1], axis=-1)
    d_new = np.linalg.norm(rebuilt[has_cb, 4] - rebuilt[has_cb, 1], axis=-1)
    assert np.allclose(d_old, d_new, atol=1e-3)
