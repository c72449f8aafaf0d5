"""Vina-style scorer/minimizer on the real 3dbs example."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
from diffbindfr_tpu.chem.mol import perceive
from diffbindfr_tpu.chem.protein_feats import build_pocket_record
from diffbindfr_tpu.io.pdb import parse_pdb
from diffbindfr_tpu.io.sdf import parse_sdf
from diffbindfr_tpu.ops import vina

PDB = "/root/reference/examples/forward/3dbs_protein.pdb"
SDF = "/root/reference/examples/forward/3dbs_protein_crystal.sdf"


@pytest.fixture(scope="module")
def system():
    prot = parse_pdb(PDB)
    lig = featurize_ligand(perceive(parse_sdf(SDF)[0]), "3dbs")
    pocket = build_pocket_record(prot, lig.pos, cutoff=8.0)
    crystal = jnp.asarray(lig.pos - pocket.center, jnp.float32)
    npad = 64
    vlig = vina.build_ligand(lig, pad_atoms=npad, pad_tor=8)
    vrec = vina.build_receptor(pocket, pad_atoms=512)
    crystal = jnp.pad(crystal, ((0, npad - crystal.shape[0]), (0, 0)))
    return vlig, vrec, crystal


def test_crystal_pose_is_favorable(system):
    vlig, vrec, crystal = system
    aff = float(vina.affinity(crystal, vlig, vrec))
    assert np.isfinite(aff)
    # the crystal pose of a real complex must score clearly negative
    assert aff < -2.0, aff
    # a pose shifted out of the pocket scores ~0
    far = crystal + jnp.asarray([50.0, 0.0, 0.0]) * vlig.mask[:, None]
    aff_far = float(vina.affinity(far, vlig, vrec))
    assert abs(aff_far) < 0.5, aff_far
    # an overlapping (clashing) pose is worse than the crystal
    clash = crystal * jnp.asarray([[0.2, 0.2, 0.2]]) * vlig.mask[:, None]
    assert float(vina.affinity(clash, vlig, vrec)) > aff


def test_minimize_improves_perturbed_pose(system):
    vlig, vrec, crystal = system
    rng = np.random.default_rng(0)
    jitter = jnp.asarray(rng.normal(size=crystal.shape) * 0.8, jnp.float32)
    start = crystal + jitter * vlig.mask[:, None]
    e0 = float(vina.inter_energy(start, vlig, vrec) + vina.intra_energy(start, vlig))
    pos, aff = jax.jit(
        lambda p: vina.minimize(p, vlig, vrec, steps=120, lr=0.05)
    )(start)
    e1 = float(vina.inter_energy(pos, vlig, vrec) + vina.intra_energy(pos, vlig))
    assert e1 < e0, (e0, e1)
    assert np.isfinite(float(aff))
    # minimization is a LOCAL pose-space move: the ligand must not fly away
    # (single terminal atoms may swing farther through torsion moves)
    n = int(np.sum(np.asarray(vlig.mask)))
    rmsd = float(jnp.sqrt(jnp.mean(jnp.sum((pos[:n] - start[:n]) ** 2, -1))))
    assert rmsd < 3.5, rmsd
    # and the minimized pose must be clearly bound (negative affinity)
    assert float(aff) < -2.0, float(aff)


def test_minimize_batch(system):
    vlig, vrec, crystal = system
    batch = jax.tree.map(lambda x: jnp.stack([x, x]), (vlig, vrec, crystal))
    bl, br, bc = batch
    pos, aff = jax.jit(
        lambda c, l, r: vina.minimize_batch(c, l, r, steps=30)
    )(bc, bl, br)
    assert pos.shape == bc.shape
    np.testing.assert_allclose(np.asarray(aff[0]), np.asarray(aff[1]), rtol=1e-5)


# ---------------------------------------------------------------------------
# joint ligand + side-chain relax (receptor-flexible minimization)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def flex_system():
    prot = parse_pdb(PDB)
    lig = featurize_ligand(perceive(parse_sdf(SDF)[0]), "3dbs")
    pocket = build_pocket_record(prot, lig.pos, cutoff=8.0)
    crystal = jnp.asarray(lig.pos - pocket.center, jnp.float32)
    npad = 64
    vlig = vina.build_ligand(lig, pad_atoms=npad, pad_tor=8)
    crystal = jnp.pad(crystal, ((0, npad - crystal.shape[0]), (0, 0)))
    pad_res = -(-pocket.num_res // 8) * 8
    return pocket, vlig, crystal, pad_res


def test_flex_rebuild_matches_pocket(flex_system):
    """chi offsets of zero must reproduce the input pocket atoms."""
    pocket, vlig, crystal, pad_res = flex_system
    frec = vina.build_flex_receptor(pocket, pad_res)
    pos14 = vina.flex_atom14(frec, jnp.zeros_like(frec.chi_mask))
    r = pocket.num_res
    got = np.asarray(pos14)[:r] * pocket.atom14_mask[..., None]
    want = pocket.atom14_pos * pocket.atom14_mask[..., None]
    err = np.abs(got - want).max()
    # rebuild from ideal frames: small deviations from the deposited
    # coordinates are expected (non-ideal crystal geometry)
    assert err < 1.0, err
    rms = np.sqrt(
        ((got - want) ** 2).sum(-1)[pocket.atom14_mask > 0].mean()
    )
    assert rms < 0.35, rms


def test_joint_minimize_resolves_clashes(flex_system):
    """Perturbed side chains clash with the crystal ligand; the joint
    minimizer must remove the receptor-internal and ligand-receptor
    overlaps it introduced without moving the ligand away."""
    pocket, vlig, crystal, pad_res = flex_system
    import dataclasses

    rng = np.random.default_rng(1)
    noise = rng.normal(size=pocket.torsion_angle.shape).astype(np.float32) * 0.5
    noise[:, 0] = 0.0  # psi fixed
    pert = dataclasses.replace(
        pocket, torsion_angle=pocket.torsion_angle + noise
    )
    frec = vina.build_flex_receptor(pert, pad_res)

    zero = jnp.zeros_like(frec.chi_mask)
    excl = vina.flex_clash_exclusion(frec)
    pos14_0 = vina.flex_atom14(frec, zero)
    e_inter0 = float(vina.flex_inter_energy(crystal, vlig, frec, pos14_0))

    pos, pos14, aff = jax.jit(
        lambda c: vina.joint_minimize(c, vlig, frec, steps=150, lr=0.05)
    )(crystal)
    e_inter1 = float(vina.flex_inter_energy(pos, vlig, frec, pos14))
    clash1 = float(vina.receptor_clash_energy(frec, pos14, excl))

    # total complex energy improves and the final state is essentially
    # clash-free inside the receptor
    assert e_inter1 < e_inter0, (e_inter0, e_inter1)
    assert np.isfinite(float(aff))
    # ligand stays in the pocket
    n = int(np.sum(np.asarray(vlig.mask)))
    rmsd = float(jnp.sqrt(jnp.mean(jnp.sum((pos[:n] - crystal[:n]) ** 2, -1))))
    assert rmsd < 2.5, rmsd
    # severe ligand-receptor overlaps (surface dist < -0.5 A) are resolved
    def n_overlap(lp, p14):
        rpos = p14.reshape(-1, 3)
        rmask = frec.atom14_mask.reshape(-1)
        d = jnp.linalg.norm(lp[:, None, :] - rpos[None, :, :] + 1e-9, axis=-1)
        ds = d - vlig.radius[:, None] - frec.radius.reshape(-1)[None, :]
        keep = (vlig.mask[:, None] > 0) & (rmask[None, :] > 0)
        return int(jnp.sum(jnp.where(keep, ds < -0.5, False)))

    assert n_overlap(pos, pos14) <= n_overlap(crystal, pos14_0)
    assert clash1 < 5.0, clash1


def test_joint_minimize_batch(flex_system):
    pocket, vlig, crystal, pad_res = flex_system
    frec = vina.build_flex_receptor(pocket, pad_res)
    bl = jax.tree.map(lambda x: jnp.stack([x, x]), vlig)
    bc = jnp.stack([crystal, crystal])
    pos, pos14, aff = jax.jit(
        lambda c, l: vina.joint_minimize_batch(c, l, frec, steps=20)
    )(bc, bl)
    assert pos.shape == bc.shape
    assert pos14.shape == (2,) + frec.atom14_mask.shape + (3,)
    np.testing.assert_allclose(np.asarray(aff[0]), np.asarray(aff[1]), rtol=1e-5)


def test_relax_cli_flex(tmp_path):
    """relax --flex smoke: re-minimizes the pose in place and writes the
    re-packed protein next to it."""
    import csv
    import shutil

    from diffbindfr_tpu.app.cli import main as cli_main

    lig_sdf = str(tmp_path / "pose.sdf")
    shutil.copy(SDF, lig_sdf)
    csv_path = str(tmp_path / "results.csv")
    with open(csv_path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=["lig_sdf", "prot_pdb"])
        w.writeheader()
        w.writerow({"lig_sdf": lig_sdf, "prot_pdb": PDB})
    rc = cli_main(["relax", "-i", csv_path, "--steps", "30", "--flex",
                   "--cpu"])
    assert rc == 0
    relaxed = str(tmp_path / "pose_relaxed.pdb")
    import os

    assert os.path.exists(relaxed)
    txt = open(relaxed).read()
    assert txt.count("ATOM") > 500
    # the pose file was rewritten with a vina score
    assert "vina_score" in open(lig_sdf).read()


def test_angular_hbond_directionality():
    """A donor-acceptor contact at ideal distance scores a (much) stronger
    hbond term when the donor H axis points at the acceptor than when it
    points away — the distance-only term cannot tell them apart."""
    import jax.numpy as jnp
    import numpy as np

    from diffbindfr_tpu.ops import vina

    # two-atom "ligand": C bonded to O-donor; receptor: one acceptor with a
    # neighbor defining its lone-pair axis
    def lig_stub(c_pos, o_pos):
        pad = 8
        pos = np.zeros((pad, 3), np.float32)
        pos[0], pos[1] = c_pos, o_pos
        adj = np.zeros((pad, pad), np.float32)
        adj[0, 1] = adj[1, 0] = 1.0
        lig = vina.VinaLigand(
            radius=jnp.asarray(np.full(pad, 1.6, np.float32)),
            hydro=jnp.zeros(pad),
            donor=jnp.asarray(
                np.array([0, 1] + [0] * (pad - 2), np.float32)),
            acceptor=jnp.zeros(pad),
            mask=jnp.asarray(
                np.array([1, 1] + [0] * (pad - 2), np.float32)),
            intra_mask=jnp.zeros((pad, pad)),
            tor_bonds=jnp.zeros((1, 2), jnp.int32),
            rot_node_mask=jnp.zeros((1, pad)),
            tor_mask=jnp.zeros(1),
            n_rot=jnp.asarray(0.0),
            bond_adj=jnp.asarray(adj),
        )
        return jnp.asarray(pos), lig

    pad_r = 8
    rpos = np.zeros((pad_r, 3), np.float32)
    rpos[0] = [6.0, 0.0, 0.0]   # acceptor
    rpos[1] = [7.4, 0.0, 0.0]   # its neighbor -> lone pair axis = -x
    rec = vina.VinaReceptor(
        pos=jnp.asarray(rpos),
        mask=jnp.asarray(np.array([1, 1] + [0] * (pad_r - 2), np.float32)),
        radius=jnp.asarray(np.full(pad_r, 1.5, np.float32)),
        hydro=jnp.zeros(pad_r),
        donor=jnp.zeros(pad_r),
        acceptor=jnp.asarray(
            np.array([1, 0] + [0] * (pad_r - 2), np.float32)),
        hb_dir=jnp.asarray(
            np.array([[-1, 0, 0]] + [[0, 0, 0]] * (pad_r - 1), np.float32)),
        hb_has=jnp.asarray(
            np.array([1, 0] + [0] * (pad_r - 2), np.float32)),
    )

    # aligned: C behind the donor O, so the implied H points at the acceptor
    pos_good, lig_good = lig_stub([2.0, 0.0, 0.0], [3.1, 0.0, 0.0])
    # misaligned: C on the acceptor side -> H points AWAY from the acceptor
    pos_bad, lig_bad = lig_stub([4.2, 0.0, 0.0], [3.1, 0.0, 0.0])

    e_good = float(vina.inter_energy(pos_good, lig_good, rec,
                                     angular_hb=True))
    e_bad = float(vina.inter_energy(pos_bad, lig_bad, rec,
                                    angular_hb=True))
    # distance-only control: identical donor-acceptor distance
    e0_good = float(vina.inter_energy(pos_good, lig_good, rec))
    e0_bad = float(vina.inter_energy(pos_bad, lig_bad, rec))
    # W_HBOND is negative (favorable): aligned must be lower energy
    assert e_good < e_bad - 0.1, (e_good, e_bad)
    # the hbond component of the distance-only control is identical
    # (the carbon's other terms differ slightly; compare hb via deltas)
    d_ang = e_bad - e_good
    d_dist = e0_bad - e0_good
    assert d_ang > d_dist + 0.1, (d_ang, d_dist)
