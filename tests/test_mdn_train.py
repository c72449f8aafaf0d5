"""Pose-discrimination MDN training (mdn_train.py, VERDICT r3 task 2):
pose-set loading, batch construction, and hinge-loss semantics on a real
3dbs sample with synthetic pose labels."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbindfr_tpu import mdn_train as MT
from diffbindfr_tpu.models import mdn_scorer as mdn

FWD = "/root/reference/examples/forward"
CFG = mdn.MDNConfig(hidden=32, gvp_layers=2, gt_layers=2,
                    pro_vector_hidden=4)


@pytest.fixture(scope="module")
def pose_dir(tmp_path_factory):
    """Fake make_scorer_poses.py output: one self-dock + one cross-dock
    entry built from the real 3dbs sample with jittered poses."""
    from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
    from diffbindfr_tpu.chem.mol import perceive
    from diffbindfr_tpu.chem.protein_feats import build_pocket_record
    from diffbindfr_tpu.data import make_sample
    from diffbindfr_tpu.io.pdb import parse_pdb
    from diffbindfr_tpu.io.sdf import parse_sdf

    prot = parse_pdb(os.path.join(FWD, "3dbs_protein.pdb"))
    lig = featurize_ligand(
        perceive(parse_sdf(os.path.join(FWD, "3dbs_protein_crystal.sdf"))[0]),
        "3dbs")
    pocket = build_pocket_record(prot, lig.pos, cutoff=8.0)
    lig.pos = lig.pos - pocket.center
    s = make_sample(lig, pocket)

    rng = np.random.default_rng(0)
    k, nl = 6, s.lig_pos.shape[0]
    r = s.aatype.shape[0]
    jitter = rng.normal(size=(k, nl, 3)).astype(np.float32)
    poses = s.lig_pos[None] + jitter * np.float32([0.1, 0.2, 3.0, 4.0,
                                                   5.0, 0.15])[:, None, None]
    # per-pose receptors: the prep atom14 (already pocket-frame), padded
    # to the sample's bucket n_res
    a14_pad = np.zeros((r, 14, 3), np.float32)
    a14_pad[: pocket.atom14_pos.shape[0]] = pocket.atom14_pos
    a14 = np.repeat(a14_pad[None], k, 0)
    rmsd = np.array([0.4, 0.9, 8.0, 9.5, 11.0, 0.6], np.float32)

    d = tmp_path_factory.mktemp("poses")
    base = {f"s_{key}": v for key, v in s._asdict().items()}
    np.savez(d / "3dbs__3dbs.npz", **base, lig_pos=poses, atom14_pos=a14,
             l_rmsd=rmsd, is_self=np.array(True))
    np.savez(d / "3dbs__other.npz", **base, lig_pos=poses[:2],
             atom14_pos=a14[:2], l_rmsd=np.full(2, np.nan, np.float32),
             is_self=np.array(False))
    return str(d)


def test_load_and_pools(pose_dir):
    entries = MT.load_pose_entries(pose_dir)
    assert len(entries) == 2
    self_e = next(e for e in entries if e.is_self)
    cross_e = next(e for e in entries if not e.is_self)
    assert list(self_e.good_idx) == [0, 1, 5]
    assert list(self_e.bad_idx) == [2, 3, 4]
    assert list(cross_e.bad_idx) == [0, 1]  # every cross pose is a decoy
    assert len(cross_e.good_idx) == 0
    # crystal receptor rebuilt from native chis: finite, in-pocket scale
    assert np.isfinite(self_e.crystal_a14).all()
    assert self_e.bucket.n_lig == self_e.sample.lig_mask.shape[0]


def test_batch_and_loss_semantics(pose_dir):
    entries = MT.load_pose_entries(pose_dir)
    rng = np.random.default_rng(3)
    batch = jax.tree.map(
        jnp.asarray, MT.make_pose_batch(entries, [0, 1], rng))
    (s, gl, ga, bl, ba, ca, ral, raa, rbl, rba, rgap,
     w_cr, w_pair, w_abs, w_rank, ref_ema) = batch
    assert gl.shape == bl.shape == (2,) + entries[0].sample.lig_pos.shape
    # weight semantics: self entry trains crystal NLL + pair hinge; cross
    # entry only the absolute decoy floor
    by_pair = {bool(w): i for i, w in enumerate(np.asarray(w_cr) > 0)}
    i_self, i_cross = by_pair[True], by_pair[False]
    assert float(w_pair[i_self]) == 1.0 and float(w_abs[i_self]) == 0.0
    assert float(w_pair[i_cross]) == 0.0 and float(w_abs[i_cross]) == 1.0
    # graded ranking pair: only self-dock entries with a material gap;
    # a = the better pose of the two
    assert float(w_rank[i_cross]) == 0.0
    if float(w_rank[i_self]):
        assert float(rgap[i_self]) >= MT.RANK_MIN_GAP

    params = mdn.init_params(jax.random.PRNGKey(0), CFG)
    loss_fn = MT.make_pose_loss(CFG)
    (loss, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params, batch)
    assert np.isfinite(float(loss))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # gradients flow into both encoders and the MDN head
    gnorm = jax.tree.map(lambda g: float(jnp.abs(g).max()), grads)
    assert max(jax.tree.leaves(gnorm)) > 0.0

    # hinge semantics: when good == bad the pair hinge sits at the margin
    same = (s, gl, ga, gl, ga, ca, ral, raa, rbl, rba, rgap,
            w_cr, w_pair, w_abs, w_rank, ref_ema)
    _, m2 = loss_fn(params, same)
    np.testing.assert_allclose(float(m2["pair_hinge"]), MT.PAIR_MARGIN,
                               atol=1e-5)
    # graded hinge: identical pose pair at gap g sits at RANK_K * g
    same_rank = (s, gl, ga, bl, ba, ca, ral, raa, ral, raa,
                 jnp.ones_like(rgap), w_cr, w_pair, w_abs,
                 jnp.ones_like(w_rank), ref_ema)
    _, m3 = loss_fn(params, same_rank)
    np.testing.assert_allclose(float(m3["rank_hinge"]), MT.RANK_K,
                               atol=1e-5)


def test_cross_only_batch_uses_ema_ref(pose_dir):
    """A batch with no self-dock entry must fall back to the host EMA for
    the decoy floor (a 0 ref made the hinge trivially satisfied — the
    round-4 zero-loss-steps bug)."""
    entries = MT.load_pose_entries(pose_dir)
    i_cross = next(i for i, e in enumerate(entries) if not e.is_self)
    rng = np.random.default_rng(5)
    params = mdn.init_params(jax.random.PRNGKey(0), CFG)
    loss_fn = MT.make_pose_loss(CFG)
    batch = jax.tree.map(jnp.asarray, MT.make_pose_batch(
        entries, [i_cross, i_cross], rng, ref_ema=50.0))
    (loss, m), = [jax.jit(loss_fn)(params, batch)]
    # with an absurdly high EMA ref the floor hinge MUST be active
    assert float(m["abs_hinge"]) > 10.0
    assert float(m["n_self"]) == 0.0
