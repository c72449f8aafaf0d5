"""Generate the numeric-regression golden fixtures (VERDICT r4 task 6).

Records fixed-seed CPU results for the three numerics-critical kernels the
round-4 "exactness-preserving" optimizations touched (one-hot gathers,
hoisted pair tables — ROUND4_NOTES sections 7-9):

  (a) a 20-step SDE sampler trajectory on the real 3dbs pair (tiny net,
      seed-0 init): final pose + chi + an f64 trajectory checksum,
  (b) a batch of EC (vina minimize) affinities from seeded perturbed
      crystal poses: affinity vector + minimized-pose checksum,
  (c) MDN scores (mdn + mdn_nll) of the crystal pose under seed-2 params.

tests/test_goldens.py replays the same computations and compares against
the recorded values — the tripwire the next exactness-preserving
optimization diffs against instead of ad-hoc screen comparisons.

Regenerate ONLY for an intended numerics change (state the reason in the
commit message):  python tools/make_goldens.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "goldens.npz")


def compute_goldens() -> dict:
    """Shared by the generator and the test: every value is a deterministic
    fixed-seed CPU computation on the real 3dbs example."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
    from diffbindfr_tpu.chem.mol import perceive
    from diffbindfr_tpu.chem.protein_feats import build_pocket_record
    from diffbindfr_tpu.data import make_sample, stack_samples
    from diffbindfr_tpu.io.pdb import parse_pdb
    from diffbindfr_tpu.io.sdf import parse_sdf
    from diffbindfr_tpu.models import mdn_scorer as mdn
    from diffbindfr_tpu.models import score_net as sn
    from diffbindfr_tpu.ops import vina
    from diffbindfr_tpu.sampler import SamplerConfig, sample

    FWD = "/root/reference/examples/forward"
    prot = parse_pdb(f"{FWD}/3dbs_protein.pdb")
    lig = featurize_ligand(
        perceive(parse_sdf(f"{FWD}/3dbs_protein_crystal.sdf")[0]), "3dbs")
    pocket = build_pocket_record(prot, lig.pos, cutoff=8.0)
    lig.pos = lig.pos - pocket.center
    s = make_sample(lig, pocket)
    out: dict = {}

    # ---- (a) 20-step SDE sampler trajectory, tiny net, batch of 2
    net_cfg = sn.ScoreNetConfig(ns=8, nv=4, num_conv_layers=2,
                                compute_dtype="float32", dropout=0.0)
    scfg = SamplerConfig(inference_steps=22, actual_steps=20)
    params = sn.init_params(jax.random.PRNGKey(0), net_cfg)
    batch = stack_samples([s, s])
    res = jax.jit(
        lambda p, b, k: sample(p, net_cfg, scfg, b, k,
                               keep_trajectory=True)
    )(params, batch, jax.random.PRNGKey(5))
    out["sampler_lig_pos"] = np.asarray(res.lig_pos, np.float32)
    out["sampler_chi"] = np.asarray(res.chi, np.float32)
    out["sampler_traj_checksum"] = np.float64(
        np.asarray(res.lig_traj, np.float64).sum())
    out["sampler_a14_checksum"] = np.float64(
        np.asarray(res.atom14_pos, np.float64).sum())

    # ---- (b) EC affinities over seeded perturbed crystal poses
    npad, B = 64, 4
    vlig = vina.build_ligand(lig, pad_atoms=npad, pad_tor=8)
    vrec = vina.build_receptor(pocket, pad_atoms=512)
    crystal = np.zeros((npad, 3), np.float32)
    crystal[: lig.num_atoms] = lig.pos
    rng = np.random.default_rng(9)
    poses = np.stack([
        crystal + rng.normal(scale=0.6, size=crystal.shape).astype(
            np.float32) * np.asarray(vlig.mask)[:, None]
        for _ in range(B)])
    ligs = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), vlig)
    recs = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), vrec)
    pos_min, aff = jax.jit(
        lambda c, l, r: vina.minimize_batch(c, l, r, steps=60)
    )(jnp.asarray(poses), ligs, recs)
    out["ec_affinities"] = np.asarray(aff, np.float32).reshape(B)
    out["ec_pose_checksum"] = np.float64(
        np.asarray(pos_min, np.float64).sum())

    # ---- (c) MDN scores of the crystal pose
    mcfg = mdn.MDNConfig()
    mparams = mdn.init_params(jax.random.PRNGKey(2), mcfg)
    pos14 = np.zeros(np.asarray(s.atom14_mask).shape + (3,), np.float32)
    pos14[: pocket.num_res] = (
        pocket.atom14_pos * pocket.atom14_mask[..., None])
    sc, nll = jax.jit(
        lambda p, s_, lp, p14: mdn.score_sample_both(p, mcfg, s_, lp, p14)
    )(mparams, s, jnp.asarray(s.lig_pos), jnp.asarray(pos14))
    out["mdn_score"] = np.float64(sc)
    out["mdn_nll"] = np.float64(nll)
    return out


def main():
    vals = compute_goldens()
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez(FIXTURE, **vals)
    for k, v in vals.items():
        v = np.asarray(v)
        print(f"{k}: shape {v.shape}, "
              f"{'value ' + repr(float(v)) if v.ndim == 0 else 'sum %.6f' % v.sum()}")
    print(f"-> {FIXTURE}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
