"""Pose-discrimination training for the MDN scorer (VERDICT r3 task 2).

A KarmaDock-class scorer must rank pose QUALITY, not just model crystal
contact statistics (reference DiffBindFR/scoring/architecture/
KarmaDock_sc.py:88-102 scoring semantics, trained against generated
poses). The round-3 scorer trained on 4 crystal poses only and failed the
held-out ranking protocol (picked 7.5-8.4 A poses where the oracle had
2.46 A). This module trains on the sampler's OWN pose distribution
(tools/make_scorer_poses.py):

loss per training entry (one pocket/ligand pair + its generated poses):
  * crystal NLL      the existing mdn_loss on the crystal complex (7 A
                     training cutoff) — keeps the mixture calibrated to
                     native contact statistics      [self-dock pairs]
  * pair hinge       relu(margin + nll(good) - nll(bad)) on the 5 A
                     scoring mean-NLL: a near-native pose (L-RMSD <= 2.5,
                     or the crystal) must out-score a decoy (>= 4.0) of
                     the SAME complex                [self-dock pairs]
  * decoy floor      relu(ref + abs_margin - nll(decoy)) where ref is the
                     batch's stop-gradient mean crystal NLL (falling back
                     to a host-maintained EMA when a batch holds no
                     self-dock entry): cross-docked ligands (wrong
                     pocket) must score worse than natives by an absolute
                     margin                          [cross-dock pairs]
  * graded ranking   relu(k*(rmsd_b - rmsd_a) + nll(a) - nll(b)) on a
                     random pose pair of the same complex with a material
                     RMSD gap: the scorer must order the WHOLE pose
                     spectrum, not just the good/bad extremes — this is
                     the statistic top-1 selection actually exercises
                     when all candidates are mediocre  [self-dock pairs]

The hinges optimize exactly the statistic the ranking protocol uses
(reporter.py mdn_nll mode: mean per-contact NLL at the 5 A cutoff).

Round-4 iteration note: the first training run drew batches uniformly
over entries; with 4 self vs 12 cross pairs most batches were cross-only,
where the decoy-floor ref collapsed to 0 and the hinge was trivially
satisfied — ~60% of steps had exactly zero loss (runs/mdn_r4.log).
train_cli now stratifies every batch between self/cross and the ref has
the EMA fallback.
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from .data.sample import Buckets, DockingSample
from .models import mdn_scorer as mdn

GOOD_RMSD = 2.5
BAD_RMSD = 4.0
PAIR_MARGIN = 0.3
ABS_MARGIN = 1.0
W_PAIR = 1.0
W_ABS = 0.5
W_RANK = 1.0
RANK_K = 0.15      # margin per Angstrom of RMSD gap
RANK_MIN_GAP = 0.5


@dataclasses.dataclass
class PoseEntry:
    name: str
    sample: DockingSample
    crystal_a14: np.ndarray  # [R, 14, 3] rebuilt from native chis
    lig_pos: np.ndarray      # [K, NL, 3]
    a14: np.ndarray          # [K, R, 14, 3]
    rmsd: np.ndarray         # [K] (NaN for cross-dock)
    is_self: bool
    bucket: Buckets

    @property
    def good_idx(self) -> np.ndarray:
        return np.nonzero(self.rmsd <= GOOD_RMSD)[0]

    @property
    def bad_idx(self) -> np.ndarray:
        if self.is_self:
            return np.nonzero(self.rmsd >= BAD_RMSD)[0]
        return np.arange(self.lig_pos.shape[0])


def load_pose_entries(pose_dir: str) -> list:
    """Read the make_scorer_poses.py npz set; rebuilds the crystal atom14
    from the native chi angles once per entry (host-side, jitted)."""
    from .sampler import _rebuild_atom14

    rebuild = jax.jit(lambda s: _rebuild_atom14(s, s.torsion_angle[:, 1:]))
    entries = []
    for fn in sorted(os.listdir(pose_dir)):
        if not fn.endswith(".npz"):
            continue
        with np.load(os.path.join(pose_dir, fn)) as d:
            sample = DockingSample(
                **{k: d[f"s_{k}"] for k in DockingSample._fields})
            bucket = Buckets(
                n_lig=int(sample.lig_mask.shape[0]),
                n_lig_edges=int(sample.lig_e_mask.shape[0]),
                n_tor=int(sample.tor_mask.shape[0]),
                n_res=int(sample.res_mask.shape[0]),
                n_atm=int(sample.atm_mask.shape[0]),
            )
            entries.append(PoseEntry(
                name=fn[:-4], sample=sample,
                crystal_a14=np.asarray(rebuild(sample)),
                lig_pos=d["lig_pos"], a14=d["atom14_pos"],
                rmsd=d["l_rmsd"], is_self=bool(d["is_self"]),
                bucket=bucket,
            ))
    return entries


def make_pose_batch(entries: list, idxs, rng, ref_ema: float = 2.0) -> tuple:
    """Stack B entries of one bucket into (samples, good_lig, good_a14,
    bad_lig, bad_a14, crystal_a14, rank_a_lig, rank_a_a14, rank_b_lig,
    rank_b_a14, rank_gap, w_crystal, w_pair, w_abs, w_rank, ref_ema); per
    entry sample one good pose (crystal with p=0.5, else a <= GOOD_RMSD
    pose), one bad pose, and one graded pose pair (two poses of the same
    complex with RMSD gap >= RANK_MIN_GAP, a = the better one)."""
    from .data.sample import stack_samples

    samples, gl, ga, bl, ba, ca = [], [], [], [], [], []
    ral, raa, rbl, rba, rgap = [], [], [], [], []
    w_cr, w_pair, w_abs, w_rank = [], [], [], []
    for i in idxs:
        e = entries[i]
        s = e.sample
        samples.append(s)
        ca.append(e.crystal_a14)
        good = e.good_idx
        bad = e.bad_idx
        if e.is_self and len(good) and rng.random() < 0.5:
            gi = int(rng.choice(good))
            gl.append(e.lig_pos[gi])
            ga.append(e.a14[gi])
        else:
            gl.append(np.asarray(s.lig_pos))  # crystal pose
            ga.append(e.crystal_a14)
        if len(bad):
            bi = int(rng.choice(bad))
            bl.append(e.lig_pos[bi])
            ba.append(e.a14[bi])
            pair_ok = 1.0 if e.is_self else 0.0
            abs_ok = 0.0 if e.is_self else 1.0
        else:  # no decoy available: hinges off
            bl.append(np.asarray(s.lig_pos))
            ba.append(e.crystal_a14)
            pair_ok = abs_ok = 0.0
        # graded pair: two scored poses with a material RMSD gap
        rank_ok = 0.0
        if e.is_self and e.lig_pos.shape[0] >= 2:
            ii, jj = rng.choice(e.lig_pos.shape[0], size=2, replace=False)
            if e.rmsd[ii] > e.rmsd[jj]:
                ii, jj = jj, ii  # ii = better (lower RMSD)
            gap = float(e.rmsd[jj] - e.rmsd[ii])
            if gap >= RANK_MIN_GAP:
                rank_ok = 1.0
                ral.append(e.lig_pos[ii]); raa.append(e.a14[ii])
                rbl.append(e.lig_pos[jj]); rba.append(e.a14[jj])
                rgap.append(gap)
        if not rank_ok:
            ral.append(np.asarray(s.lig_pos)); raa.append(e.crystal_a14)
            rbl.append(np.asarray(s.lig_pos)); rba.append(e.crystal_a14)
            rgap.append(0.0)
        w_cr.append(1.0 if e.is_self else 0.0)
        w_pair.append(pair_ok)
        w_abs.append(abs_ok)
        w_rank.append(rank_ok)
    return (
        stack_samples(samples),
        np.stack(gl), np.stack(ga), np.stack(bl), np.stack(ba),
        np.stack(ca),
        np.stack(ral), np.stack(raa), np.stack(rbl), np.stack(rba),
        np.asarray(rgap, np.float32),
        np.asarray(w_cr, np.float32), np.asarray(w_pair, np.float32),
        np.asarray(w_abs, np.float32), np.asarray(w_rank, np.float32),
        np.float32(ref_ema),
    )


def make_pose_loss(cfg: mdn.MDNConfig):
    """Batched pose-discrimination loss (jit per bucket)."""

    def scoring_nll(p, s, lig_pos, a14):
        _, mean_nll = mdn.score_sample_both(p, cfg, s, lig_pos, a14)
        return mean_nll

    def loss_fn(p, batch: tuple):
        (s, gl, ga, bl, ba, ca, ral, raa, rbl, rba, rgap,
         w_cr, w_pair, w_abs, w_rank, ref_ema) = batch
        nll_cr_train = jax.vmap(
            lambda s_, ca_: mdn.mdn_loss(p, cfg, s_, s_.lig_pos, ca_)
        )(s, ca)
        nll_good = jax.vmap(
            lambda s_, lp_, a_: scoring_nll(p, s_, lp_, a_))(s, gl, ga)
        nll_bad = jax.vmap(
            lambda s_, lp_, a_: scoring_nll(p, s_, lp_, a_))(s, bl, ba)
        nll_ra = jax.vmap(
            lambda s_, lp_, a_: scoring_nll(p, s_, lp_, a_))(s, ral, raa)
        nll_rb = jax.vmap(
            lambda s_, lp_, a_: scoring_nll(p, s_, lp_, a_))(s, rbl, rba)
        # absolute decoy floor reference: batch mean native scoring NLL,
        # host EMA when the batch has no self-dock entry (a 0 ref made
        # the floor trivially satisfied in cross-only batches)
        nll_cr_score = jax.vmap(
            lambda s_, ca_: scoring_nll(p, s_, s_.lig_pos, ca_))(s, ca)
        n_self = jnp.sum(w_cr)
        batch_ref = jnp.sum(w_cr * nll_cr_score) / jnp.maximum(n_self, 1.0)
        ref = jax.lax.stop_gradient(
            jnp.where(n_self > 0, batch_ref, ref_ema))
        pair_hinge = jnp.maximum(PAIR_MARGIN + nll_good - nll_bad, 0.0)
        abs_hinge = jnp.maximum(ref + ABS_MARGIN - nll_bad, 0.0)
        rank_hinge = jnp.maximum(RANK_K * rgap + nll_ra - nll_rb, 0.0)
        per = (w_cr * nll_cr_train
               + W_PAIR * w_pair * pair_hinge
               + W_ABS * w_abs * abs_hinge
               + W_RANK * w_rank * rank_hinge)
        denom = jnp.maximum(jnp.sum(w_cr + w_pair + w_abs + w_rank), 1.0)
        metrics = {
            "loss": jnp.sum(per) / denom,
            "nll_crystal": jnp.sum(w_cr * nll_cr_train)
            / jnp.maximum(jnp.sum(w_cr), 1.0),
            "pair_hinge": jnp.sum(w_pair * pair_hinge)
            / jnp.maximum(jnp.sum(w_pair), 1.0),
            "abs_hinge": jnp.sum(w_abs * abs_hinge)
            / jnp.maximum(jnp.sum(w_abs), 1.0),
            "rank_hinge": jnp.sum(w_rank * rank_hinge)
            / jnp.maximum(jnp.sum(w_rank), 1.0),
            "ref_native": batch_ref,
            "n_self": n_self,
        }
        return metrics["loss"], metrics

    return loss_fn
