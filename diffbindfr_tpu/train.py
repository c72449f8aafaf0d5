"""Denoising score-matching training for the docking diffusion model.

The public reference ships inference only — DiffBindFR.forward_train is
gutted (druglib/models/Docking/scFlex.py:59-64) — so the objective is
reconstructed from the score-based generative modeling conventions the
model was built for (DiffDock-style, matching the network's
scale_by_sigma output normalization, tpscore.py:554-569):

  per sample, draw t ~ U(0,1), sigmas = geometric schedule(t), perturb
    * ligand translation  Delta ~ N(0, sigma_tr^2 I)
    * ligand rotation     omega ~ IGSO(3)(sigma_rot)   (on-device table)
    * ligand torsions     dtau  ~ wrapped-N(0, sigma_tor)
    * side-chain chis     dchi  ~ wrapped-N(0, sigma_sc)
  targets are the perturbation-kernel scores; each manifold's MSE is
  normalized by the expected score magnitude so the four losses are O(1):
    tr:  | sigma * (pred - (-Delta/sigma^2)) |^2
    rot: | (pred - score_vec(sigma, omega)) / score_norm(sigma) |^2
    tor: | (pred - torus_score(dtau, sigma)) / sqrt(torus_norm) |^2  (masked)
    sc:  same as tor over the chi mask.

The train step is a pure function (params, opt_state, batch, key) ->
(params, opt_state, metrics) designed to be pjit-ed with the batch sharded
over the replica mesh axis; gradient all-reduce is inserted by the
compiler. EMA replaces the reference's EMAHook (hooks/ema.py:135).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .data.sample import DockingSample
from .geometry import so3, torus
from .geometry.rotations import wrap_angle
from .geometry.torsion import modify_conformer
from .models import score_net as sn
from .sampler import SamplerConfig, _pack_atoms, _rebuild_atom14


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-3
    warmup_steps: int = 1000
    total_steps: int = 300_000
    grad_clip: float = 1.0
    ema_decay: float = 0.999
    weight_tr: float = 1.0
    weight_rot: float = 1.0
    weight_tor: float = 1.0
    weight_sc: float = 1.0
    t_min: float = 0.0  # sample t in [t_min, 1]


class TrainState(NamedTuple):
    params: dict
    ema_params: dict
    opt_state: tuple
    step: jnp.ndarray


# ---------------------------------------------------------------------------
# forward diffusion (single sample; vmapped)
# ---------------------------------------------------------------------------


class Perturbation(NamedTuple):
    tr: jnp.ndarray  # [3]
    rot: jnp.ndarray  # [3] rotation vector
    tor: jnp.ndarray  # [T]
    sc: jnp.ndarray  # [R, 4]


def perturb_sample(key, s: DockingSample, sig: sn.Sigmas):
    """Apply forward noise at level sig to the clean pose in `s`."""
    k_tr, k_rot, k_tor, k_sc = jax.random.split(key, 4)
    delta = Perturbation(
        tr=jax.random.normal(k_tr, (3,)) * sig.tr,
        rot=so3.sample_vec(k_rot, sig.rot),
        tor=torus.sample(k_tor, sig.tor, (s.tor_mask.shape[0],)) * s.tor_mask,
        sc=torus.sample(k_sc, sig.sc_tor, s.chi_mask.shape) * s.chi_mask,
    )
    lig_pos = modify_conformer(
        s.lig_pos,
        s.lig_mask.astype(bool),
        delta.tr,
        delta.rot,
        jnp.stack([s.tor_src, s.tor_dst], axis=-1),
        s.rot_node_mask.astype(bool),
        delta.tor,
        s.tor_mask.astype(bool),
    )
    chi0 = s.torsion_angle[:, 1:]
    chi = wrap_angle(chi0 + delta.sc)
    atm_pos = _pack_atoms(s, _rebuild_atom14(s, chi))
    noisy = s._replace(
        lig_pos=lig_pos,
        atm_pos=atm_pos,
        torsion_angle=jnp.concatenate([s.torsion_angle[:, :1], chi], axis=-1),
    )
    return noisy, delta


def score_targets(delta: Perturbation, sig: sn.Sigmas):
    """Perturbation-kernel scores on each manifold."""
    return Perturbation(
        tr=-delta.tr / sig.tr**2,
        rot=so3.score_vec(sig.rot, delta.rot),
        tor=torus.score(delta.tor, sig.tor),
        sc=torus.score(delta.sc, sig.sc_tor),
    )


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------


def loss_fn(
    params,
    net_cfg: sn.ScoreNetConfig,
    scfg: SamplerConfig,
    tcfg: TrainConfig,
    batch: DockingSample,
    key: jax.Array,
):
    bsz = batch.lig_pos.shape[0]
    k_t, k_noise = jax.random.split(key)
    t = jax.random.uniform(k_t, (bsz,), minval=tcfg.t_min, maxval=1.0)
    sig = jax.vmap(lambda tt: sn.sigmas_from_t(tt, scfg.schedule))(t)

    noisy, delta = jax.vmap(perturb_sample)(
        jax.random.split(k_noise, bsz), batch, sig
    )
    target = jax.vmap(score_targets)(delta, sig)
    pred = sn.apply_batched(params, net_cfg, noisy, t, sig)

    # normalizers (per sample)
    rot_norm = so3.score_norm(sig.rot)  # [B]
    tor_norm = jnp.sqrt(torus.score_norm(sig.tor))
    sc_norm = jnp.sqrt(torus.score_norm(sig.sc_tor))

    tr_loss = jnp.mean(jnp.sum((pred.tr - target.tr) ** 2 * sig.tr[:, None] ** 2, -1))
    rot_loss = jnp.mean(
        jnp.sum(((pred.rot - target.rot) / rot_norm[:, None]) ** 2, -1)
    )

    tmask = batch.tor_mask
    tor_se = ((pred.tor - target.tor) / tor_norm[:, None]) ** 2 * tmask
    tor_loss = jnp.sum(tor_se) / jnp.maximum(jnp.sum(tmask), 1.0)

    cmask = batch.chi_mask
    sc_se = ((pred.sc_tor - target.sc) / sc_norm[:, None, None]) ** 2 * cmask
    sc_loss = jnp.sum(sc_se) / jnp.maximum(jnp.sum(cmask), 1.0)

    loss = (
        tcfg.weight_tr * tr_loss
        + tcfg.weight_rot * rot_loss
        + tcfg.weight_tor * tor_loss
        + tcfg.weight_sc * sc_loss
    )
    metrics = {
        "loss": loss,
        "tr_loss": tr_loss,
        "rot_loss": rot_loss,
        "tor_loss": tor_loss,
        "sc_loss": sc_loss,
    }
    return loss, metrics


# ---------------------------------------------------------------------------
# optimizer / step
# ---------------------------------------------------------------------------


def make_optimizer(tcfg: TrainConfig):
    warmup = min(tcfg.warmup_steps, max(tcfg.total_steps // 2, 1))
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tcfg.lr,
        warmup_steps=warmup,
        decay_steps=max(tcfg.total_steps, warmup + 1),
    )
    return optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.adam(sched),
    )


def init_state(key, net_cfg: sn.ScoreNetConfig, tcfg: TrainConfig) -> TrainState:
    params = sn.init_params(key, net_cfg)
    opt = make_optimizer(tcfg)
    return TrainState(
        params=params,
        ema_params=jax.tree.map(lambda x: x, params),
        opt_state=opt.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_eval_step(net_cfg: sn.ScoreNetConfig, scfg: SamplerConfig, tcfg: TrainConfig):
    """Held-out DSM loss (no update). The TPU-native EvalHook counterpart
    (druglib/core/runner/hooks/evaluation.py): call with FIXED keys across
    evaluations so the val curve is comparable step to step."""

    def eval_step(params, batch: DockingSample, key: jax.Array):
        _, metrics = loss_fn(params, net_cfg, scfg, tcfg, batch, key)
        return metrics

    return eval_step


def make_train_step(net_cfg: sn.ScoreNetConfig, scfg: SamplerConfig, tcfg: TrainConfig):
    opt = make_optimizer(tcfg)

    def train_step(state: TrainState, batch: DockingSample, key: jax.Array):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, net_cfg, scfg, tcfg, batch, key
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        d = tcfg.ema_decay
        ema = jax.tree.map(
            lambda e, p: e * d + p * (1.0 - d), state.ema_params, params
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, ema, opt_state, state.step + 1), metrics

    return train_step
