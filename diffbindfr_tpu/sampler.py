"""Reverse-diffusion sampler: the TPU-native DiffBindFR.sample().

Replaces the reference's host-driven python loop
(druglib/models/Docking/scFlex.py:124-250: deepcopy per step, CPU numpy
sigma-table lookups, per-graph python ligand updates) with one jitted
`lax.scan` over diffusion steps. State = (lig_pos, chi_angles, rng); every
update — Euler-Maruyama on R^3 / SO(3) / T^m / T^{4N}, torsion application
with Kabsch disentanglement, AF2-algorithm-24 side-chain rebuild — runs
on-device with static shapes. The batch axis is vmapped and can be sharded
over a mesh with pjit (see parallel/).

Prior initialization (LigInit / SCProtInit, druglib/datasets/Docking/
struct_init.py:15-141) is also on-device so a fresh pose costs no host
round-trip: uniform torsions, uniform SO(3) rotation, centroid translation
~ N(0, tr_sigma_max_init), uniform chi angles.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .data.sample import DockingSample
from .geometry import chi as chi_geo
from .geometry import so3
from .geometry.rotations import random_rotation
from .geometry.torsion import modify_conformer
from .models import score_net as sn


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    kind: str = "sde"  # 'sde' | 'ode'
    inference_steps: int = 22
    actual_steps: int = 20
    eps: float = 1e-5
    no_random: bool = False
    no_final_step_noise: bool = True
    tr_sigma_min: float = 0.1
    tr_sigma_max: float = 6.0
    rot_sigma_min: float = 0.03
    rot_sigma_max: float = 1.55
    tor_sigma_min: float = 0.0314
    tor_sigma_max: float = 3.14
    sc_tor_sigma_min: float = 0.0314
    sc_tor_sigma_max: float = 3.14
    tr_sigma_max_init: float = 10.0  # LigInit override (configs/diffbindfr_ts.py:70)

    @property
    def schedule(self) -> dict:
        return {
            "tr_sigma_min": self.tr_sigma_min,
            "tr_sigma_max": self.tr_sigma_max,
            "rot_sigma_min": self.rot_sigma_min,
            "rot_sigma_max": self.rot_sigma_max,
            "tor_sigma_min": self.tor_sigma_min,
            "tor_sigma_max": self.tor_sigma_max,
            "sc_tor_sigma_min": self.sc_tor_sigma_min,
            "sc_tor_sigma_max": self.sc_tor_sigma_max,
        }


class SampleResult(NamedTuple):
    lig_pos: jnp.ndarray  # [B, NL, 3] final ligand pose (pocket frame)
    atom14_pos: jnp.ndarray  # [B, R, 14, 3] final pocket side chains
    chi: jnp.ndarray  # [B, R, 4] final chi angles
    lig_traj: jnp.ndarray | None  # [S, B, NL, 3] if requested
    atom14_traj: jnp.ndarray | None  # [S, B, R, 14, 3]


# ---------------------------------------------------------------------------
# prior initialization (single sample; vmap over batch)
# ---------------------------------------------------------------------------


def _rebuild_atom14(s: DockingSample, chi: jnp.ndarray) -> jnp.ndarray:
    """chi [R, 4] radians -> atom14 positions [R, 14, 3]."""
    tors = jnp.concatenate([s.torsion_angle[:, :1], chi], axis=-1)  # [R, 5]
    sincos = jnp.stack([jnp.sin(tors), jnp.cos(tors)], axis=-1)
    return chi_geo.build_atom14(
        sincos,
        s.backbone_rots,
        s.backbone_transl,
        s.default_frame,
        s.template_pos,
        s.group_idx,
        s.atom14_mask,
    )


def _pack_atoms(s: DockingSample, atom14: jnp.ndarray) -> jnp.ndarray:
    """Scatter rebuilt atom14 into the packed atom cloud layout."""
    flat = atom14.reshape(-1, 3)
    return flat[s.pack_flat] * s.atm_mask[:, None]


def init_pose(key: jax.Array, s: DockingSample, cfg: SamplerConfig):
    """LigInit + SCProtInit: returns (lig_pos [NL,3], chi [R,4], atm_pos)."""
    k_tor, k_rot, k_tr, k_chi = jax.random.split(key, 4)

    nt = s.tor_mask.shape[0]
    torsions = jax.random.uniform(k_tor, (nt,), minval=-jnp.pi, maxval=jnp.pi)
    rot_vec = so3_uniform(k_rot)
    tr = jax.random.normal(k_tr, (3,)) * cfg.tr_sigma_max_init

    # start from the reference conformer, randomize torsions about centroid,
    # then random rigid rotation + translation (struct_init.py:15-59)
    pos = modify_conformer(
        s.lig_ref_pos,
        s.lig_mask.astype(bool),
        jnp.zeros(3),
        rot_vec,
        jnp.stack([s.tor_src, s.tor_dst], axis=-1),
        s.rot_node_mask.astype(bool),
        torsions,
        s.tor_mask.astype(bool),
    )
    # recenter at origin (pocket frame) then apply prior translation
    w = s.lig_mask[:, None]
    n = jnp.maximum(w.sum(), 1.0)
    centroid = (pos * w).sum(0) / n
    pos = (pos - centroid + tr) * w

    chi = jax.random.uniform(k_chi, s.chi_mask.shape, minval=-jnp.pi, maxval=jnp.pi)
    chi = jnp.where(s.chi_mask > 0, chi, s.torsion_angle[:, 1:])
    atm_pos = _pack_atoms(s, _rebuild_atom14(s, chi))
    return pos, chi, atm_pos


def so3_uniform(key: jax.Array) -> jnp.ndarray:
    """Uniform random rotation as an axis-angle vector."""
    R = random_rotation(key)
    from .geometry.rotations import matrix_to_axis_angle

    return matrix_to_axis_angle(R)


# ---------------------------------------------------------------------------
# reverse SDE / probability-flow ODE
# ---------------------------------------------------------------------------


def t_schedule(cfg: SamplerConfig) -> jnp.ndarray:
    """Linear 1 -> eps grid, inference_steps + 1 points (scFlex.py:83-91)."""
    return jnp.linspace(1.0, cfg.eps, cfg.inference_steps + 1)


def sample(
    params,
    net_cfg: sn.ScoreNetConfig,
    cfg: SamplerConfig,
    batch: DockingSample,  # [B, ...]
    key: jax.Array,
    init: tuple | None = None,  # optional (lig_pos, chi, atm_pos) [B, ...]
    keep_trajectory: bool = False,
) -> SampleResult:
    """Run the reverse diffusion for a batch. Fully jittable."""
    bsz = batch.lig_pos.shape[0]

    if init is None:
        keys = jax.random.split(key, bsz + 1)
        key = keys[0]
        lig_pos, chi, atm_pos = jax.vmap(lambda k, s: init_pose(k, s, cfg))(
            keys[1:], batch
        )
    else:
        lig_pos, chi, atm_pos = init

    ts = t_schedule(cfg)
    t_now = ts[: cfg.actual_steps]
    dts = ts[: cfg.actual_steps] - ts[1 : cfg.actual_steps + 1]
    is_last = jnp.arange(cfg.actual_steps) == cfg.actual_steps - 1

    import math

    tr_g_scale = math.sqrt(2.0 * math.log(cfg.tr_sigma_max / cfg.tr_sigma_min))
    rot_g_scale = 2.0 * math.sqrt(math.log(cfg.rot_sigma_max / cfg.rot_sigma_min))
    tor_g_scale = math.sqrt(2.0 * math.log(cfg.tor_sigma_max / cfg.tor_sigma_min))
    sc_g_scale = math.sqrt(
        2.0 * math.log(cfg.sc_tor_sigma_max / cfg.sc_tor_sigma_min)
    )

    def step(state, xs):
        lig_pos, chi, atm_pos, key = state
        t, dt, last = xs
        key, k_tr, k_rot, k_tor, k_sc = jax.random.split(key, 5)

        sig = sn.sigmas_from_t(t, cfg.schedule)
        sig_b = sn.Sigmas(*[jnp.broadcast_to(v, (bsz,)) for v in sig])
        data = batch._replace(lig_pos=lig_pos, atm_pos=atm_pos)
        out = sn.apply_batched(params, net_cfg, data, jnp.full((bsz,), t), sig_b)

        tr_g = sig.tr * tr_g_scale
        rot_g = sig.rot * rot_g_scale
        tor_g = sig.tor * tor_g_scale
        sc_g = sig.sc_tor * sc_g_scale

        if cfg.kind == "ode":
            tr_p = 0.5 * tr_g**2 * out.tr * dt
            rot_p = 0.5 * rot_g**2 * out.rot * dt
            tor_p = 0.5 * tor_g**2 * out.tor * dt
            sc_p = 0.5 * sc_g**2 * out.sc_tor * dt
        else:
            quiet = jnp.logical_or(cfg.no_random, cfg.no_final_step_noise & last)
            nz = (1.0 - quiet.astype(jnp.float32))
            z_tr = jax.random.normal(k_tr, out.tr.shape) * nz
            z_rot = jax.random.normal(k_rot, out.rot.shape) * nz
            z_tor = jax.random.normal(k_tor, out.tor.shape) * nz
            z_sc = jax.random.normal(k_sc, out.sc_tor.shape) * nz
            sdt = jnp.sqrt(dt)
            tr_p = tr_g**2 * out.tr * dt + tr_g * sdt * z_tr
            rot_p = rot_g**2 * out.rot * dt + rot_g * sdt * z_rot
            tor_p = tor_g**2 * out.tor * dt + tor_g * sdt * z_tor
            sc_p = sc_g**2 * out.sc_tor * dt + sc_g * sdt * z_sc

        new_lig = jax.vmap(
            lambda s, p, trp, rotp, torp: modify_conformer(
                p,
                s.lig_mask.astype(bool),
                trp,
                rotp,
                jnp.stack([s.tor_src, s.tor_dst], axis=-1),
                s.rot_node_mask.astype(bool),
                torp,
                s.tor_mask.astype(bool),
            )
        )(batch, lig_pos, tr_p, rot_p, tor_p)

        new_chi = chi + sc_p * batch.chi_mask
        atom14 = jax.vmap(_rebuild_atom14)(batch, new_chi)
        new_atm = jax.vmap(_pack_atoms)(batch, atom14)

        ys = (new_lig, atom14) if keep_trajectory else None
        return (new_lig, new_chi, new_atm, key), ys

    (lig_pos, chi, atm_pos, _), traj = jax.lax.scan(
        step, (lig_pos, chi, atm_pos, key), (t_now, dts, is_last)
    )
    atom14 = jax.vmap(_rebuild_atom14)(batch, chi)
    return SampleResult(
        lig_pos=lig_pos,
        atom14_pos=atom14,
        chi=chi,
        lig_traj=traj[0] if keep_trajectory else None,
        atom14_traj=traj[1] if keep_trajectory else None,
    )
