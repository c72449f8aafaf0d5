"""Full KarmaDock model family: pose prediction + scoring.

Completes the reference architecture beyond the inference-only
encoding+MDN path (DiffBindFR/scoring/architecture/KarmaDock_sc.py:13-102
uses only those two stages): EGNN ligand-pose refinement layers
(EGNN_Block.py:8), gated residual fusion (Gate_Block.py), and the
AlphaFold-style torsion AngleResnet (Angle_ResNet.py) are provided here
TPU-natively so the one-shot docking model family can be trained and run
in this framework as well.

All blocks are fixed-shape, mask-aware, single-sample functions (vmap
over the batch), sharing the DockingSample schema and the encoders in
mdn_scorer.py.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..data.sample import DockingSample
from ..nn import layers as L
from . import mdn_scorer as mdn


@dataclasses.dataclass(frozen=True)
class KarmaDockConfig:
    mdn: mdn.MDNConfig = mdn.MDNConfig()
    egnn_layers: int = 8
    egnn_heads: int = 4
    cross_cutoff: float = 10.0  # lig-protein edges for pose refinement


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _gate_init(key, dim):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w1": L.linear_init(k1, 2 * dim, dim),
        "w2": L.linear_init(k2, dim, dim),
        "ln": k3,  # placeholder-free; scalar LN is parameterless here
    }


def gate_apply(p, old, new):
    """Gated residual fusion (Gate_Block semantics): g = sigmoid(W[old,new]);
    out = LN(old + g * W2(new))."""
    g = jax.nn.sigmoid(
        L.linear_apply(p["w1"], jnp.concatenate([old, new], axis=-1))
    )
    return mdn._scalar_ln(old + g * L.linear_apply(p["w2"], new))


def _egnn_init(key, dim, heads):
    ks = iter(jax.random.split(key, 10))
    return {
        "q": L.linear_init(next(ks), dim, dim),
        "k": L.linear_init(next(ks), dim, dim),
        "v": L.linear_init(next(ks), dim, dim),
        "e_mlp": L.mlp_init(next(ks), dim + 16, dim),
        "eb": L.linear_init(next(ks), dim, heads),
        "o": L.linear_init(next(ks), dim, dim),
        "coord_mlp": L.mlp_init(next(ks), dim, 1, hidden=dim // 2),
        "ff": L.mlp_init(next(ks), dim, dim, hidden=2 * dim),
    }


def egnn_apply(p, cfg, lig_x, lig_pos, lig_mask, pro_x, pro_pos, pro_mask):
    """One E(3)-equivariant attention layer: ligand nodes attend over
    protein residues (CA frame) + themselves; coordinates update along
    relative vectors with attention-weighted scalar gates."""
    h = lig_x.shape[-1]
    nh = cfg.egnn_heads
    dh = h // nh
    nl, nr = lig_x.shape[0], pro_x.shape[0]

    ctx_x = jnp.concatenate([lig_x, pro_x], axis=0)  # [NL+NR, h]
    ctx_pos = jnp.concatenate([lig_pos, pro_pos], axis=0)
    ctx_mask = jnp.concatenate([lig_mask, pro_mask], axis=0)

    vec = ctx_pos[None, :, :] - lig_pos[:, None, :]  # [NL, NL+NR, 3]
    dist = jnp.linalg.norm(vec + 1e-9, axis=-1)
    rbf = L.gaussian_smearing(dist, 0.0, cfg.cross_cutoff, 16)
    e = L.mlp_apply(
        p["e_mlp"],
        jnp.concatenate(
            [lig_x[:, None, :] + ctx_x[None, :, :], rbf], axis=-1
        ),
    )
    q = L.linear_apply(p["q"], lig_x).reshape(nl, nh, dh)
    k = L.linear_apply(p["k"], ctx_x).reshape(nl + nr, nh, dh)
    v = L.linear_apply(p["v"], ctx_x).reshape(nl + nr, nh, dh)
    logits = jnp.einsum("ihd,jhd->ijh", q, k) / jnp.sqrt(dh)
    logits = logits + L.linear_apply(p["eb"], e)
    keep = (
        (dist <= cfg.cross_cutoff)
        & (lig_mask[:, None] > 0)
        & (ctx_mask[None, :] > 0)
    )
    logits = jnp.where(keep[..., None], logits, -1e9)
    att = jax.nn.softmax(logits, axis=1)
    out = jnp.einsum("ijh,jhd->ihd", att, v).reshape(nl, h)
    x = mdn._scalar_ln(lig_x + L.linear_apply(p["o"], out))
    x = mdn._scalar_ln(x + L.mlp_apply(p["ff"], x, act=jax.nn.silu))

    # coordinate update: attention-mean of gated relative vectors
    gate = L.mlp_apply(p["coord_mlp"], e)[..., 0]  # [NL, NL+NR]
    att_m = jnp.mean(att, axis=-1) * keep
    delta = jnp.sum(
        (att_m * gate)[..., None] * vec / (dist[..., None] + 1.0), axis=1
    )
    new_pos = lig_pos + delta * lig_mask[:, None]
    return x, new_pos


def _angle_resnet_init(key, c_in, c_hidden, n_blocks, n_angles):
    ks = iter(jax.random.split(key, 3 + 2 * n_blocks))
    p = {
        "in1": L.linear_init(next(ks), c_in, c_hidden),
        "blocks": [
            {
                "l1": L.linear_init(next(ks), c_hidden, c_hidden),
                "l2": L.linear_init(next(ks), c_hidden, c_hidden),
            }
            for _ in range(n_blocks)
        ],
        "out": L.linear_init(next(ks), c_hidden, 2 * n_angles),
    }
    return p


def angle_resnet_apply(p, x, n_angles, eps=1e-6):
    """AlphaFold-style angle head: residual MLP -> normalized (sin, cos)
    pairs (Angle_ResNet.py / AF2 supplementary algorithm 20)."""
    a = L.linear_apply(p["in1"], jax.nn.relu(x))
    for blk in p["blocks"]:
        h = L.linear_apply(blk["l1"], jax.nn.relu(a))
        h = L.linear_apply(blk["l2"], jax.nn.relu(h))
        a = a + h
    sc = L.linear_apply(p["out"], jax.nn.relu(a))
    sc = sc.reshape(sc.shape[:-1] + (n_angles, 2))
    norm = jnp.sqrt(jnp.sum(sc**2, axis=-1, keepdims=True) + eps)
    return sc / norm


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


def init_params(key, cfg: KarmaDockConfig):
    h = cfg.mdn.hidden
    ks = iter(jax.random.split(key, 16))
    p = {
        "encoder": mdn.init_params(next(ks), cfg.mdn),
        "egnn": [
            _egnn_init(next(ks), h, cfg.egnn_heads)
            for _ in range(cfg.egnn_layers)
        ],
        "node_gate": _gate_init(next(ks), h),
        "angle": _angle_resnet_init(next(ks), h, 32, 2, 4),
    }
    return p


class KarmaDockOutput(NamedTuple):
    lig_pos: jnp.ndarray  # [NL, 3] refined pose
    mdn_score: jnp.ndarray  # scalar
    chi_sincos: jnp.ndarray  # [R, 4, 2] predicted side-chain angles


def apply(params, cfg: KarmaDockConfig, s: DockingSample, lig_pos, pos14):
    """Pose refinement + scoring for one sample (vmap over batch)."""
    mcfg = cfg.mdn
    enc = params["encoder"]
    pro_s = mdn._gvp_encode_protein(enc, mcfg, s, pos14)
    lig_s0 = mdn._gt_encode_ligand(enc, mcfg, s, lig_pos)

    ca = pos14[:, 1]
    lig_s, pos = lig_s0, lig_pos
    for lay in params["egnn"]:
        lig_s, pos = egnn_apply(
            lay, cfg, lig_s, pos, s.lig_mask, pro_s, ca, s.res_mask
        )
    lig_s = gate_apply(params["node_gate"], lig_s0, lig_s)

    out = mdn.mdn_head(enc, mcfg, lig_s, pro_s, pos, pos14, s)
    prob = mdn.mixture_prob(out.pi, out.sigma, out.mu, out.dist)
    keep = out.pair_mask & (out.dist <= mcfg.dist_threshold)
    score = jnp.sum(jnp.where(keep, prob, 0.0))

    chi = angle_resnet_apply(params["angle"], pro_s, n_angles=4)
    return KarmaDockOutput(lig_pos=pos, mdn_score=score, chi_sincos=chi)
