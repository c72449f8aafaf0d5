"""MDN pose scorer: the TPU-native KarmaDock scoring head.

Re-designs DiffBindFR/scoring (KarmaDock_sc.py:13-102, GVP_Block.py,
GraphTransformer_Block.py, MDN_Block.py) as fixed-shape JAX on the SAME
DockingSample the diffusion model uses: the reference needs a second
featurization stack (prody selection + vendored openfold transforms,
scoring/dataset/protein_feature.py:137-216) only to recover atom14 +
torsions the docking pipeline already has — here every protein feature
(backbone dihedrals, orientation vectors, knn edge features) is derived
on-device from (aatype, atom14_pos, atom14_mask) inside the jitted scorer.

Architecture (semantics matched to the reference at matched widths):
  * protein: GVP-GNN encoder (Jing et al. 2021, vector-gated), knn-30 CA
    graph, node (9 scalar from 3 intra-residue distances + omega/phi/psi
    sin-cos, 3 vectors) + residue-type embedding, edge (21 scalar:
    contact flag, CA/centroid/CB/O distances + 16 RBF, 1 vector) -> 128
  * ligand: edge-aware graph-transformer over the covalent graph
    (dense masked multi-head attention — ligands are <= ~128 atoms so the
    dense [NL, NL] form is the TPU-fast layout) -> 128
  * MDN: pairwise (lig atom x residue) 10-component Gaussian mixture over
    the min atom14 distance; score = sum of mixture probability at the
    observed distance over pairs < 5 A (KarmaDock_sc.py:88-102). LayerNorm
    replaces the reference's BatchNorm (mask-safe; we train from scratch).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..data.sample import DockingSample
from ..nn import layers as L

# atom14 slot order in this repo is N, CA, C, O, CB, ... (constants/residues.py
# restype_name_to_atom14_names); asserted by tests/test_mdn_scorer.py.
N_, CA, C_, O_, CB = 0, 1, 2, 3, 4

# mean_nll assigned to poses whose <dist_threshold contact set is EMPTY
# (pose escaped the pocket): finite so cluster means stay well-defined,
# far above any real per-contact NLL (those sit in roughly [-2, 15]).
NO_CONTACT_NLL = 1e4


@dataclasses.dataclass(frozen=True)
class MDNConfig:
    lig_node_dim: int = 27
    lig_edge_dim: int = 10
    hidden: int = 128
    pro_scalar_in: int = 9
    pro_vector_in: int = 3
    pro_edge_scalar: int = 21
    pro_vector_hidden: int = 16
    gvp_layers: int = 3
    gt_layers: int = 6
    gt_heads: int = 4
    n_gaussians: int = 10
    knn: int = 30
    rbf_bins: int = 16
    dist_threshold: float = 5.0  # scoring cutoff (A)
    train_dist_threshold: float = 7.0  # pairs included in the MDN loss
    dropout: float = 0.1


# ---------------------------------------------------------------------------
# GVP primitives (vector-gated; Jing et al. 2021)
# ---------------------------------------------------------------------------


def _gvp_init(key, si, vi, so, vo, hv=None):
    hv = hv or max(vi, vo)
    ks = jax.random.split(key, 4)
    p = {
        "wh": L.xavier_uniform(ks[0], (vi, hv)) if vi else None,
        "wm": L.linear_init(ks[1], si + (hv if vi else 0), so),
    }
    if vo:
        p["wu"] = L.xavier_uniform(ks[2], (hv if vi else 0 or 1, vo))
        if vi == 0:
            p["wu"] = L.xavier_uniform(ks[2], (1, vo))
        p["wg"] = L.linear_init(ks[3], so, vo)
    return p


def _gvp_apply(p, s, V, act=jax.nn.relu, vec_in: int = 0, vec_out: int = 0):
    """s: [..., si]; V: [..., vi, 3] (ignored when vec_in == 0)."""
    if vec_in:
        vh = jnp.einsum("...vi,vw->...wi", V, p["wh"])
        norms = jnp.sqrt(jnp.sum(vh**2, axis=-1) + 1e-8)
        s_out = L.linear_apply(p["wm"], jnp.concatenate([s, norms], axis=-1))
    else:
        s_out = L.linear_apply(p["wm"], s)
    Vout = None
    if vec_out:
        base = vh if vec_in else jnp.zeros(s.shape[:-1] + (1, 3), s.dtype)
        Vout = jnp.einsum("...wi,wu->...ui", base, p["wu"])
        gate = jax.nn.sigmoid(L.linear_apply(p["wg"], act(s_out)))
        Vout = Vout * gate[..., None]
    return act(s_out), Vout


def _vec_layer_norm(V):
    n2 = jnp.mean(jnp.sum(V**2, axis=-1), axis=-1, keepdims=True)
    return V * jax.lax.rsqrt(n2 + 1e-8)[..., None]


def _scalar_ln(s):
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.var(s, axis=-1, keepdims=True)
    return (s - mu) * jax.lax.rsqrt(var + 1e-6)


# ---------------------------------------------------------------------------
# on-device protein features (single sample)
# ---------------------------------------------------------------------------


def _dihedral(p0, p1, p2, p3):
    b0, b1, b2 = p1 - p0, p2 - p1, p3 - p2
    n1 = jnp.cross(b0, b1)
    n2 = jnp.cross(b1, b2)
    m1 = jnp.cross(n1, b1 / (jnp.linalg.norm(b1, axis=-1, keepdims=True) + 1e-9))
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(m1 * n2, axis=-1)
    return jnp.arctan2(y, x + 1e-12)


def _normalize(v):
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-9)


def protein_graph_features(aatype, pos14, mask14, res_mask, knn: int, rbf_bins: int):
    """Residue node/edge features from atom14 geometry (single sample).

    Returns (node_s [R,9], node_v [R,3,3], nbr_idx [R,K], nbr_mask [R,K],
    edge_s [R,K,21], edge_v [R,K,1,3])."""
    r = aatype.shape[0]
    ca, n, c, cb, o = (pos14[:, i] for i in (CA, N_, C_, CB, O_))
    has_cb = mask14[:, CB]
    cb = jnp.where(has_cb[:, None] > 0, cb, ca)

    d = lambda a, b: 0.1 * jnp.linalg.norm(a - b + 1e-6, axis=-1)
    intra = jnp.stack([d(ca, cb), d(n, cb), d(n, c)], axis=-1)  # [R, 3]

    # backbone dihedrals vs previous/next residue (chain breaks zeroed by
    # the residue mask; pocket residues are not necessarily contiguous but
    # this matches the reference's use of openfold torsion features)
    prev = jnp.roll(jnp.stack([ca, c], axis=1), 1, axis=0)  # prev CA, C
    nxt_n = jnp.roll(n, -1, axis=0)
    omega = _dihedral(prev[:, 0], prev[:, 1], n, ca)
    phi = _dihedral(prev[:, 1], n, ca, c)
    psi = _dihedral(n, ca, c, nxt_n)
    first = jnp.arange(r) == 0
    last = jnp.arange(r) == r - 1
    # a dihedral/orientation is defined only when the rolled-in neighbor is
    # a real residue — padded neighbors sit at the (unrotated) origin and
    # would silently break SE(3) invariance
    prev_ok = (jnp.roll(res_mask, 1) > 0) & (res_mask > 0) & ~first
    next_ok = (jnp.roll(res_mask, -1) > 0) & (res_mask > 0) & ~last
    omega = jnp.where(prev_ok, omega, 0.0)
    phi = jnp.where(prev_ok, phi, 0.0)
    psi = jnp.where(next_ok, psi, 0.0)
    dihed = jnp.stack([omega, phi, psi], axis=-1)
    ang_mask = jnp.stack([prev_ok, prev_ok, next_ok], axis=-1)
    node_s = jnp.concatenate(
        [intra, jnp.sin(dihed) * ang_mask, jnp.cos(dihed) * ang_mask], axis=-1
    )  # [R, 9]

    fwd = _normalize(jnp.roll(ca, -1, axis=0) - ca) * next_ok[:, None]
    bwd = _normalize(jnp.roll(ca, 1, axis=0) - ca) * prev_ok[:, None]
    bis = _normalize(_normalize(c - ca) + _normalize(n - ca))
    perp = _normalize(jnp.cross(_normalize(c - ca), _normalize(n - ca)))
    side = -bis * jnp.sqrt(1 / 3) - perp * jnp.sqrt(2 / 3)
    node_v = jnp.stack([fwd, bwd, side], axis=-2)  # [R, 3, 3]

    # knn graph over CA
    idx, valid = L.knn_edges(ca, ca, res_mask, res_mask, k=min(knn, r), cutoff=1e6,
                             exclude_self=True)
    com = jnp.sum(pos14 * mask14[..., None], axis=1) / jnp.maximum(
        jnp.sum(mask14, axis=1, keepdims=True), 1.0
    )
    cadist = d(ca[:, None], ca[idx])
    cedist = d(com[:, None], com[idx])
    cbdist = d(cb[:, None], cb[idx])
    odist = d(o[:, None], o[idx])
    connect = (cbdist < 0.45).astype(jnp.float32)
    rbf = L.gaussian_smearing(cbdist, 0.0, 2.0, rbf_bins)
    edge_s = jnp.concatenate(
        [connect[..., None], cadist[..., None], cedist[..., None],
         cbdist[..., None], odist[..., None], rbf],
        axis=-1,
    )  # [R, K, 21]
    edge_v = _normalize(ca[idx] - ca[:, None])[:, :, None, :]  # [R, K, 1, 3]
    return node_s, node_v, idx, valid.astype(jnp.float32), edge_s, edge_v


# ---------------------------------------------------------------------------
# parameter init
# ---------------------------------------------------------------------------


def init_params(key, cfg: MDNConfig):
    h = cfg.hidden
    hv = cfg.pro_vector_hidden
    ks = iter(jax.random.split(key, 128))
    p: dict = {}

    # --- GVP encoder
    p["seq_emb"] = L.embedding_init(next(ks), 21, 20)
    si = cfg.pro_scalar_in + 20
    p["pro_node_in"] = [
        _gvp_init(next(ks), si, cfg.pro_vector_in, h, hv),
    ]
    p["pro_edge_in"] = [_gvp_init(next(ks), cfg.pro_edge_scalar, 1, 32, 1)]
    p["gvp_layers"] = []
    for _ in range(cfg.gvp_layers):
        lay = {
            "msg": [
                _gvp_init(next(ks), h + 32 + h, hv + 1 + hv, h, hv),
                _gvp_init(next(ks), h, hv, h, hv),
                _gvp_init(next(ks), h, hv, h, hv),
            ],
            "ff": [
                _gvp_init(next(ks), h, hv, 2 * h, 2 * hv),
                _gvp_init(next(ks), 2 * h, 2 * hv, h, hv),
            ],
        }
        p["gvp_layers"].append(lay)
    p["pro_out"] = _gvp_init(next(ks), h, hv, h, 0)

    # --- ligand graph transformer
    p["lig_node_in"] = L.linear_init(next(ks), cfg.lig_node_dim, h)
    p["lig_edge_in"] = L.linear_init(next(ks), cfg.lig_edge_dim + 8, h)
    p["gt_layers"] = []
    for _ in range(cfg.gt_layers):
        lay = {
            "q": L.linear_init(next(ks), h, h),
            "k": L.linear_init(next(ks), h, h),
            "v": L.linear_init(next(ks), h, h),
            "eb": L.linear_init(next(ks), h, cfg.gt_heads),
            "ev": L.linear_init(next(ks), h, h),
            "o": L.linear_init(next(ks), h, h),
            "ff1": L.linear_init(next(ks), h, 2 * h),
            "ff2": L.linear_init(next(ks), 2 * h, h),
        }
        p["gt_layers"].append(lay)

    # --- MDN head (first pair layer split into lig/pro halves)
    p["pair_l"] = L.linear_init(next(ks), h, h)
    p["pair_p"] = L.linear_init(next(ks), h, h, bias=False)
    p["z_pi"] = L.linear_init(next(ks), h, cfg.n_gaussians)
    p["z_sigma"] = L.linear_init(next(ks), h, cfg.n_gaussians)
    p["z_mu"] = L.linear_init(next(ks), h, cfg.n_gaussians)
    p["atom_types"] = L.linear_init(next(ks), h, 18)
    p["bond_types"] = L.linear_init(next(ks), 2 * h, 5)
    return p


# ---------------------------------------------------------------------------
# encoders (single sample)
# ---------------------------------------------------------------------------


def _gvp_encode_protein(p, cfg: MDNConfig, s: DockingSample, pos14):
    h, hv = cfg.hidden, cfg.pro_vector_hidden
    node_s, node_v, idx, nmask, edge_s, edge_v = protein_graph_features(
        s.aatype, pos14, s.atom14_mask, s.res_mask, cfg.knn, cfg.rbf_bins
    )
    node_s = jnp.concatenate([node_s, p["seq_emb"]["emb"][s.aatype]], axis=-1)
    hs, hV = _gvp_apply(
        p["pro_node_in"][0], node_s, node_v,
        vec_in=cfg.pro_vector_in, vec_out=hv,
    )
    es, eV = _gvp_apply(p["pro_edge_in"][0], edge_s, edge_v, vec_in=1, vec_out=1)

    for lay in p["gvp_layers"]:
        # messages: (s_j, edge_s, s_i) x (V_j, edge_v, V_i)
        sj, Vj = hs[idx], hV[idx]
        si_ = jnp.broadcast_to(hs[:, None, :], sj.shape)
        Vi_ = jnp.broadcast_to(hV[:, None, :, :], Vj.shape)
        ms = jnp.concatenate([sj, es, si_], axis=-1)
        mV = jnp.concatenate([Vj, eV, Vi_], axis=-2)
        ms, mV = _gvp_apply(lay["msg"][0], ms, mV, vec_in=2 * hv + 1, vec_out=hv)
        ms, mV = _gvp_apply(lay["msg"][1], ms, mV, vec_in=hv, vec_out=hv)
        ms, mV = _gvp_apply(lay["msg"][2], ms, mV, vec_in=hv, vec_out=hv)
        w = nmask[..., None]
        denom = jnp.maximum(jnp.sum(nmask, axis=1), 1.0)
        agg_s = jnp.sum(ms * w, axis=1) / denom[:, None]
        agg_V = jnp.sum(mV * w[..., None], axis=1) / denom[:, None, None]
        hs = _scalar_ln(hs + agg_s)
        hV = _vec_layer_norm(hV + agg_V)
        fs, fV = _gvp_apply(lay["ff"][0], hs, hV, vec_in=hv, vec_out=2 * hv)
        fs, fV = _gvp_apply(lay["ff"][1], fs, fV, vec_in=2 * hv, vec_out=hv)
        hs = _scalar_ln(hs + fs)
        hV = _vec_layer_norm(hV + fV)

    out_s, _ = _gvp_apply(p["pro_out"], hs, hV, vec_in=hv, vec_out=0)
    return out_s  # [R, h]


def _gt_encode_ligand(p, cfg: MDNConfig, s: DockingSample, lig_pos):
    h, nh = cfg.hidden, cfg.gt_heads
    dh = h // nh
    nl = s.lig_mask.shape[0]
    x = L.linear_apply(p["lig_node_in"], s.lig_feat)

    # dense edge embedding from the covalent edge list (+ bond-length RBF)
    el = s.lig_e_src.shape[0]
    dist = jnp.linalg.norm(
        lig_pos[s.lig_e_dst] - lig_pos[s.lig_e_src] + 1e-9, axis=-1
    )
    efeat = jnp.concatenate(
        [s.lig_e_feat, L.gaussian_smearing(dist, 0.0, 4.0, 8)], axis=-1
    )
    e = L.linear_apply(p["lig_edge_in"], efeat) * s.lig_e_mask[:, None]
    e_dense = jnp.zeros((nl, nl, h)).at[s.lig_e_src, s.lig_e_dst].add(e)
    adj = jnp.zeros((nl, nl)).at[s.lig_e_src, s.lig_e_dst].add(s.lig_e_mask)
    attend = (adj > 0) | jnp.eye(nl, dtype=bool)
    attend = attend & (s.lig_mask[:, None] > 0) & (s.lig_mask[None, :] > 0)

    for lay in p["gt_layers"]:
        q = L.linear_apply(lay["q"], x).reshape(nl, nh, dh)
        k = L.linear_apply(lay["k"], x).reshape(nl, nh, dh)
        v = L.linear_apply(lay["v"], x).reshape(nl, nh, dh)
        eb = L.linear_apply(lay["eb"], e_dense)  # [NL, NL, nh]
        logits = jnp.einsum("ihd,jhd->ijh", q, k) / jnp.sqrt(dh) + eb
        logits = jnp.where(attend[..., None], logits, -1e9)
        att = jax.nn.softmax(logits, axis=1)
        ev = L.linear_apply(lay["ev"], e_dense).reshape(nl, nl, nh, dh)
        out = jnp.einsum("ijh,jhd->ihd", att, v) + jnp.einsum(
            "ijh,ijhd->ihd", att, ev
        )
        x = _scalar_ln(x + L.linear_apply(lay["o"], out.reshape(nl, h)))
        y = L.linear_apply(lay["ff2"], jax.nn.silu(L.linear_apply(lay["ff1"], x)))
        x = _scalar_ln(x + y)
    return x * s.lig_mask[:, None]  # [NL, h]


# ---------------------------------------------------------------------------
# MDN head + score (single sample)
# ---------------------------------------------------------------------------


class MDNOutput(NamedTuple):
    pi: jnp.ndarray  # [NL, R, G]
    sigma: jnp.ndarray
    mu: jnp.ndarray
    dist: jnp.ndarray  # [NL, R] min atom14 distance
    pair_mask: jnp.ndarray  # [NL, R]
    atom_logits: jnp.ndarray  # [NL, 18]
    bond_logits: jnp.ndarray  # [EL, 5]


def mdn_head(p, cfg: MDNConfig, lig_s, pro_s, lig_pos, pos14, s: DockingSample):
    # pairwise hidden: first layer split across the concat boundary
    hidden = (
        L.linear_apply(p["pair_l"], lig_s)[:, None, :]
        + L.linear_apply(p["pair_p"], pro_s)[None, :, :]
    )
    if "pair_norm" in p:
        # imported reference weights: eval-mode BatchNorm1d folded to a
        # fixed per-channel affine (utils/torch_import.py) — exact at
        # inference; from-scratch checkpoints use the mask-safe LayerNorm
        hidden = hidden * p["pair_norm"]["scale"] + p["pair_norm"]["shift"]
    else:
        hidden = _scalar_ln(hidden)
    hidden = jax.nn.elu(hidden)
    pi = jax.nn.softmax(L.linear_apply(p["z_pi"], hidden), axis=-1)
    sigma = jax.nn.elu(L.linear_apply(p["z_sigma"], hidden)) + 1.1
    mu = jax.nn.elu(L.linear_apply(p["z_mu"], hidden)) + 1.0

    # min distance lig atom <-> residue atom14
    d = jnp.linalg.norm(
        lig_pos[:, None, None, :] - pos14[None, :, :, :] + 1e-9, axis=-1
    )  # [NL, R, 14]
    d = jnp.where(s.atom14_mask[None] > 0, d, 1e4)
    dist = jnp.min(d, axis=-1)
    pair_mask = (s.lig_mask[:, None] * s.res_mask[None, :]) > 0

    atom_logits = L.linear_apply(p["atom_types"], lig_s)
    bond_logits = L.linear_apply(
        p["bond_types"],
        jnp.concatenate([lig_s[s.lig_e_src], lig_s[s.lig_e_dst]], axis=-1),
    )
    return MDNOutput(pi, sigma, mu, dist, pair_mask, atom_logits, bond_logits)


def _log_gauss(y, mu, sigma):
    return -0.5 * ((y - mu) / sigma) ** 2 - jnp.log(sigma) - 0.5 * jnp.log(2 * jnp.pi)


def mixture_prob(pi, sigma, mu, y):
    """sum_k pi_k N(y | mu_k, sigma_k) (KarmaDock calculate_probablity)."""
    logp = _log_gauss(y[..., None], mu, sigma) + jnp.log(pi + 1e-12)
    return jnp.sum(jnp.exp(logp), axis=-1)


def score_sample(p, cfg: MDNConfig, s: DockingSample, lig_pos, pos14):
    """MDN score of one pose (higher = better)."""
    pro_s = _gvp_encode_protein(p, cfg, s, pos14)
    lig_s = _gt_encode_ligand(p, cfg, s, lig_pos)
    out = mdn_head(p, cfg, lig_s, pro_s, lig_pos, pos14, s)
    prob = mixture_prob(out.pi, out.sigma, out.mu, out.dist)
    keep = out.pair_mask & (out.dist <= cfg.dist_threshold)
    return jnp.sum(jnp.where(keep, prob, 0.0))


def score_sample_both(p, cfg: MDNConfig, s: DockingSample, lig_pos, pos14):
    """(summed probability, mean per-contact NLL) for one pose.

    The reference ranks by the summed mixture probability over all
    <5 A pairs (KarmaDock calculate_probablity semantics) — a score that
    GROWS with interface size, so a deeply buried wrong pose can outrank
    a shallow correct one (the round-2 held-out failure: a 7.0 A pose
    beat the 2.3 A one). The mean per-contact NLL normalizes away the
    contact count and rewards pair-distance patterns the MDN finds
    LIKELY rather than merely numerous; rank modes live in reporter.py.
    """
    pro_s = _gvp_encode_protein(p, cfg, s, pos14)
    lig_s = _gt_encode_ligand(p, cfg, s, lig_pos)
    out = mdn_head(p, cfg, lig_s, pro_s, lig_pos, pos14, s)
    keep = out.pair_mask & (out.dist <= cfg.dist_threshold)
    prob = mixture_prob(out.pi, out.sigma, out.mu, out.dist)
    sum_prob = jnp.sum(jnp.where(keep, prob, 0.0))
    logp = _log_gauss(out.dist[..., None], out.mu, out.sigma) + jnp.log(
        out.pi + 1e-12
    )
    nll = -jax.scipy.special.logsumexp(logp, axis=-1)
    n_keep = jnp.sum(keep)
    # A pose with NO pocket contacts inside dist_threshold has an empty
    # support set; 0/1 would make it the BEST-ranked pose (the round-5
    # 2zec LOO fold picked a 22 A runaway pose this way). No contacts is
    # the WORST evidence a ranker can see, so pin it to a finite sentinel
    # that loses to every real per-contact NLL yet stays arithmetic-safe
    # for cluster means.
    mean_nll = jnp.where(
        n_keep > 0,
        jnp.sum(jnp.where(keep, nll, 0.0)) / jnp.maximum(n_keep, 1.0),
        NO_CONTACT_NLL,
    )
    return sum_prob, mean_nll


def score_batch_both(p, cfg: MDNConfig, batch: DockingSample, lig_pos, pos14):
    """([B] summed prob, [B] mean NLL); jit/vmap over the replica batch."""
    return jax.vmap(
        lambda s_, lp_, p14_: score_sample_both(p, cfg, s_, lp_, p14_)
    )(batch, lig_pos, pos14)


def score_batch(p, cfg: MDNConfig, batch: DockingSample, lig_pos, pos14):
    """[B] MDN scores; jit/vmap over the replica batch."""
    return jax.vmap(lambda s_, lp_, p14_: score_sample(p, cfg, s_, lp_, p14_))(
        batch, lig_pos, pos14
    )


def mdn_loss(p, cfg: MDNConfig, s: DockingSample, lig_pos, pos14):
    """Training NLL over pairs closer than train_dist_threshold."""
    pro_s = _gvp_encode_protein(p, cfg, s, pos14)
    lig_s = _gt_encode_ligand(p, cfg, s, lig_pos)
    out = mdn_head(p, cfg, lig_s, pro_s, lig_pos, pos14, s)
    logp = _log_gauss(out.dist[..., None], out.mu, out.sigma) + jnp.log(
        out.pi + 1e-12
    )
    nll = -jax.scipy.special.logsumexp(logp, axis=-1)
    keep = out.pair_mask & (out.dist <= cfg.train_dist_threshold)
    return jnp.sum(jnp.where(keep, nll, 0.0)) / jnp.maximum(jnp.sum(keep), 1.0)
