"""SE(3)-equivariant diffusion score network, TPU-native.

Re-designs the reference TensorProductModel
(druglib/models/Docking/interaction/tpscore.py:202-758) for XLA: the
variable-size torch_cluster radius graphs become fixed-degree masked
neighbor lists computed from dense distance matrices (graphs here have
<= ~1k nodes, so O(N^2) distances are cheap and MXU-friendly), and the whole
forward is a single-sample pure function vmapped over the batch — no PyG
batch-offset bookkeeping, no data-dependent shapes, one compilation per
bucket.

Model structure (matching tpscore.py semantics):
  * 4 dynamic graphs per step: lig-lig (covalent + radius 5A), atom-atom
    (radius 4A), lig<->atom cross (sigma-dependent cutoff 0.2*sigma_tr + 5
    for non-CA/CB atoms + full bipartite to CA/CB), center-to-lig.
  * 6 tensor-product conv layers over the irreps ladder
    48x0e -> +12x1o -> +12x1e -> +48x0o, sh lmax 2.
  * Heads: final center conv -> 2x1o+2x1e -> tr/rot vectors with learned
    magnitudes; pseudotorque convs for ligand torsion and side-chain chi
    scalar scores; scale-by-sigma using on-device SO(3)/torus score-norm
    tables (the reference does these lookups on host numpy per step,
    scFlex.py:104-122 — here they are jnp gathers inside the jitted step).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..data.sample import DockingSample
from ..geometry import so3, torus
from ..nn import layers as L
from ..nn.irreps import (
    apply_full_tensor_product,
    compile_full_tensor_product,
)

SH_IRREPS = "1x0e+1x1o+1x2e"


@dataclasses.dataclass(frozen=True)
class ScoreNetConfig:
    ns: int = 48
    nv: int = 12
    num_conv_layers: int = 6
    sigma_embed_dim: int = 32
    distance_embed_dim: int = 32
    lig_node_dim: int = 27
    lig_edge_dim: int = 10
    atom_cat_dims: tuple = (37, 22, 4, 21, 2)
    lig_cutoff: float = 5.0
    atom_cutoff: float = 4.0
    cross_max_distance: float = 32.0
    center_max_distance: float = 32.0
    dynamic_max_cross: bool = True
    cross_cutoff: float = 32.0  # used when dynamic_max_cross = False
    # fixed atom-graph degree (reference uses unbounded radius-4A lists;
    # mean contact count at 4A is ~10, so 16 keeps essentially all edges)
    atom_knn: int = 16
    emb_scale: float = 1000.0
    dropout: float = 0.1
    scale_by_sigma: bool = True
    no_sc_torsion: bool = False
    # 'sep' = separable depthwise-TP + post-aggregation irreps Linear
    # (TPU-fast, default); 'fc' = reference-exact per-edge uvw TP
    conv_mode: str = "sep"
    # 'bfloat16' runs the trunk in bf16 (heads and sigma scaling stay f32)
    compute_dtype: str = "float32"
    # rematerialize each conv layer in the backward pass (jax.checkpoint):
    # the dense pair-block activations of 6 layers do not fit HBM at
    # training batch sizes — remat trades ~1 extra forward for ~6x less
    # activation memory. No effect on inference.
    remat: bool = False
    # fused pallas pair-conv kernels for the dense lig/cross convs.
    # Trainable: each kernel carries a jax.custom_vjp whose backward
    # differentiates an exact XLA twin (pallas_conv.py), so forward passes
    # (including remat recomputes) run fused while the backward re-derives
    # the pair-space intermediates under XLA, one layer at a time.
    use_pallas: bool = False
    # carry each WHOLE layer (3 graph convs + finalize epilogues +
    # residual) in one pallas_call (nn/pallas_layer.py) instead of three
    # kernels + XLA glue; only read when use_pallas is set. OFF by
    # default: measured 45 ms/layer at B=16 on v5e vs ~30 ms for the
    # 3-kernel path — Mosaic lane-pads the depthwise-TP's narrow [R, mul]
    # temporaries to 128 lanes (10x waste on the nv=12 slots) and the
    # ~100 MB scoped-VMEM footprint kills input double-buffering. The fix
    # (channel-on-sublane transposed pair layout) is future work; the
    # kernel is correct, custom-VJP-trainable, and equality/grad-tested.
    fused_layer: bool = False
    # run each conv's finalize (count divide -> irreps-Linear mix ->
    # LayerNorm) INSIDE its pallas kernel at the last grid step instead of
    # as XLA epilogue ops on [B, N, dout] HBM tensors (VERDICT round-1
    # lever: 'at least fuse mix+LN into each kernel's epilogue').
    # Measured on v5e at B=16: 4.09 poses/s vs 4.20 for the XLA epilogue —
    # XLA already fuses these cheap ops well, and the in-kernel LayerNorm
    # pays Mosaic's 128-lane padding on the narrow per-slot pieces. OFF by
    # default; kept because it is tested and the balance may flip on other
    # TPU generations or once the TP uses a transposed pair layout.
    fused_epilogue: bool = False
    # pair-block layout of the pallas kernels. 'cmt' (default): channels
    # on sublanes, pairs on lanes (pallas_conv_t.py) — every depthwise-TP
    # temporary is lane-dense and the per-pair MLPs are [out, in] @
    # [in, 1024] MXU matmuls; eliminates the round-2 measured ~10x
    # narrow-lane padding of the row-major kernels. 'rowmajor': the
    # round-2 kernels (pallas_conv.py), kept for comparison and for the
    # fused_layer/fused_epilogue variants (cmt ignores those flags).
    pallas_layout: str = "cmt"
    # hand-written pallas backward kernels for the cmt convs (training
    # fast path). The default 'twin' backward differentiates the XLA twin
    # and re-materializes pair-space intermediates under XLA (~2/3 of a
    # round-2 train step); 'pallas' recomputes per-block activations
    # inside fused backward kernels and emits feature + parameter
    # gradients only — positions/temb/masks get ZERO cotangents, which is
    # exact for training (pure data, no parameters upstream) but wrong
    # for any use that differentiates w.r.t. coordinates. cmt layout only.
    pallas_bwd: bool = False
    # dtype of the depthwise-TP elementwise chain inside the cmT kernels.
    # 'bfloat16' packs the chain's [mul_p, 1024] VPU ops 2-per-register
    # (measured 2.25x VPU throughput, tools/probe_bf16.py; 17.7 -> 24.0
    # poses/s on the sampler bench); geometry, masks, MLP accumulations,
    # and all aggregation sums stay f32. 'auto' (default) follows the
    # declared precision envelope: bfloat16 iff compute_dtype is
    # 'bfloat16' (the XLA epilogues already round the trunk to bf16
    # there — the chain joins the same noise class), float32 otherwise.
    # Inference knob — both backward paths (twin and pallas) run f32, so
    # training configs keep an f32 trunk. cmt layout only.
    pallas_dw_dtype: str = "auto"

    @property
    def irrep_seq(self) -> tuple:
        ns, nv = self.ns, self.nv
        return (
            f"{ns}x0e",
            f"{ns}x0e+{nv}x1o",
            f"{ns}x0e+{nv}x1o+{nv}x1e",
            f"{ns}x0e+{nv}x1o+{nv}x1e+{ns}x0o",
        )

    def layer_irreps(self, layer: int) -> tuple:
        seq = self.irrep_seq
        i = min(layer, len(seq) - 1)
        o = min(layer + 1, len(seq) - 1)
        return seq[i], seq[o]


class Sigmas(NamedTuple):
    """Per-sample noise levels for the four manifolds."""

    tr: jnp.ndarray
    rot: jnp.ndarray
    tor: jnp.ndarray
    sc_tor: jnp.ndarray


class ScoreOutput(NamedTuple):
    tr: jnp.ndarray  # [3] (batched: [B, 3])
    rot: jnp.ndarray  # [3]
    tor: jnp.ndarray  # [T]
    sc_tor: jnp.ndarray  # [R, 4]


@functools.lru_cache(maxsize=8)
def _specs(cfg: ScoreNetConfig):
    """Static TP path tables for every conv in the network."""
    mode = cfg.conv_mode
    convs = []
    for l in range(cfg.num_conv_layers):
        in_ir, out_ir = cfg.layer_irreps(l)
        convs.append(L.make_conv_spec(in_ir, SH_IRREPS, out_ir, mode))
    final_in = cfg.layer_irreps(cfg.num_conv_layers - 1)[1]
    final = L.make_conv_spec(final_in, SH_IRREPS, "2x1o+2x1e", mode)
    # pseudotorque sh: FullTP(sh, bond 2e) truncated to l <= 1 — higher-l
    # outputs cannot couple the (l <= 1) ladder to the 0o+0e conv output, so
    # the truncation is exact, not an approximation (cf. tpscore.py:373).
    tor_sh = compile_full_tensor_product(SH_IRREPS, "1x2e", lmax_out=1)
    ns = cfg.ns
    tor_conv = L.make_conv_spec(final_in, str(tor_sh.out), f"{ns}x0o+{ns}x0e", mode)
    return tuple(convs), final, tor_sh, tor_conv


@functools.lru_cache(maxsize=8)
def _pallas_layers(cfg: ScoreNetConfig):
    """Whole-layer fused kernels, one per trunk layer."""
    from ..nn import pallas_layer as PLK

    convs, *_ = _specs(cfg)
    return tuple(
        PLK.make_layer_conv(
            spec, din=spec.dw.in1.dim, ns=cfg.ns, sed=cfg.sigma_embed_dim,
            lig_gs_stop=cfg.lig_cutoff, cross_gs_stop=cfg.cross_max_distance,
            atom_gs_stop=cfg.atom_cutoff, gs_n=cfg.distance_embed_dim,
            lig_edge_dim=cfg.lig_edge_dim, k=cfg.atom_knn,
        )
        for spec in convs
    )


@functools.lru_cache(maxsize=8)
def _pallas_convs(cfg: ScoreNetConfig):
    """Fused pair-conv builders per layer: (lig, al+la, knn). Layout per
    cfg.pallas_layout ('cmt' transposed kernels / 'rowmajor' round-2)."""
    if cfg.pallas_layout == "cmt":
        from ..nn import pallas_conv_t as PC

        convs, *_ = _specs(cfg)
        bwd = "pallas" if cfg.pallas_bwd else "twin"
        dwd = cfg.pallas_dw_dtype
        if dwd == "auto":
            dwd = ("bfloat16" if cfg.compute_dtype == "bfloat16"
                   else "float32")
        out = []
        for spec in convs:
            kw = dict(din=spec.dw.in1.dim, ns=cfg.ns,
                      sed=cfg.sigma_embed_dim, gs_n=cfg.distance_embed_dim,
                      bwd=bwd, dw_dtype=dwd)
            out.append((
                PC.make_pair_conv_t(spec.dw, gs_stop=cfg.lig_cutoff,
                                    edge_extra=cfg.lig_edge_dim,
                                    exclude_self=True, cab_on_src=True,
                                    **kw),
                PC.make_cross_conv_t(spec.dw, gs_stop=cfg.cross_max_distance,
                                     **kw),
                PC.make_knn_conv_t(spec.dw, gs_stop=cfg.atom_cutoff,
                                   k=cfg.atom_knn, **kw),
            ))
        return tuple(out)

    from ..nn import pallas_conv as PC

    convs, *_ = _specs(cfg)
    out = []
    for spec in convs:
        fin = spec if cfg.fused_epilogue else None
        kw = dict(din=spec.dw.in1.dim, ns=cfg.ns, sed=cfg.sigma_embed_dim,
                  gs_n=cfg.distance_embed_dim, fin=fin)
        out.append((
            PC.make_pair_conv(spec.dw, gs_stop=cfg.lig_cutoff,
                              edge_extra=cfg.lig_edge_dim,
                              exclude_self=True, cab_on_src=True, **kw),
            PC.make_cross_conv(spec.dw, gs_stop=cfg.cross_max_distance, **kw),
            PC.make_knn_conv(spec.dw, gs_stop=cfg.atom_cutoff,
                             k=cfg.atom_knn, **kw),
        ))
    return tuple(out)


def _kernel_params(emb, fc):
    return {
        "emb_w1": emb["l1"]["w"], "emb_b1": emb["l1"]["b"],
        "emb_w2": emb["l2"]["w"], "emb_b2": emb["l2"]["b"],
        "fc_w1": fc["l1"]["w"], "fc_b1": fc["l1"]["b"],
        "fc_w2": fc["l2"]["w"], "fc_b2": fc["l2"]["b"],
    }


def init_params(key: jax.Array, cfg: ScoreNetConfig):
    ns = cfg.ns
    sed, ded = cfg.sigma_embed_dim, cfg.distance_embed_dim
    convs, final, tor_sh, tor_conv = _specs(cfg)
    ks = iter(jax.random.split(key, 64))
    p = {
        "lig_node_emb": L.mlp_init(next(ks), cfg.lig_node_dim + sed, ns),
        "lig_edge_emb": L.mlp_init(next(ks), cfg.lig_edge_dim + sed + ded, ns),
        "atom_node_emb": L.atom_encoder_init(next(ks), ns, cfg.atom_cat_dims, sed),
        "atom_edge_emb": L.mlp_init(next(ks), sed + ded, ns),
        "la_edge_emb": L.mlp_init(next(ks), sed + ded, ns),
        "lig_convs": [],
        "atom_convs": [],
        "al_convs": [],
        "la_convs": [],
        "center_edge_emb": L.mlp_init(next(ks), sed + ded, ns),
        "final_conv": L.tp_conv_init(next(ks), final, 2 * ns),
        "tr_final": L.mlp_init(next(ks), 1 + sed, 1, hidden=ns),
        "rot_final": L.mlp_init(next(ks), 1 + sed, 1, hidden=ns),
        "tor_edge_emb": L.mlp_init(next(ks), ded, ns),
        "tor_bond_conv": L.tp_conv_init(next(ks), tor_conv, 3 * ns),
        "tor_final": L.mlp_init(next(ks), 2 * ns, 1, hidden=ns, bias=False),
    }
    for spec in convs:
        p["lig_convs"].append(L.tp_conv_init(next(ks), spec, 3 * ns))
        p["atom_convs"].append(L.tp_conv_init(next(ks), spec, 3 * ns))
        p["al_convs"].append(L.tp_conv_init(next(ks), spec, 3 * ns))
        p["la_convs"].append(L.tp_conv_init(next(ks), spec, 3 * ns))
    if not cfg.no_sc_torsion:
        p["sc_edge_emb"] = L.mlp_init(next(ks), ded, ns)
        p["sc_tor_bond_conv"] = L.tp_conv_init(next(ks), tor_conv, 3 * ns)
        p["sc_tor_final"] = L.mlp_init(next(ks), 2 * ns, 1, hidden=ns, bias=False)
    return p


def _gs(cfg, d, stop):
    return L.gaussian_smearing(d, 0.0, stop, cfg.distance_embed_dim)


def apply(
    params,
    cfg: ScoreNetConfig,
    s: DockingSample,
    t: jnp.ndarray,  # scalar in [0, 1]
    sigmas: Sigmas,  # scalars
) -> ScoreOutput:
    """Single-sample forward. Use `apply_batched` for [B, ...] inputs."""
    ns = cfg.ns
    convs, final_spec, tor_sh_spec, tor_conv_spec = _specs(cfg)
    nl = s.lig_pos.shape[0]
    na = s.atm_pos.shape[0]

    # mixed precision: geometry (positions, distances, masks, sh direction
    # vectors) stays f32; the network trunk (features, weights, messages)
    # runs in compute_dtype. Heads are cast back to f32 before sigma scaling.
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if cd != jnp.float32:
        castp = lambda x: x.astype(cd) if x.dtype == jnp.float32 else x
        params = jax.tree.map(castp, params)
        s = s._replace(
            lig_feat=s.lig_feat.astype(cd), lig_e_feat=s.lig_e_feat.astype(cd)
        )

    temb = L.sinusoidal_time_emb(t, cfg.sigma_embed_dim, cfg.emb_scale).astype(cd)

    # ---------------- node embeddings
    lig_x = L.mlp_apply(
        params["lig_node_emb"],
        jnp.concatenate([s.lig_feat, jnp.tile(temb, (nl, 1))], axis=-1),
    )
    atom_x = L.atom_encoder_apply(
        params["atom_node_emb"], s.atm_feat, jnp.tile(temb, (na, 1))
    )

    # ---------------- ligand graph: dense masked pair block.
    # TPU note: the reference's per-edge lists + scatter aggregation
    # (radius_graph + torch_scatter, tpscore.py:575-600) lower to serial
    # scatter-adds on TPU. Ligands are <= ~128 atoms, so the dense
    # [NL, NL] form with masks is both faster and exact (no neighbor
    # truncation). Bonded pairs carry their bond features; the reference's
    # duplicate bonded+radius message pair becomes one message here.
    bond_feat = jnp.zeros((nl, nl, cfg.lig_edge_dim), cd)
    bond_feat = bond_feat.at[s.lig_e_src, s.lig_e_dst].add(
        s.lig_e_feat * s.lig_e_mask[:, None].astype(cd)
    )
    bond_mask = jnp.zeros((nl, nl)).at[s.lig_e_src, s.lig_e_dst].add(s.lig_e_mask)
    lig_vec = s.lig_pos[None, :, :] - s.lig_pos[:, None, :]  # i -> j
    lig_len = jnp.linalg.norm(lig_vec + 1e-9, axis=-1)
    both_l = (s.lig_mask[:, None] * s.lig_mask[None, :]) > 0
    eye = jnp.eye(nl, dtype=bool)
    lig_pair_mask = (
        (((lig_len <= cfg.lig_cutoff) & ~eye) | (bond_mask > 0)) & both_l
    ).astype(jnp.float32)
    if not cfg.use_pallas:
        temb_l = jnp.broadcast_to(temb, (nl, nl, temb.shape[0]))
        lig_e_attr = L.mlp_apply(
            params["lig_edge_emb"],
            jnp.concatenate(
                [bond_feat, temb_l, _gs(cfg, lig_len, cfg.lig_cutoff).astype(cd)],
                -1,
            ),
        )
        lig_sh = L.sh_l2(lig_vec).astype(cd)

    # ---------------- atom graph: radius-4A fixed-degree neighbor list in
    # gather form ([NA, K] + mean over K — no scatter)
    atm_idx, atm_valid = L.knn_edges(
        s.atm_pos, s.atm_pos, s.atm_mask, s.atm_mask,
        k=min(cfg.atom_knn, na), cutoff=cfg.atom_cutoff, exclude_self=True,
    )
    ka = atm_idx.shape[1]
    atm_vmask = atm_valid.astype(jnp.float32)
    if not cfg.use_pallas:
        atm_vec = s.atm_pos[atm_idx] - s.atm_pos[:, None, :]
        atm_len = jnp.linalg.norm(atm_vec + 1e-9, axis=-1)  # [NA, K]
        atm_e_attr = L.mlp_apply(
            params["atom_edge_emb"],
            jnp.concatenate(
                [jnp.broadcast_to(temb, (na, ka, temb.shape[0])),
                 _gs(cfg, atm_len, cfg.atom_cutoff).astype(cd)],
                axis=-1,
            ),
        )
        atm_sh = L.sh_l2(atm_vec).astype(cd)

    # ---------------- cross graph: dense [NL, NA] pair block; CA/CB atoms
    # always connected, others by the sigma-dependent cutoff
    # (tpscore.py:624-682) — exact, no max-neighbor truncation
    cabflag = jnp.zeros((na,)).at[s.cab_idx].add(s.cab_mask) > 0
    if cfg.dynamic_max_cross:
        cross_cutoff = sigmas.tr * 0.2 + 5.0
    else:
        cross_cutoff = jnp.asarray(cfg.cross_cutoff)
    cross_vec = s.atm_pos[None, :, :] - s.lig_pos[:, None, :]  # lig -> atom
    cross_len = jnp.linalg.norm(cross_vec + 1e-9, axis=-1)  # [NL, NA]
    both_c = (s.lig_mask[:, None] * s.atm_mask[None, :]) > 0
    cross_mask = (
        (cabflag[None, :] | (cross_len <= cross_cutoff)) & both_c
    ).astype(jnp.float32)
    if not cfg.use_pallas:
        la_attr = L.mlp_apply(
            params["la_edge_emb"],
            jnp.concatenate(
                [jnp.broadcast_to(temb, (nl, na, temb.shape[0])),
                 _gs(cfg, cross_len, cfg.cross_max_distance).astype(cd)],
                axis=-1,
            ),
        )
        cross_sh = L.sh_l2(cross_vec).astype(cd)

    # ---------------- message-passing trunk
    if cfg.use_pallas:
        from ..nn import pallas_conv as PC

        # the fused_layer/fused_epilogue variants exist only for the
        # row-major kernels; the cmt layout runs its finalize under XLA
        rowmajor = cfg.pallas_layout != "cmt"
        use_fused_layer = cfg.fused_layer and rowmajor
        use_fused_epi = cfg.fused_epilogue and rowmajor
        if use_fused_layer:
            players = _pallas_layers(cfg)
            # factory kernels are built for k = cfg.atom_knn; pad the
            # neighbor list when the sample is smaller
            if ka < cfg.atom_knn:
                padk = cfg.atom_knn - ka
                atm_idx_p = jnp.pad(atm_idx, ((0, 0), (0, padk)))
                atm_valid_p = jnp.pad(atm_vmask, ((0, 0), (0, padk)))
            else:
                atm_idx_p, atm_valid_p = atm_idx, atm_vmask
        else:
            pconvs = _pallas_convs(cfg)
        cnt_lig = jnp.maximum(lig_pair_mask.sum(1), 1.0)
        cnt_al = jnp.maximum(cross_mask.sum(1), 1.0)
        cnt_la = jnp.maximum(cross_mask.sum(0), 1.0)
        cnt_atm = jnp.maximum(atm_vmask.sum(1), 1.0)
        cab_f = cabflag.astype(jnp.float32)
        zero_l = jnp.zeros_like(s.lig_mask)
        # node features stay COMPONENT-MAJOR through the whole trunk (layer
        # boundaries only append new slots, which is layout-preserving);
        # converting per layer costs minor-dim transposes on [NA, din].
        # The trunk also stays f32 in pallas mode: the kernels compute f32
        # internally regardless (Mosaic rejects bf16 8-row pair tiles), so
        # a bf16 trunk would only insert an upcast round-trip per operand
        # per kernel per layer — the 'copy-done' glue in the round-1 HLO
        lig_cm = PC.cm_from_irreps(convs[0].dw.in1, lig_x.astype(jnp.float32))
        atom_cm = PC.cm_from_irreps(convs[0].dw.in1, atom_x.astype(jnp.float32))

    for l in range(cfg.num_conv_layers):
        spec = convs[l]
        out_dim = spec.out.dim
        din = lig_x.shape[-1]
        lp = {
            "lig": params["lig_convs"][l],
            "al": params["al_convs"][l],
            "la": params["la_convs"][l],
            "atom": params["atom_convs"][l],
        }

        if cfg.use_pallas and use_fused_layer:
            layer_fn = players[l]

            def fused_layer(lp, lig_cm, atom_cm):
                lparams = {
                    "emb_lig": params["lig_edge_emb"],
                    "emb_cross": params["la_edge_emb"],
                    "emb_atom": params["atom_edge_emb"],
                }
                for t in ("lig", "al", "la", "atom"):
                    lparams[f"fc_{t}"] = lp[t]["fc"]
                    lparams[f"mix_{t}"] = lp[t]["mix"]
                    lparams[f"ln_{t}"] = lp[t]["ln"]
                return layer_fn(
                    s.lig_pos, s.atm_pos, lig_cm, atom_cm,
                    s.lig_mask, s.atm_mask, cab_f, temb, cross_cutoff,
                    bond_feat, bond_mask, atm_idx_p, atm_valid_p,
                    cnt_lig, cnt_al, cnt_la, cnt_atm, lparams,
                )

            fn = jax.checkpoint(fused_layer) if cfg.remat else fused_layer
            lig_cm, atom_cm = fn(lp, lig_cm, atom_cm)
            continue

        if cfg.use_pallas:
            pl_l, pl_cross, pl_knn = pconvs[l]

            def pallas_layer(lp, lig_cm, atom_cm):
                if use_fused_epi:
                    # finalize runs in-kernel: the calls return finished
                    # updates [N, out_dim]; only residual adds stay XLA
                    lig_update = pl_l(
                        s.lig_pos, s.lig_pos, lig_cm, lig_cm,
                        s.lig_mask, s.lig_mask, zero_l, zero_l, temb,
                        cfg.lig_cutoff,
                        {**_kernel_params(params["lig_edge_emb"],
                                          lp["lig"]["fc"]),
                         "mix": lp["lig"]["mix"], "ln": lp["lig"]["ln"]},
                        bond_feat, bond_mask, cnt=cnt_lig,
                    )
                    al_update, la_update = pl_cross(
                        s.lig_pos, s.atm_pos, lig_cm, atom_cm,
                        s.lig_mask, s.atm_mask, cab_f, temb, cross_cutoff,
                        params["la_edge_emb"],
                        lp["al"]["fc"], lp["la"]["fc"],
                        fin_al={"mix": lp["al"]["mix"],
                                "ln": lp["al"]["ln"]},
                        fin_la={"mix": lp["la"]["mix"],
                                "ln": lp["la"]["ln"]},
                        cnt_al=cnt_al, cnt_la=cnt_la,
                    )
                    atom_update = pl_knn(
                        s.atm_pos, atom_cm, s.atm_mask, atm_idx, atm_vmask,
                        temb,
                        {"emb": params["atom_edge_emb"],
                         "fc": lp["atom"]["fc"],
                         "mix": lp["atom"]["mix"], "ln": lp["atom"]["ln"]},
                    )
                    lig2 = (L.pad_to_dim(lig_cm, out_dim) + lig_update
                            + al_update)
                    atom2 = (L.pad_to_dim(atom_cm, out_dim) + atom_update
                             + la_update)
                    return lig2, atom2
                lig_sum = pl_l(
                    s.lig_pos, s.lig_pos, lig_cm, lig_cm,
                    s.lig_mask, s.lig_mask, zero_l, zero_l, temb,
                    cfg.lig_cutoff,
                    _kernel_params(params["lig_edge_emb"], lp["lig"]["fc"]),
                    bond_feat,
                    bond_mask,
                )
                al_sum, la_sum = pl_cross(
                    s.lig_pos, s.atm_pos, lig_cm, atom_cm,
                    s.lig_mask, s.atm_mask, cab_f, temb, cross_cutoff,
                    params["la_edge_emb"],
                    lp["al"]["fc"],
                    lp["la"]["fc"],
                )
                lig_update = L.tp_conv_finalize_cm(
                    lp["lig"], spec, lig_sum / cnt_lig[:, None]
                )
                al_update = L.tp_conv_finalize_cm(
                    lp["al"], spec, al_sum / cnt_al[:, None]
                )
                la_update = L.tp_conv_finalize_cm(
                    lp["la"], spec, la_sum / cnt_la[:, None]
                )
                atm_sum = pl_knn(
                    s.atm_pos, atom_cm, s.atm_mask, atm_idx, atm_vmask, temb,
                    {"emb": params["atom_edge_emb"], "fc": lp["atom"]["fc"]},
                )
                atom_update = L.tp_conv_finalize_cm(
                    lp["atom"], spec, atm_sum / cnt_atm[:, None]
                )
                lig2 = L.pad_to_dim(lig_cm, out_dim) + lig_update + al_update
                atom2 = L.pad_to_dim(atom_cm, out_dim) + atom_update + la_update
                return lig2, atom2

            fn = jax.checkpoint(pallas_layer) if cfg.remat else pallas_layer
            lig_cm, atom_cm = fn(lp, lig_cm, atom_cm)
            continue

        def xla_layer(lp, lig_x, atom_x):
            # ligand <- ligand
            e = jnp.concatenate(
                [
                    lig_e_attr,
                    jnp.broadcast_to(lig_x[:, None, :ns], (nl, nl, ns)),
                    jnp.broadcast_to(lig_x[None, :, :ns], (nl, nl, ns)),
                ],
                axis=-1,
            )
            src = jnp.broadcast_to(lig_x[None, :, :], (nl, nl, din))
            m = L.tp_conv_messages(lp["lig"], spec, src, lig_sh, e)
            lig_update = L.tp_conv_finalize(
                lp["lig"], spec, L.masked_mean(m, lig_pair_mask, axis=1)
            )

            # ligand <- atoms (al), dense cross block, mean over atoms
            e = jnp.concatenate(
                [
                    la_attr,
                    jnp.broadcast_to(lig_x[:, None, :ns], (nl, na, ns)),
                    jnp.broadcast_to(atom_x[None, :, :ns], (nl, na, ns)),
                ],
                axis=-1,
            )
            src = jnp.broadcast_to(atom_x[None, :, :], (nl, na, din))
            m = L.tp_conv_messages(lp["al"], spec, src, cross_sh, e)
            al_update = L.tp_conv_finalize(
                lp["al"], spec, L.masked_mean(m, cross_mask, axis=1)
            )

            # atoms <- atoms, gather-form knn
            e = jnp.concatenate(
                [
                    atm_e_attr,
                    jnp.broadcast_to(atom_x[:, None, :ns], (na, ka, ns)),
                    atom_x[atm_idx][..., :ns],
                ],
                axis=-1,
            )
            m = L.tp_conv_messages(lp["atom"], spec, atom_x[atm_idx], atm_sh, e)
            atom_update = L.tp_conv_finalize(
                lp["atom"], spec, L.masked_mean(m, atm_vmask, axis=1)
            )

            # atoms <- ligand (la): same dense cross block, mean over lig
            e = jnp.concatenate(
                [
                    la_attr,
                    jnp.broadcast_to(atom_x[None, :, :ns], (nl, na, ns)),
                    jnp.broadcast_to(lig_x[:, None, :ns], (nl, na, ns)),
                ],
                axis=-1,
            )
            src = jnp.broadcast_to(lig_x[:, None, :], (nl, na, din))
            m = L.tp_conv_messages(lp["la"], spec, src, cross_sh, e)
            la_update = L.tp_conv_finalize(
                lp["la"], spec, L.masked_mean(m, cross_mask, axis=0)
            )

            lig2 = L.pad_to_dim(lig_x, out_dim) + lig_update + al_update
            atom2 = L.pad_to_dim(atom_x, out_dim) + atom_update + la_update
            return lig2, atom2

        fn = jax.checkpoint(xla_layer) if cfg.remat else xla_layer
        lig_x, atom_x = fn(lp, lig_x, atom_x)

    if cfg.use_pallas:
        final_ladder = convs[-1].out
        lig_x = PC.cm_to_irreps(final_ladder, lig_cm).astype(cd)
        atom_x = PC.cm_to_irreps(final_ladder, atom_cm).astype(cd)

    # ---------------- tr / rot head: center conv (tpscore.py:684-710)
    wsum = jnp.maximum(jnp.sum(s.lig_mask), 1.0)
    center = jnp.sum(s.lig_pos * s.lig_mask[:, None], axis=0) / wsum
    c_vec = s.lig_pos - center[None, :]
    c_len = jnp.linalg.norm(c_vec + 1e-12, axis=-1)
    c_attr = L.mlp_apply(
        params["center_edge_emb"],
        jnp.concatenate(
            [jnp.tile(temb, (nl, 1)),
             _gs(cfg, c_len, cfg.center_max_distance).astype(cd)],
            axis=-1,
        ),
    )
    c_attr = jnp.concatenate([c_attr, lig_x[:, :ns]], axis=-1)
    c_sh = L.sh_l2(c_vec).astype(cd)
    m = L.tp_conv_messages(params["final_conv"], final_spec, lig_x, c_sh, c_attr)
    gp = L.tp_conv_finalize(
        params["final_conv"],
        final_spec,
        L.masked_mean(m, s.lig_mask, axis=0)[None, :],
    )[0].astype(jnp.float32)

    tr_pred = gp[0:3] + gp[6:9]
    rot_pred = gp[3:6] + gp[9:12]
    # checkpoints imported from e3nn (utils/torch_import.py score_net
    # arch) carry a fixed basis rotation on l=1 outputs: the reference
    # reads its raw final-conv slots as xyz vectors in e3nn's (y,z,x)
    # basis, so reproducing its function requires rotating our (x,y,z)-
    # basis outputs by B_1 (utils/e3nn_compat.basis_change). Orthogonal,
    # so the norm-based rescale below is unaffected.
    if "readout_rot" in params:
        # the imported rotation is a fixed constant (exactly B_1,
        # orthogonal); stop_gradient keeps fine-tuning/EMA from
        # drifting it off the basis-change derivation's assumption
        rot_const = jax.lax.stop_gradient(params["readout_rot"])
        tr_pred = rot_const @ tr_pred
        rot_pred = rot_const @ rot_pred
    temb32 = temb.astype(jnp.float32)
    tr_norm = jnp.linalg.norm(tr_pred) + 1e-12
    tr_pred = tr_pred / tr_norm * L.mlp_apply(
        params["tr_final"], jnp.concatenate([tr_norm[None], temb32])
    )
    rot_norm = jnp.linalg.norm(rot_pred) + 1e-12
    rot_pred = rot_pred / rot_norm * L.mlp_apply(
        params["rot_final"], jnp.concatenate([rot_norm[None], temb32])
    )

    # ---------------- ligand pseudotorque head (tpscore.py:712-734)
    tor_pred = _pseudotorque(
        params["tor_edge_emb"],
        params["tor_bond_conv"],
        params["tor_final"],
        tor_sh_spec,
        tor_conv_spec,
        node_x=lig_x,
        node_pos=s.lig_pos,
        node_mask=s.lig_mask,
        bond_src=s.tor_src,
        bond_dst=s.tor_dst,
        bond_mask=s.tor_mask,
        k=min(32, nl),
        cutoff=cfg.lig_cutoff,
        ns=ns,
        cfg=cfg,
        cd=cd,
    )

    # ---------------- side-chain pseudotorque head (tpscore.py:736-759)
    if not cfg.no_sc_torsion:
        nres = s.sc_src.shape[0]
        sc_pred = _pseudotorque(
            params["sc_edge_emb"],
            params["sc_tor_bond_conv"],
            params["sc_tor_final"],
            tor_sh_spec,
            tor_conv_spec,
            node_x=atom_x,
            node_pos=s.atm_pos,
            node_mask=s.atm_mask,
            bond_src=s.sc_src.reshape(-1),
            bond_dst=s.sc_dst.reshape(-1),
            bond_mask=s.chi_mask.reshape(-1),
            k=24,
            cutoff=cfg.atom_cutoff,
            ns=ns,
            cfg=cfg,
            cd=cd,
        ).reshape(nres, 4)
    else:
        sc_pred = jnp.zeros(s.chi_mask.shape)

    # ---------------- scale by sigma (tpscore.py:554-569) — on-device tables
    if cfg.scale_by_sigma:
        tr_pred = tr_pred / sigmas.tr
        rot_pred = rot_pred * so3.score_norm(sigmas.rot)
        tor_pred = tor_pred * jnp.sqrt(torus.score_norm(sigmas.tor))
        sc_pred = sc_pred * jnp.sqrt(torus.score_norm(sigmas.sc_tor))

    return ScoreOutput(
        tr=tr_pred,
        rot=rot_pred,
        tor=tor_pred * s.tor_mask,
        sc_tor=sc_pred * s.chi_mask,
    )


def _pseudotorque(
    emb_p,
    conv_p,
    final_p,
    tor_sh_spec,
    tor_conv_spec,
    *,
    node_x,
    node_pos,
    node_mask,
    bond_src,
    bond_dst,
    bond_mask,
    k,
    cutoff,
    ns,
    cfg,
    cd=jnp.float32,
):
    """Shared pseudotorque conv: bond midpoints gather nearby nodes, edge sh
    is FullTP(sh(edge), sh_2e(bond)), output a scalar score per bond."""
    nb = bond_src.shape[0]
    bond_vec = node_pos[bond_dst] - node_pos[bond_src]
    bond_sh2 = L.sh_l2(bond_vec)[..., 4:9].astype(cd)  # l=2 component only
    bond_attr = node_x[bond_src] + node_x[bond_dst]
    mid = 0.5 * (node_pos[bond_src] + node_pos[bond_dst])

    idx, valid = L.knn_edges(mid, node_pos, bond_mask, node_mask, k=k, cutoff=cutoff)
    vec = node_pos[idx] - mid[:, None, :]  # [NB, K, 3]
    length = jnp.linalg.norm(vec + 1e-12, axis=-1)
    e_attr = L.mlp_apply(emb_p, _gs(cfg, length, cutoff).astype(cd))  # [NB, K, ns]
    e_attr = jnp.concatenate(
        [
            e_attr,
            node_x[idx][..., :ns],
            jnp.broadcast_to(bond_attr[:, None, :ns], (nb, k, ns)),
        ],
        axis=-1,
    )
    e_sh = L.sh_l2(vec).astype(cd)  # [NB, K, 9]
    tor_sh = apply_full_tensor_product(
        tor_sh_spec, e_sh, jnp.broadcast_to(bond_sh2[:, None, :], (nb, k, 5))
    )
    m = L.tp_conv_messages(conv_p, tor_conv_spec, node_x[idx], tor_sh, e_attr)
    agg = L.masked_mean(m, valid.astype(jnp.float32), axis=1)  # [NB, 2ns]
    agg = L.tp_conv_finalize(conv_p, tor_conv_spec, agg)
    return L.mlp_apply(final_p, agg, act=jnp.tanh)[..., 0].astype(jnp.float32)


def apply_batched(params, cfg: ScoreNetConfig, batch: DockingSample, t, sigmas):
    """vmap over the leading batch axis of every field + t + sigmas."""
    return jax.vmap(lambda s_, t_, sg_: apply(params, cfg, s_, t_, sg_))(
        batch, t, sigmas
    )


def sigmas_from_t(t, schedule) -> Sigmas:
    """Geometric interpolation sigma_min^(1-t) sigma_max^t (scFlex.py:93-102)."""
    def geo(lo, hi):
        return lo ** (1.0 - t) * hi**t

    return Sigmas(
        tr=geo(schedule["tr_sigma_min"], schedule["tr_sigma_max"]),
        rot=geo(schedule["rot_sigma_min"], schedule["rot_sigma_max"]),
        tor=geo(schedule["tor_sigma_min"], schedule["tor_sigma_max"]),
        sc_tor=geo(schedule["sc_tor_sigma_min"], schedule["sc_tor_sigma_max"]),
    )
