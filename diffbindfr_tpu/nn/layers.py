"""Functional NN building blocks for the score network.

Explicit param-pytree style (init returns a dict, apply is a pure function):
this keeps everything jit/pjit/scan-friendly and trivially shardable without
a module framework. Blocks mirror the reference semantics:

  * mlp            -> SimpleLinear (tpscore.py:109-141): Linear-act-drop-Linear
  * irreps_layer_norm -> equivariant LayerNorm "V3 + learnable mean shift"
                      (tpscore.py:20-107), 'component' normalization
  * gaussian_smearing -> schnet.py:142-176
  * sinusoidal_time_emb -> time_emb.py:9-26 (scale 1000)
  * atom_encoder   -> equibind_encoder.py:10-90 (categorical embedding sum +
                      scalar linear refeed)
  * tp_conv        -> TensorProductConvLayer (tpscore.py:143-199): per-edge
                      weighted fully-connected tensor product with weights
                      from an edge-attr MLP, masked mean aggregation, LN.

All shapes are static; padded elements are handled by explicit masks so the
whole stack jits once per bucket.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

import dataclasses

from .irreps import (
    Irreps,
    LinearSpec,
    TensorProductSpec,
    apply_dw_tensor_product,
    apply_fc_tensor_product,
    apply_linear,
    compile_dw_tensor_product,
    compile_fc_tensor_product,
    compile_linear,
    linear_weight_init,
    spherical_harmonics_l2,
)

# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def kaiming_uniform(key, shape, dtype=jnp.float32):
    a = math.sqrt(6.0 / shape[0])
    return jax.random.uniform(key, shape, dtype, -a, a)


# ---------------------------------------------------------------------------
# linear / mlp
# ---------------------------------------------------------------------------


def linear_init(key, din: int, dout: int, bias: bool = True):
    p = {"w": xavier_uniform(key, (din, dout))}
    if bias:
        p["b"] = jnp.zeros((dout,))
    return p


def linear_apply(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def mlp_init(key, din: int, dout: int, hidden: int | None = None, bias: bool = True):
    """Two-layer MLP matching SimpleLinear: hidden defaults to dout."""
    hidden = dout if hidden is None else hidden
    k1, k2 = jax.random.split(key)
    return {
        "l1": linear_init(k1, din, hidden, bias),
        "l2": linear_init(k2, hidden, dout, bias),
    }


def mlp_apply(p, x, act=jax.nn.relu, dropout: float = 0.0, rng=None):
    h = act(linear_apply(p["l1"], x))
    if dropout > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout), 0.0)
    return linear_apply(p["l2"], h)


# ---------------------------------------------------------------------------
# equivariant layer norm
# ---------------------------------------------------------------------------


def irreps_layer_norm_init(irreps: Irreps):
    num_irreps = sum(mul for mul, _ in irreps.items)
    mean_shift = np.concatenate(
        [
            (np.ones(mul) if (ir.l == 0 and ir.p == 1) else np.zeros(mul))
            for mul, ir in irreps.items
        ]
    )
    return {
        "mean_shift": jnp.asarray(mean_shift, jnp.float32),
        "weight": jnp.ones((num_irreps,)),
        "bias": jnp.zeros((irreps.num_scalars,)),
    }


def irreps_layer_norm_apply(p, irreps: Irreps, x: jnp.ndarray, eps: float = 1e-5):
    """x: [..., irreps.dim]. Component normalization, per irrep block."""
    outs = []
    iw = 0
    ib = 0
    ims = 0
    for off, mul, ir in irreps.slices():
        d = ir.dim
        field = x[..., off : off + mul * d].reshape(x.shape[:-1] + (mul, d))
        mean = jnp.mean(field, axis=-2, keepdims=True)
        shift = p["mean_shift"][ims : ims + mul][:, None]
        field = field - mean * shift
        ims += mul
        norm = jnp.mean(field**2, axis=-1)  # [..., mul]
        norm = jnp.mean(norm, axis=-1, keepdims=True)  # [..., 1]
        inv = jax.lax.rsqrt(norm + eps)
        inv = inv * p["weight"][iw : iw + mul]
        iw += mul
        field = field * inv[..., None]
        if d == 1 and ir.p == 1:
            field = field + p["bias"][ib : ib + mul][:, None]
            ib += mul
        outs.append(field.reshape(x.shape[:-1] + (mul * d,)))
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------


def gaussian_smearing(d: jnp.ndarray, start: float, stop: float, num: int):
    """[...,] distances -> [..., num] RBF features (schnet.py:142-176)."""
    offset = jnp.linspace(start, stop, num)
    coeff = -0.5 / (offset[1] - offset[0]) ** 2
    return jnp.exp(coeff * (d[..., None] - offset) ** 2)


def sinusoidal_time_emb(t: jnp.ndarray, dim: int, scale: float = 1000.0):
    """t: [...] in [0, 1] -> [..., dim]; reference sinusoidal_embedding with
    emb_scale pre-multiplication (time_emb.py:9-26,51)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) / (half - 1) * jnp.arange(half))
    ang = (t * scale)[..., None] * freqs
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


def embedding_init(key, num: int, dim: int):
    return {"emb": xavier_uniform(key, (num, dim))}


def atom_encoder_init(key, emb_dim: int, cat_dims: tuple, scalar_dim: int):
    keys = jax.random.split(key, len(cat_dims) + 1)
    p = {
        "embs": [embedding_init(k, n, emb_dim) for k, n in zip(keys[:-1], cat_dims)],
    }
    if scalar_dim > 0:
        p["scalar_lin"] = {
            "w": kaiming_uniform(keys[-1], (emb_dim + scalar_dim, emb_dim))
        }
    return p


def atom_encoder_apply(p, cat_feats: jnp.ndarray, scalars: jnp.ndarray | None):
    """cat_feats: [..., n_cat] int ids; scalars: [..., scalar_dim] or None."""
    x = 0.0
    for i, e in enumerate(p["embs"]):
        x = x + e["emb"][cat_feats[..., i]]
    if scalars is not None and "scalar_lin" in p:
        x = x + jnp.concatenate([x, scalars], axis=-1) @ p["scalar_lin"]["w"]
    return x


# ---------------------------------------------------------------------------
# tensor-product convolution
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    """Static description of one tensor-product conv layer.

    mode 'fc': reference-exact FullyConnectedTensorProduct with per-edge
    uvw weights (tpscore.py:143-199). Inherently VPU-bound on TPU (the
    edge index rides both operands of the channel contraction, so the MXU
    cannot be used) — kept for parity experiments.

    mode 'sep' (default): separable factorization — depthwise TP with
    per-edge per-channel gains (VPU-cheap) + edge-independent irreps
    Linear applied AFTER aggregation (it commutes with the masked mean, so
    it runs per node on big MXU matmuls). ~20x faster at matched width.
    """

    mode: str
    out: Irreps
    fc: TensorProductSpec | None = None
    dw: TensorProductSpec | None = None
    lin: LinearSpec | None = None

    @property
    def msg_dim(self) -> int:
        return (self.dw if self.mode == "sep" else self.fc).out.dim


def make_conv_spec(in_s: str, sh_s: str, out_s: str, mode: str = "sep") -> ConvSpec:
    out = Irreps.parse(out_s)
    if mode == "fc":
        return ConvSpec(mode, out, fc=compile_fc_tensor_product(in_s, sh_s, out_s))
    lmax = max(ir.l for _, ir in out.items)
    dw = compile_dw_tensor_product(in_s, sh_s, lmax_out=lmax)
    lin = compile_linear(str(dw.out), out_s)
    return ConvSpec(mode, out, dw=dw, lin=lin)


def tp_conv_init(
    key,
    spec: ConvSpec | TensorProductSpec,
    n_edge_features: int,
    hidden: int | None = None,
    layer_norm: bool = True,
):
    if isinstance(spec, TensorProductSpec):  # back-compat: bare fc spec
        spec = ConvSpec("fc", spec.out, fc=spec)
    k1, k2 = jax.random.split(key)
    tp = spec.fc if spec.mode == "fc" else spec.dw
    p = {
        "fc": mlp_init(
            k1, n_edge_features, tp.weight_numel, hidden or n_edge_features
        )
    }
    if spec.mode == "sep":
        p["mix"] = linear_weight_init(k2, spec.lin)
    if layer_norm:
        p["ln"] = irreps_layer_norm_init(spec.out)
    return p


def tp_conv_messages(
    p,
    spec: ConvSpec | TensorProductSpec,
    src_feat: jnp.ndarray,  # [E, in1.dim] features of message source nodes
    edge_sh: jnp.ndarray,  # [E, in2.dim]
    edge_attr: jnp.ndarray,  # [E, n_edge_features]
    dropout: float = 0.0,
    rng=None,
):
    """Per-edge weighted tensor product (before aggregation). In 'sep'
    mode the result lives in the intermediate depthwise irreps space; the
    channel mixing happens in tp_conv_finalize after aggregation."""
    if isinstance(spec, TensorProductSpec):
        spec = ConvSpec("fc", spec.out, fc=spec)
    w = mlp_apply(p["fc"], edge_attr, dropout=dropout, rng=rng)
    if spec.mode == "fc":
        return apply_fc_tensor_product(spec.fc, src_feat, edge_sh, w)
    return apply_dw_tensor_product(spec.dw, src_feat, edge_sh, w)


def tp_conv_finalize(p, spec: ConvSpec | TensorProductSpec, agg: jnp.ndarray):
    if isinstance(spec, TensorProductSpec):
        spec = ConvSpec("fc", spec.out, fc=spec)
    if spec.mode == "sep":
        agg = apply_linear(spec.lin, agg, p["mix"])
    if "ln" in p:
        agg = irreps_layer_norm_apply(p["ln"], spec.out, agg)
    return agg


# ---------------------------------------------------------------------------
# masked aggregation helpers
# ---------------------------------------------------------------------------


def masked_mean(msgs: jnp.ndarray, mask: jnp.ndarray, axis: int):
    """Mean of msgs over `axis` counting only mask==1 entries.

    Accumulates in f32 when the reduced axis is long (bf16 sums over
    hundreds of neighbors lose precision); short reductions (knn K) keep
    the message dtype to halve HBM traffic. Returns msgs.dtype."""
    m = mask[..., None] if mask.ndim == msgs.ndim - 1 else mask
    acc = jnp.float32 if msgs.shape[axis] > 32 else msgs.dtype
    macc = m.astype(acc)
    s = jnp.sum(msgs.astype(acc) * macc, axis=axis)
    n = jnp.sum(m.astype(jnp.float32), axis=axis)
    return (s.astype(jnp.float32) / jnp.maximum(n, 1.0)).astype(msgs.dtype)


def segment_mean(
    msgs: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int, mask: jnp.ndarray
):
    """Masked mean aggregation by target id (for scatter-style edges)."""
    m = mask.astype(msgs.dtype)
    s = jax.ops.segment_sum(msgs * m[:, None], seg_ids, num_segments)
    n = jax.ops.segment_sum(m, seg_ids, num_segments)
    return s / jnp.maximum(n, 1.0)[:, None]


def pad_to_dim(x: jnp.ndarray, dim: int):
    """Right-pad the last axis with zeros (irreps ladder residuals)."""
    if x.shape[-1] == dim:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, dim - x.shape[-1])])


# ---------------------------------------------------------------------------
# neighbor lists (replaces torch_cluster radius / radius_graph)
# ---------------------------------------------------------------------------


def knn_edges(
    pos_q: jnp.ndarray,  # [Nq, 3]
    pos_k: jnp.ndarray,  # [Nk, 3]
    mask_q: jnp.ndarray,  # [Nq]
    mask_k: jnp.ndarray,  # [Nk]
    k: int,
    cutoff,
    exclude_self: bool = False,
):
    """Fixed-degree neighbor list from dense distances (TPU-friendly O(Nq*Nk)).

    Returns (idx [Nq, k], valid [Nq, k]). Keeps the k *nearest* key points
    within `cutoff` of each query; `cutoff` may be a traced scalar (the
    sigma-dependent cross cutoff, tpscore.py:653-657). Truncation at k drops
    the farthest neighbors first, approximating the reference's unbounded
    radius graphs with a static shape.
    """
    k = min(k, pos_k.shape[0])
    d2 = jnp.sum((pos_q[:, None, :] - pos_k[None, :, :]) ** 2, axis=-1)
    big = jnp.asarray(1e10, d2.dtype)
    invalid = (~mask_k.astype(bool))[None, :]
    if exclude_self:
        nq = pos_q.shape[0]
        eye = jnp.eye(nq, pos_k.shape[0], dtype=bool)
        invalid = invalid | eye
    d2 = jnp.where(invalid, big, d2)
    # exact top_k: the approximate variant can pick different (equidistant
    # to fp error) neighbor sets after a global rotation, breaking the
    # SE(3) invariance contract of downstream models
    neg, idx = jax.lax.top_k(-d2, k)
    d2_sel = -neg
    valid = (
        (d2_sel <= jnp.asarray(cutoff, d2.dtype) ** 2)
        & mask_q.astype(bool)[:, None]
        & (d2_sel < big * 0.5)
    )
    return idx, valid


def edge_vectors(pos_src, pos_dst, idx_src, idx_dst):
    """vec[e] = pos_dst[idx_dst[e]] - pos_src[idx_src[e]] plus length."""
    vec = pos_dst[idx_dst] - pos_src[idx_src]
    length = jnp.linalg.norm(vec + 1e-12, axis=-1)
    return vec, length


def sh_l2(vec: jnp.ndarray):
    """Spherical harmonics 0e+1o+2e with component normalization."""
    return spherical_harmonics_l2(vec, normalize=True)


def irreps_layer_norm_apply_cm(p, irreps: Irreps, x: jnp.ndarray, eps: float = 1e-5):
    """irreps_layer_norm_apply on component-major layout (d blocks of mul)."""
    outs = []
    iw = 0
    ib = 0
    ims = 0
    for off, mul, ir in irreps.slices():
        d = ir.dim
        comps = [x[..., off + k * mul : off + (k + 1) * mul] for k in range(d)]
        field = jnp.stack(comps, axis=-2)  # [..., d, mul]
        mean = jnp.mean(field, axis=-1, keepdims=True)  # over channels
        shift = p["mean_shift"][ims : ims + mul]
        field = field - mean * shift[None, :]
        ims += mul
        norm = jnp.mean(field**2, axis=-2)  # over components -> [..., mul]
        norm = jnp.mean(norm, axis=-1, keepdims=True)  # over channels
        inv = jax.lax.rsqrt(norm + eps) * p["weight"][iw : iw + mul]
        iw += mul
        field = field * inv[..., None, :]
        if d == 1 and ir.p == 1:
            field = field + p["bias"][ib : ib + mul][None, :]
            ib += mul
        outs.append(
            jnp.concatenate([field[..., k, :] for k in range(d)], axis=-1)
        )
    return jnp.concatenate(outs, axis=-1)


def tp_conv_finalize_cm(p, spec: ConvSpec, agg_cm: jnp.ndarray):
    """tp_conv_finalize entirely in component-major layout ('sep' mode)."""
    assert spec.mode == "sep"
    from .irreps import apply_linear_cm

    out = apply_linear_cm(spec.lin, agg_cm, p["mix"])
    if "ln" in p:
        out = irreps_layer_norm_apply_cm(p["ln"], spec.out, out)
    return out
