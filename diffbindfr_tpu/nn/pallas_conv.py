"""Fused Pallas TPU kernel for the dense-pair separable TP convolution.

The score network's dominant cost is the ligand<->pocket cross convolution:
for every (ligand atom, pocket atom) pair it computes edge geometry, two
small MLPs (edge embedding -> 48, TP-weight 144 -> 144 -> n_dw), a
depthwise tensor product, and a masked sum. The XLA lowering materializes
every intermediate pair tensor in HBM ([B, 64, 512, 144/288/624] ...),
leaving the op bandwidth-bound ~10x off roofline.

This kernel fuses the whole chain for one (target-tile x source-tile) pair
block in VMEM: HBM traffic drops to node features in, aggregated node
messages out. The pair axis never touches HBM.

Layout notes:
  * targets ride the 8-sublane tile (output rows), sources the 128-lane
    tile; pair tensors are [8, 128] planes / [1024, F] rows.
  * irreps features cross the kernel boundary in COMPONENT-MAJOR layout
    (each slot stored as d1 contiguous [mul] lane blocks) so every slice
    in the inner loops is contiguous — `cm_from_irreps` / `cm_to_irreps`
    convert at node level (cheap, outside).
  * grid = (target_tiles, source_tiles), sources innermost; the output
    block stays in VMEM and accumulates across source tiles.

Serves both cross directions ('al': ligand <- atoms, 'la': atoms <-
ligand; the direction flips the edge-vector sign and which side the CA/CB
always-connect flag lives on) and the dense ligand-ligand conv
(edge_extra bond features + self-exclusion).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .irreps import (Irreps, TensorProductSpec, apply_dw_tensor_product,
                     clebsch_gordan, spherical_harmonics_l2)

T_TGT = 8
T_SRC = 128


# ---------------------------------------------------------------------------
# component-major layout converters (node-level, run under XLA)
# ---------------------------------------------------------------------------


def cm_from_irreps(irreps: Irreps, x: jnp.ndarray) -> jnp.ndarray:
    """[..., dim] irreps layout ([mul, d] channel-major per slot) ->
    component-major ([d, mul] per slot)."""
    parts = []
    for off, mul, ir in irreps.slices():
        d = ir.dim
        blk = x[..., off : off + mul * d]
        if d > 1:
            blk = (
                blk.reshape(x.shape[:-1] + (mul, d))
                .swapaxes(-1, -2)
                .reshape(x.shape[:-1] + (mul * d,))
            )
        parts.append(blk)
    return jnp.concatenate(parts, axis=-1)


def cm_to_irreps(irreps: Irreps, x: jnp.ndarray) -> jnp.ndarray:
    parts = []
    for off, mul, ir in irreps.slices():
        d = ir.dim
        blk = x[..., off : off + mul * d]
        if d > 1:
            blk = (
                blk.reshape(x.shape[:-1] + (d, mul))
                .swapaxes(-1, -2)
                .reshape(x.shape[:-1] + (mul * d,))
            )
        parts.append(blk)
    return jnp.concatenate(parts, axis=-1)


def _path_constants(spec: TensorProductSpec):
    """Static per-path metadata + stacked sh->Cb contraction matrix.
    cb column layout per path: [i * d3 + k]."""
    metas = []
    ck_cols = []
    off = 0
    for p in spec.paths:
        d1, d2, d3 = 2 * p.l1 + 1, 2 * p.l2 + 1, 2 * p.l3 + 1
        C = clebsch_gordan(p.l1, p.l2, p.l3)  # [d1, d2, d3]
        block = np.zeros((9, d1 * d3))
        block[p.s2 : p.s2 + d2] = (
            np.transpose(C, (1, 0, 2)).reshape(d2, d1 * d3) * p.alpha
        )
        ck_cols.append(block)
        metas.append(
            dict(s1=p.s1, mul=p.mul1, d1=d1, d3=d3, s3=p.s3,
                 w_off=p.w_offset, cb_off=off)
        )
        off += d1 * d3
    return metas, np.concatenate(ck_cols, axis=1)  # [9, KDIM]


def _pad_axis(x, n, axis=0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad) if n != x.shape[axis] else x


# ---------------------------------------------------------------------------
# XLA twins + custom VJPs
#
# Each fused kernel gets a plain-jnp twin computing the exact same function
# (same masks, same f32 internal precision, same CM-layout boundary). The
# kernel is wrapped in jax.custom_vjp: the forward runs the fused Pallas
# kernel, the backward differentiates the twin. Training with
# use_pallas=True therefore runs fused forward passes while the backward
# re-derives the pair-space intermediates under XLA — the same memory
# profile as the pure-XLA training path (bounded per layer by remat), but
# every forward (including the remat recompute) stays on the fast path.
# ---------------------------------------------------------------------------


def _mlp2(w1, b1, w2, b2, x):
    h = jax.nn.relu(x @ w1.astype(jnp.float32) + b1.astype(jnp.float32))
    return h @ w2.astype(jnp.float32) + b2.astype(jnp.float32)


# ---------------------------------------------------------------------------
# finalize-epilogue helpers (shared with pallas_layer): the per-conv
# count-divide -> irreps-Linear mix -> irreps LayerNorm chain, run inside
# the kernel at the last grid step instead of as XLA ops on [B, N, dout]
# tensors in HBM
# ---------------------------------------------------------------------------


def dense_mix_cm(lin, w: jnp.ndarray) -> jnp.ndarray:
    """Expand the block-sparse irreps Linear into one dense [in, out]
    matrix in COMPONENT-MAJOR layout: x_cm @ D == apply_linear_cm(x_cm, w).
    Built per call under XLA (tiny); the kernel runs the mix as a single
    MXU matmul."""
    D = jnp.zeros((lin.in_irreps.dim, lin.out_irreps.dim), w.dtype)
    out_slices = list(lin.out_irreps.slices())
    for ins, i3, w_off, n_in, mul3 in lin.blocks:
        off3, _, ir3 = out_slices[i3]
        W = w[w_off : w_off + n_in * mul3].reshape(n_in, mul3)
        for k in range(ir3.dim):
            row = 0
            for o, m in ins:
                D = D.at[
                    o + k * m : o + (k + 1) * m,
                    off3 + k * mul3 : off3 + (k + 1) * mul3,
                ].set(W[row : row + m])
                row += m
    return D


def ln_tables(out: Irreps):
    """Static slot table for the in-kernel CM LayerNorm + packed param
    sizes (weight/mean_shift per slot channel, bias per 0e channel)."""
    slots = []
    iw = ib = 0
    for off, mul, ir in out.slices():
        is_0e = ir.l == 0 and ir.p == 1
        slots.append(dict(off=off, mul=mul, d=ir.dim, iw=iw,
                          ib=ib if is_0e else -1, is_0e=is_0e))
        iw += mul
        if is_0e:
            ib += mul
    return slots, iw, ib


def make_ln_cm(out: Irreps):
    """In-kernel irreps LayerNorm in CM layout; params as [1, n] refs."""
    slots, _, _ = ln_tables(out)

    def ln_cm(x, w_ref, ms_ref, b_ref):
        outs = []
        for s in slots:
            off, mul, d = s["off"], s["mul"], s["d"]
            comps = [x[:, off + kk * mul : off + (kk + 1) * mul]
                     for kk in range(d)]
            shift = ms_ref[0, s["iw"] : s["iw"] + mul]
            sub = [c - jnp.mean(c, axis=-1, keepdims=True) * shift[None, :]
                   for c in comps]
            norm = sum(jnp.mean(c * c, axis=-1, keepdims=True) for c in sub)
            norm = norm / d
            inv = jax.lax.rsqrt(norm + 1e-5) * w_ref[
                0, s["iw"] : s["iw"] + mul
            ][None, :]
            sub = [c * inv for c in sub]
            if s["is_0e"]:
                sub[0] = sub[0] + b_ref[0, s["ib"] : s["ib"] + mul][None, :]
            outs.extend(sub)
        return jnp.concatenate(outs, axis=-1)

    return ln_cm


def _fin_twin(fin, params, agg_cm, cnt):
    """jnp finalize for the VJP twins: divide -> mix -> LN (f32, CM)."""
    from . import layers as L
    from .irreps import apply_linear_cm

    y = agg_cm / jnp.maximum(cnt, 1.0)[:, None]
    y = apply_linear_cm(fin.lin, y, params["mix"].astype(jnp.float32))
    return L.irreps_layer_norm_apply_cm(params["ln"], fin.out, y)


def _vjp_wrap(pallas_fn, twin_fn):
    """jax.custom_vjp: pallas forward, twin-VJP backward. Both functions
    must share one positional signature and compute the same values."""
    f = jax.custom_vjp(pallas_fn)

    def fwd(*args):
        return pallas_fn(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(twin_fn, *args)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def make_pair_twin(
    spec: TensorProductSpec,
    *,
    din: int,
    ns: int,
    sed: int,
    gs_stop: float,
    gs_n: int,
    edge_extra: int = 0,
    flip_vec: bool = False,
    cab_on_src: bool = True,
    exclude_self: bool = False,
    fin=None,
):
    """Exact jnp twin of the fused pair conv (shared by the row-major and
    transposed kernels as the custom-VJP backward)."""
    offs_np = np.linspace(0.0, gs_stop, gs_n)
    gs_coeff = float(-0.5 / (offs_np[1] - offs_np[0]) ** 2)

    def twin(tgt_pos, src_pos, tgt_x_cm, src_x_cm, tgt_mask, src_mask,
             cab_t, cab_s, temb, cutoff, params, bond_feat, bond_mask,
             cnt=None):
        f32 = jnp.float32
        tgt_x_cm = tgt_x_cm.astype(f32)
        src_x_cm = src_x_cm.astype(f32)
        src_x = cm_to_irreps(spec.in1, src_x_cm)
        nt0, ns0 = tgt_x_cm.shape[0], src_x_cm.shape[0]
        vec = (src_pos[None, :, :] - tgt_pos[:, None, :]).astype(f32)
        if flip_vec:
            vec = -vec
        d = jnp.sqrt(jnp.sum(vec * vec, axis=-1) + 1e-12)
        cab = cab_s[None, :] if cab_on_src else cab_t[:, None]
        base = (cab > 0) | (d <= cutoff)
        if exclude_self:
            base = base & (
                jnp.arange(nt0)[:, None] != jnp.arange(ns0)[None, :]
            )
            if edge_extra:
                base = base | (bond_mask > 0)
        mask = base & (tgt_mask[:, None] > 0) & (src_mask[None, :] > 0)
        gs = jnp.exp(
            gs_coeff * (d[..., None] - jnp.asarray(offs_np, f32)) ** 2
        )
        tem = jnp.broadcast_to(temb.astype(f32), (nt0, ns0, sed))
        parts = (
            [bond_feat.astype(f32), tem, gs] if edge_extra else [tem, gs]
        )
        attr = _mlp2(params["emb_w1"], params["emb_b1"],
                     params["emb_w2"], params["emb_b2"],
                     jnp.concatenate(parts, axis=-1))
        e = jnp.concatenate(
            [attr,
             jnp.broadcast_to(tgt_x_cm[:, None, :ns], (nt0, ns0, ns)),
             jnp.broadcast_to(src_x_cm[None, :, :ns], (nt0, ns0, ns))],
            axis=-1,
        )
        w = _mlp2(params["fc_w1"], params["fc_b1"],
                  params["fc_w2"], params["fc_b2"], e)
        sh = spherical_harmonics_l2(vec, normalize=True).astype(f32)
        src_b = jnp.broadcast_to(src_x[None, :, :], (nt0, ns0, din))
        m = apply_dw_tensor_product(spec, src_b, sh, w)
        msum = jnp.sum(m * mask[..., None].astype(f32), axis=1)
        out = cm_from_irreps(spec.out, msum)
        if fin is not None:
            out = _fin_twin(fin, params, out, cnt)
        return out

    return twin


def make_cross_twin(
    spec: TensorProductSpec,
    *,
    din: int,
    ns: int,
    sed: int,
    gs_stop: float,
    gs_n: int,
    fin=None,
):
    """Exact jnp twin of the dual cross conv."""
    offs_np = np.linspace(0.0, gs_stop, gs_n)
    gs_coeff = float(-0.5 / (offs_np[1] - offs_np[0]) ** 2)

    def twin(lig_pos, atm_pos, lig_cm, atm_cm, lig_mask, atm_mask,
             cabflag, temb, cutoff, emb_params, fc_al, fc_la,
             fin_al=None, fin_la=None, cnt_al=None, cnt_la=None):
        f32 = jnp.float32
        lig_cm = lig_cm.astype(f32)
        atm_cm = atm_cm.astype(f32)
        lig_x = cm_to_irreps(spec.in1, lig_cm)
        atm_x = cm_to_irreps(spec.in1, atm_cm)
        nl0, na0 = lig_cm.shape[0], atm_cm.shape[0]
        vec = (atm_pos[None, :, :] - lig_pos[:, None, :]).astype(f32)
        d = jnp.sqrt(jnp.sum(vec * vec, axis=-1) + 1e-12)
        mask = (cabflag[None, :] > 0) | (d <= cutoff)
        mask = mask & (lig_mask[:, None] > 0) & (atm_mask[None, :] > 0)
        maskf = mask[..., None].astype(f32)
        gs = jnp.exp(
            gs_coeff * (d[..., None] - jnp.asarray(offs_np, f32)) ** 2
        )
        tem = jnp.broadcast_to(temb.astype(f32), (nl0, na0, sed))
        attr = _mlp2(emb_params["l1"]["w"], emb_params["l1"]["b"],
                     emb_params["l2"]["w"], emb_params["l2"]["b"],
                     jnp.concatenate([tem, gs], axis=-1))
        lig_sc = jnp.broadcast_to(lig_cm[:, None, :ns], (nl0, na0, ns))
        atm_sc = jnp.broadcast_to(atm_cm[None, :, :ns], (nl0, na0, ns))
        sh = spherical_harmonics_l2(vec, normalize=True).astype(f32)
        # al: messages from atoms, aggregated at ligand rows
        w_al = _mlp2(fc_al["l1"]["w"], fc_al["l1"]["b"],
                     fc_al["l2"]["w"], fc_al["l2"]["b"],
                     jnp.concatenate([attr, lig_sc, atm_sc], axis=-1))
        m_al = apply_dw_tensor_product(
            spec, jnp.broadcast_to(atm_x[None, :, :], (nl0, na0, din)),
            sh, w_al)
        al = jnp.sum(m_al * maskf, axis=1)
        # la: messages from ligand, aggregated at atom columns (same sh)
        w_la = _mlp2(fc_la["l1"]["w"], fc_la["l1"]["b"],
                     fc_la["l2"]["w"], fc_la["l2"]["b"],
                     jnp.concatenate([attr, atm_sc, lig_sc], axis=-1))
        m_la = apply_dw_tensor_product(
            spec, jnp.broadcast_to(lig_x[:, None, :], (nl0, na0, din)),
            sh, w_la)
        la = jnp.sum(m_la * maskf, axis=0)
        al_cm = cm_from_irreps(spec.out, al)
        la_cm = cm_from_irreps(spec.out, la)
        if fin is not None:
            al_cm = _fin_twin(fin, fin_al, al_cm, cnt_al)
            la_cm = _fin_twin(fin, fin_la, la_cm, cnt_la)
        return al_cm, la_cm

    return twin


def make_knn_twin(
    spec: TensorProductSpec,
    *,
    din: int,
    ns: int,
    sed: int,
    gs_stop: float,
    gs_n: int,
    k: int,
    fin=None,
):
    """Exact jnp twin of the fused knn conv."""
    offs_np = np.linspace(0.0, gs_stop, gs_n)
    gs_coeff = float(-0.5 / (offs_np[1] - offs_np[0]) ** 2)

    def twin(pos, x_cm, mask, idx, valid, temb, params):
        f32 = jnp.float32
        x_cm = x_cm.astype(f32)
        x = cm_to_irreps(spec.in1, x_cm)
        vec = (pos[idx] - pos[:, None, :]).astype(f32)
        d = jnp.sqrt(jnp.sum(vec * vec, axis=-1) + 1e-12)
        gs = jnp.exp(
            gs_coeff * (d[..., None] - jnp.asarray(offs_np, f32)) ** 2
        )
        tem = jnp.broadcast_to(temb.astype(f32), idx.shape + (sed,))
        e = params["emb"]
        attr = _mlp2(e["l1"]["w"], e["l1"]["b"], e["l2"]["w"], e["l2"]["b"],
                     jnp.concatenate([tem, gs], axis=-1))
        ee = jnp.concatenate(
            [attr,
             jnp.broadcast_to(x_cm[:, None, :ns], idx.shape + (ns,)),
             x_cm[idx][..., :ns]],
            axis=-1,
        )
        fc = params["fc"]
        w = _mlp2(fc["l1"]["w"], fc["l1"]["b"], fc["l2"]["w"], fc["l2"]["b"],
                  ee)
        sh = spherical_harmonics_l2(vec, normalize=True).astype(f32)
        m = apply_dw_tensor_product(spec, x[idx], sh, w)
        msum = jnp.sum(m * valid.astype(f32)[..., None], axis=1)
        out = cm_from_irreps(spec.out, msum)
        if fin is not None:
            out = _fin_twin(fin, params, out,
                            jnp.sum(valid.astype(f32), axis=1))
        return out

    return twin


def make_pair_conv(
    spec: TensorProductSpec,
    *,
    din: int,
    ns: int,
    sed: int,
    gs_stop: float,
    gs_n: int,
    edge_extra: int = 0,
    flip_vec: bool = False,
    cab_on_src: bool = True,
    exclude_self: bool = False,
    interpret: bool | None = None,
    tile_t: int = T_TGT,
    fin=None,
):
    """Build the fused conv. Returned fn aggregates masked SUMS of dw-TP
    messages per target node (divide by counts outside):

        fn(tgt_pos, src_pos, tgt_x_cm, src_x_cm, tgt_mask, src_mask,
           cab_t, cab_s, temb, cutoff, params, bond_feat=None)
        -> msg_sum [Nt, spec.out.dim] in COMPONENT-MAJOR layout (f32)

    tgt_x_cm/src_x_cm must already be component-major (cm_from_irreps on
    the in1 irreps); the scalar block (first ns lanes) is layout-invariant.

    With `fin` (a layers.ConvSpec), the finalize epilogue — count divide,
    dense CM irreps-Linear mix, irreps LayerNorm — runs INSIDE the kernel
    at the last source tile and the fn returns the finished update
    [Nt, fin.out.dim] instead of raw sums; the call then takes
    `cnt=[Nt]` and params gains {'mix': weight vector, 'ln': LN dict}.
    """
    metas, ck_np = _path_constants(spec)
    if fin is not None:
        fin_dim = fin.out.dim
        ln_fn = make_ln_cm(fin.out)
        _, ln_nw, ln_nb = ln_tables(fin.out)
        nbw = max(ln_nb, 1)
    offs_np = np.linspace(0.0, gs_stop, gs_n)
    gs_coeff = float(-0.5 / (offs_np[1] - offs_np[0]) ** 2)
    dout = spec.out.dim
    wn = spec.weight_numel
    kdim = int(ck_np.shape[1])
    ein = edge_extra + sed + gs_n
    h_emb = ns
    h_fc = 3 * ns
    s3 = math.sqrt(3.0)
    s15 = math.sqrt(15.0)
    s5h = math.sqrt(5.0) / 2.0

    def kernel(cut_ref, temb_ref, gsoff_ref, tpos, spos, tx, sx, tm, sm,
               cabt, cabs, we1, be1, we2, be2, wf1, bf1, wf2, bf2, ck,
               bond, bmask, *rest):
        if fin is not None:
            cnt, mixm, lnw, lnms, lnb, out_ref, acc_ref = rest
        else:
            (out_ref,) = rest
            acc_ref = out_ref
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        dt = tx.dtype
        r = tile_t * T_SRC
        txa, sxa = tx[:], sx[:]
        tposa, sposa = tpos[:], spos[:]
        tma, sma = tm[:], sm[:]
        cabta, cabsa = cabt[:], cabs[:]
        temba, gsoffa = temb_ref[:], gsoff_ref[:]
        bonda = bond[:]
        # ---- geometry [tile_t, T_SRC]
        dx = sposa[:, 0][None, :] - tposa[:, 0][:, None]
        dy = sposa[:, 1][None, :] - tposa[:, 1][:, None]
        dz = sposa[:, 2][None, :] - tposa[:, 2][:, None]
        d2 = dx * dx + dy * dy + dz * dz
        d = jnp.sqrt(d2 + 1e-12)
        inv = 1.0 / d
        sgn = -1.0 if flip_vec else 1.0
        ux, uy, uz = sgn * dx * inv, sgn * dy * inv, sgn * dz * inv

        cab = cabsa[:, 0][None, :] if cab_on_src else cabta[:, 0][:, None]
        base = (cab > 0) | (d <= cut_ref[0, 0])
        if exclude_self:
            ti = pl.program_id(0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (tile_t, T_SRC), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (tile_t, T_SRC), 1)
            base = base & ((rows + ti * tile_t) != (cols + j * T_SRC))
            if edge_extra:
                # covalently bonded pairs stay connected beyond the radius
                # cutoff (reference keeps the bond edge list unconditionally).
                # connectivity comes from the explicit bond-mask plane, NOT
                # from feature magnitude — a real bond with an all-zero edge
                # feature vector must still count in the mean's denominator
                base = base | (bmask[:] > 0)
        mask = base & (tma[:, 0][:, None] > 0) & (sma[:, 0][None, :] > 0)
        maskf = mask.astype(dt)

        # ---- edge embedding MLP
        gs = jnp.exp(
            gs_coeff * (d[:, :, None] - gsoffa.reshape(1, 1, gs_n)) ** 2
        ).astype(dt)
        tem = jnp.broadcast_to(
            temba.reshape(1, 1, sed), (tile_t, T_SRC, sed)
        ).astype(dt)
        if edge_extra:
            e_in = jnp.concatenate([bonda.astype(dt), tem, gs], axis=-1)
        else:
            e_in = jnp.concatenate([tem, gs], axis=-1)
        e_in = e_in.reshape(r, ein)
        h1 = jnp.maximum(
            jnp.dot(e_in, we1[:], preferred_element_type=jnp.float32)
            + be1[0],
            0.0,
        ).astype(dt)
        attr = (
            jnp.dot(h1, we2[:], preferred_element_type=jnp.float32) + be2[0]
        ).astype(dt)

        # ---- fc weight MLP
        tsc = txa[:, :ns]
        ssc = sxa[:, :ns]
        tgt_sc = jnp.broadcast_to(
            tsc.reshape(tile_t, 1, ns), (tile_t, T_SRC, ns)
        ).reshape(r, ns)
        src_sc = jnp.broadcast_to(
            ssc.reshape(1, T_SRC, ns), (tile_t, T_SRC, ns)
        ).reshape(r, ns)
        e = jnp.concatenate([attr, tgt_sc, src_sc], axis=-1)
        h = jnp.maximum(
            jnp.dot(e, wf1[:], preferred_element_type=jnp.float32) + bf1[0],
            0.0,
        ).astype(dt)
        w = (
            jnp.dot(h, wf2[:], preferred_element_type=jnp.float32) + bf2[0]
        ).astype(dt)

        # ---- Cb = sh-contracted CG kernels: [R, 9] @ [9, KDIM]
        one = jnp.ones_like(ux)
        sh = jnp.stack(
            [
                one,
                s3 * ux, s3 * uy, s3 * uz,
                s15 * ux * uy, s15 * uy * uz, s5h * (3.0 * uz * uz - 1.0),
                s15 * ux * uz, (s15 / 2.0) * (ux * ux - uy * uy),
            ],
            axis=-1,
        ).astype(dt).reshape(r, 9)
        cb = jnp.dot(sh, ck[:], preferred_element_type=jnp.float32).astype(dt)

        # ---- depthwise TP paths (component-major in AND out)
        src_full = jnp.broadcast_to(
            sxa.reshape(1, T_SRC, din), (tile_t, T_SRC, din)
        ).reshape(r, din)
        mask3 = maskf[:, :, None]  # [tile_t, T_SRC, 1]; avoid [R,1] relayout
        for meta in metas:
            mul, d1, d3 = meta["mul"], meta["d1"], meta["d3"]
            wp = w[:, meta["w_off"] : meta["w_off"] + mul]
            for k in range(d3):
                zk = None
                for i in range(d1):
                    cbv = cb[
                        :,
                        meta["cb_off"] + i * d3 + k
                        : meta["cb_off"] + i * d3 + k + 1,
                    ]
                    a_i = src_full[
                        :, meta["s1"] + i * mul : meta["s1"] + (i + 1) * mul
                    ]
                    term = a_i * cbv
                    zk = term if zk is None else zk + term
                mk = ((zk * wp).reshape(tile_t, T_SRC, mul) * mask3).sum(axis=1)
                lo = meta["s3"] + k * mul
                acc_ref[:, lo : lo + mul] += mk.astype(jnp.float32)

        if fin is not None:
            @pl.when(j == pl.num_programs(1) - 1)
            def _():
                y = acc_ref[:] / cnt[:]
                y = jnp.dot(y, mixm[:], preferred_element_type=jnp.float32)
                out_ref[:] = ln_fn(y, lnw, lnms, lnb)

    def conv(tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask,
             cab_t, cab_s, temb, cutoff, params, bond_feat=None,
             bond_mask=None, cnt=None):
        ip = (
            interpret
            if interpret is not None
            else jax.default_backend() == "cpu"
        )
        # Mosaic rejects the 8-sublane pair-block layout under bf16 (16-row
        # tiles); the kernel runs internally in f32 — inputs are upcast here
        # and the aggregated output is f32 anyway
        tgt_x = tgt_x.astype(jnp.float32)
        src_x = src_x.astype(jnp.float32)
        nt0, ns0 = tgt_x.shape[0], src_x.shape[0]
        nt = -(-nt0 // tile_t) * tile_t
        nsrc = -(-ns0 // T_SRC) * T_SRC
        dt = jnp.float32
        grid = (nt // tile_t, nsrc // T_SRC)

        im_t = lambda i, j: (i, 0)
        im_s = lambda i, j: (j, 0)
        im_b = lambda i, j: (i, j, 0)
        const = lambda i, j: (0, 0)

        if bond_feat is None:
            bond_feat = jnp.zeros((nt, nsrc, 8), jnp.float32)
        else:
            bond_feat = _pad_axis(
                _pad_axis(bond_feat.astype(jnp.float32), nt, 0), nsrc, 1
            )
        if bond_mask is None:
            bond_mask = jnp.zeros((nt, nsrc), jnp.float32)
        else:
            bond_mask = _pad_axis(
                _pad_axis(bond_mask.astype(jnp.float32), nt, 0), nsrc, 1
            )
        p = params
        extra_specs = []
        extra_args = []
        if fin is not None:
            extra_specs = [
                pl.BlockSpec((tile_t, 1), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((dout, fin_dim), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ln_nw), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ln_nw), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nbw), const, memory_space=pltpu.VMEM),
            ]
            extra_args = [
                _pad_axis(
                    jnp.maximum(cnt.reshape(-1, 1).astype(jnp.float32), 1.0),
                    nt,
                ),
                dense_mix_cm(fin.lin, p["mix"].astype(jnp.float32)),
                p["ln"]["weight"].reshape(1, -1).astype(jnp.float32),
                p["ln"]["mean_shift"].reshape(1, -1).astype(jnp.float32),
                _pad_axis(p["ln"]["bias"].astype(jnp.float32), nbw).reshape(
                    1, -1
                ),
            ]
        out_d = fin_dim if fin is not None else dout
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, sed), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gs_n), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_t, 3), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((T_SRC, 3), im_s, memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_t, din), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((T_SRC, din), im_s, memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_t, 1), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((T_SRC, 1), im_s, memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_t, 1), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((T_SRC, 1), im_s, memory_space=pltpu.VMEM),
                pl.BlockSpec((ein, h_emb), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h_emb), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((h_emb, ns), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ns), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((h_fc, h_fc), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h_fc), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((h_fc, wn), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wn), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((9, kdim), const, memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (tile_t, T_SRC, bond_feat.shape[-1]),
                    im_b,
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tile_t, T_SRC),
                    lambda i, j: (i, j),
                    memory_space=pltpu.VMEM,
                ),
                *extra_specs,
            ],
            out_specs=pl.BlockSpec((tile_t, out_d), im_t,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt, out_d), jnp.float32),
            scratch_shapes=(
                [pltpu.VMEM((tile_t, dout), jnp.float32)]
                if fin is not None else []
            ),
            interpret=ip,
        )(
            jnp.asarray(cutoff, jnp.float32).reshape(1, 1),
            temb.reshape(1, sed).astype(dt),
            jnp.asarray(offs_np, dt).reshape(1, gs_n),
            _pad_axis(tgt_pos.astype(jnp.float32), nt),
            _pad_axis(src_pos.astype(jnp.float32), nsrc),
            _pad_axis(tgt_x, nt),
            _pad_axis(src_x, nsrc),
            _pad_axis(tgt_mask.reshape(-1, 1).astype(jnp.float32), nt),
            _pad_axis(src_mask.reshape(-1, 1).astype(jnp.float32), nsrc),
            _pad_axis(cab_t.reshape(-1, 1).astype(jnp.float32), nt),
            _pad_axis(cab_s.reshape(-1, 1).astype(jnp.float32), nsrc),
            p["emb_w1"].astype(dt), p["emb_b1"].reshape(1, -1).astype(dt),
            p["emb_w2"].astype(dt), p["emb_b2"].reshape(1, -1).astype(dt),
            p["fc_w1"].astype(dt), p["fc_b1"].reshape(1, -1).astype(dt),
            p["fc_w2"].astype(dt), p["fc_b2"].reshape(1, -1).astype(dt),
            jnp.asarray(ck_np, dt),
            bond_feat,
            bond_mask,
            *extra_args,
        )
        return out[:nt0]

    twin = make_pair_twin(
        spec, din=din, ns=ns, sed=sed, gs_stop=gs_stop, gs_n=gs_n,
        edge_extra=edge_extra, flip_vec=flip_vec, cab_on_src=cab_on_src,
        exclude_self=exclude_self, fin=fin,
    )
    core = _vjp_wrap(conv, twin)

    def public(tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask,
               cab_t, cab_s, temb, cutoff, params, bond_feat=None,
               bond_mask=None, cnt=None):
        nt0, ns0 = tgt_x.shape[0], src_x.shape[0]
        if bond_feat is None:
            bond_feat = jnp.zeros((nt0, ns0, max(edge_extra, 1)), jnp.float32)
        if bond_mask is None:
            bond_mask = jnp.zeros((nt0, ns0), jnp.float32)
        args = [tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask,
                cab_t, cab_s, temb, jnp.asarray(cutoff, jnp.float32),
                params, bond_feat, bond_mask]
        if fin is not None:
            args.append(cnt)
        return core(*args)

    return public


# ---------------------------------------------------------------------------
# dual-output cross kernel: both directions from one pair block
# ---------------------------------------------------------------------------

T_CT = 8  # ligand-tile rows (VMEM budget: pair transients scale with T_CT)


def make_cross_conv(
    spec: TensorProductSpec,
    *,
    din: int,
    ns: int,
    sed: int,
    gs_stop: float,
    gs_n: int,
    interpret: bool | None = None,
    fin=None,
):
    """Fused ligand<->pocket cross convolution, BOTH directions at once.

    The al (ligand <- atoms) and la (atoms <- ligand) convs share the pair
    geometry, Gaussian radial features, and the edge-embedding MLP (the
    reference reuses la_edge_attr and la_edge_sh for the flipped conv,
    tpscore.py:493-510). One pair block in VMEM feeds two TP-weight MLPs
    and two depthwise TPs; the full source (atom) arrays are VMEM-resident
    so the grid has only ligand tiles — minimal per-step overhead.

        fn(lig_pos, atm_pos, lig_cm, atm_cm, lig_mask, atm_mask, cabflag,
           temb, cutoff, emb_params, fc_al, fc_la)
        -> (al_sum [NL, dout], la_sum [NA, dout])  component-major, f32
    """
    metas, ck_np = _path_constants(spec)
    offs_np = np.linspace(0.0, gs_stop, gs_n)
    gs_coeff = float(-0.5 / (offs_np[1] - offs_np[0]) ** 2)
    dout = spec.out.dim
    wn = spec.weight_numel
    kdim = int(ck_np.shape[1])
    ein = sed + gs_n
    h_fc = 3 * ns
    s3c = math.sqrt(3.0)
    s15 = math.sqrt(15.0)
    s5h = math.sqrt(5.0) / 2.0
    if fin is not None:
        fin_dim = fin.out.dim
        ln_fn = make_ln_cm(fin.out)
        _, ln_nw, ln_nb = ln_tables(fin.out)
        nbw = max(ln_nb, 1)

    def make_kernel(n_src_tiles: int):
      def kernel(cut_ref, temb_ref, gsoff_ref, lpos, apos, lx, ax,
                 lm, am, cab, we1, be1, we2, be2,
                 wal1, bal1, wal2, bal2, wla1, bla1, wla2, bla2, ck,
                 *rest):
        if fin is not None:
            (cal, cla, mix_al, mix_la, lnw2, lnms2, lnb2,
             al_out, la_out, al_ref, la_ref) = rest
        else:
            al_ref, la_ref = rest
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            la_ref[:] = jnp.zeros_like(la_ref)

        al_ref[:] = jnp.zeros_like(al_ref)

        lxa = lx[:]
        lposa = lpos[:]
        lma = lm[:]
        temba, gsoffa = temb_ref[:], gsoff_ref[:]
        r = T_CT * T_SRC

        lig_sc = lxa[:, :ns]
        lig_sc_b = jnp.broadcast_to(
            lig_sc.reshape(T_CT, 1, ns), (T_CT, T_SRC, ns)
        ).reshape(r, ns)
        lig_full_b = jnp.broadcast_to(
            lxa.reshape(T_CT, 1, din), (T_CT, T_SRC, din)
        ).reshape(r, din)

        def src_tile(jt):
            sl = pl.ds(jt * T_SRC, T_SRC)
            axa = ax[sl, :]
            aposa = apos[sl, :]
            ama = am[sl, :]
            caba = cab[sl, :]

            dx = aposa[:, 0][None, :] - lposa[:, 0][:, None]
            dy = aposa[:, 1][None, :] - lposa[:, 1][:, None]
            dz = aposa[:, 2][None, :] - lposa[:, 2][:, None]
            d = jnp.sqrt(dx * dx + dy * dy + dz * dz + 1e-12)
            inv = 1.0 / d
            ux, uy, uz = dx * inv, dy * inv, dz * inv  # lig -> atom

            mask = (caba[:, 0][None, :] > 0) | (d <= cut_ref[0, 0])
            mask = mask & (lma[:, 0][:, None] > 0) & (ama[:, 0][None, :] > 0)
            mask3 = mask.astype(jnp.float32)[:, :, None]

            gs = jnp.exp(
                gs_coeff * (d[:, :, None] - gsoffa.reshape(1, 1, gs_n)) ** 2
            )
            tem = jnp.broadcast_to(
                temba.reshape(1, 1, sed), (T_CT, T_SRC, sed)
            )
            e_in = jnp.concatenate([tem, gs], axis=-1).reshape(r, ein)
            h1 = jnp.maximum(
                jnp.dot(e_in, we1[:], preferred_element_type=jnp.float32)
                + be1[0], 0.0)
            attr = jnp.dot(h1, we2[:], preferred_element_type=jnp.float32) + be2[0]

            atom_sc_b = jnp.broadcast_to(
                axa[:, :ns].reshape(1, T_SRC, ns), (T_CT, T_SRC, ns)
            ).reshape(r, ns)
            atom_full_b = jnp.broadcast_to(
                axa.reshape(1, T_SRC, din), (T_CT, T_SRC, din)
            ).reshape(r, din)

            one = jnp.ones_like(ux)
            sh = jnp.stack(
                [one, s3c * ux, s3c * uy, s3c * uz,
                 s15 * ux * uy, s15 * uy * uz, s5h * (3.0 * uz * uz - 1.0),
                 s15 * ux * uz, (s15 / 2.0) * (ux * ux - uy * uy)],
                axis=-1,
            ).reshape(r, 9)
            cb = jnp.dot(sh, ck[:], preferred_element_type=jnp.float32)

            # ---- al: messages from atoms, aggregated at ligand rows
            e_al = jnp.concatenate([attr, lig_sc_b, atom_sc_b], axis=-1)
            h_al = jnp.maximum(
                jnp.dot(e_al, wal1[:], preferred_element_type=jnp.float32)
                + bal1[0], 0.0)
            w_al = jnp.dot(h_al, wal2[:], preferred_element_type=jnp.float32) + bal2[0]
            # ---- la: messages from ligand, aggregated at atom lanes
            e_la = jnp.concatenate([attr, atom_sc_b, lig_sc_b], axis=-1)
            h_la = jnp.maximum(
                jnp.dot(e_la, wla1[:], preferred_element_type=jnp.float32)
                + bla1[0], 0.0)
            w_la = jnp.dot(h_la, wla2[:], preferred_element_type=jnp.float32) + bla2[0]

            for meta in metas:
                mul, d1, d3 = meta["mul"], meta["d1"], meta["d3"]
                for k in range(d3):
                    cb_cols = [
                        cb[:, meta["cb_off"] + ii * d3 + k
                           : meta["cb_off"] + ii * d3 + k + 1]
                        for ii in range(d1)
                    ]
                    # al direction (source = atoms)
                    zk = None
                    for ii in range(d1):
                        a_i = atom_full_b[
                            :, meta["s1"] + ii * mul : meta["s1"] + (ii + 1) * mul
                        ]
                        t = a_i * cb_cols[ii]
                        zk = t if zk is None else zk + t
                    wp = w_al[:, meta["w_off"] : meta["w_off"] + mul]
                    mk = ((zk * wp).reshape(T_CT, T_SRC, mul) * mask3).sum(axis=1)
                    lo = meta["s3"] + k * mul
                    al_ref[:, lo : lo + mul] += mk
                    # la direction (source = ligand)
                    zk = None
                    for ii in range(d1):
                        a_i = lig_full_b[
                            :, meta["s1"] + ii * mul : meta["s1"] + (ii + 1) * mul
                        ]
                        t = a_i * cb_cols[ii]
                        zk = t if zk is None else zk + t
                    wp = w_la[:, meta["w_off"] : meta["w_off"] + mul]
                    mj = ((zk * wp).reshape(T_CT, T_SRC, mul) * mask3).sum(axis=0)
                    la_ref[sl, lo : lo + mul] += mj

        def body(jt, carry):
            src_tile(jt)
            return carry

        jax.lax.fori_loop(0, n_src_tiles, body, 0, unroll=False)

        if fin is not None:
            y = al_ref[:] / cal[:]
            y = jnp.dot(y, mix_al[:], preferred_element_type=jnp.float32)
            al_out[:] = ln_fn(y, lnw2[0:1], lnms2[0:1], lnb2[0:1])

            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                z = la_ref[:] / cla[:]
                z = jnp.dot(z, mix_la[:],
                            preferred_element_type=jnp.float32)
                la_out[:] = ln_fn(z, lnw2[1:2], lnms2[1:2], lnb2[1:2])

      return kernel

    def conv(lig_pos, atm_pos, lig_cm, atm_cm, lig_mask, atm_mask,
             cabflag, temb, cutoff, emb_params, fc_al, fc_la,
             fin_al=None, fin_la=None, cnt_al=None, cnt_la=None):
        ip = (
            interpret
            if interpret is not None
            else jax.default_backend() == "cpu"
        )
        lig_cm = lig_cm.astype(jnp.float32)
        atm_cm = atm_cm.astype(jnp.float32)
        nl0, na0 = lig_cm.shape[0], atm_cm.shape[0]
        nl = -(-nl0 // T_CT) * T_CT
        na = -(-na0 // T_SRC) * T_SRC
        grid = (nl // T_CT,)
        im_t = lambda i: (i, 0)
        full = lambda i: (0, 0)
        f32 = jnp.float32

        def vb(x):
            return x.reshape(-1, 1).astype(f32)

        args = [
            jnp.asarray(cutoff, f32).reshape(1, 1),
            temb.reshape(1, sed).astype(f32),
            jnp.asarray(offs_np, f32).reshape(1, gs_n),
            _pad_axis(lig_pos.astype(f32), nl),
            _pad_axis(atm_pos.astype(f32), na),
            _pad_axis(lig_cm, nl),
            _pad_axis(atm_cm, na),
            _pad_axis(vb(lig_mask), nl),
            _pad_axis(vb(atm_mask), na),
            _pad_axis(vb(cabflag), na),
        ]
        e = emb_params
        args += [
            e["l1"]["w"].astype(f32), e["l1"]["b"].reshape(1, -1).astype(f32),
            e["l2"]["w"].astype(f32), e["l2"]["b"].reshape(1, -1).astype(f32),
            fc_al["l1"]["w"].astype(f32), fc_al["l1"]["b"].reshape(1, -1).astype(f32),
            fc_al["l2"]["w"].astype(f32), fc_al["l2"]["b"].reshape(1, -1).astype(f32),
            fc_la["l1"]["w"].astype(f32), fc_la["l1"]["b"].reshape(1, -1).astype(f32),
            fc_la["l2"]["w"].astype(f32), fc_la["l2"]["b"].reshape(1, -1).astype(f32),
            jnp.asarray(ck_np, f32),
        ]
        extra_specs = []
        scratch = []
        if fin is not None:
            args += [
                _pad_axis(jnp.maximum(vb(cnt_al), 1.0), nl),
                _pad_axis(jnp.maximum(vb(cnt_la), 1.0), na),
                dense_mix_cm(fin.lin, fin_al["mix"].astype(f32)),
                dense_mix_cm(fin.lin, fin_la["mix"].astype(f32)),
                jnp.stack([fin_al["ln"]["weight"],
                           fin_la["ln"]["weight"]]).astype(f32),
                jnp.stack([fin_al["ln"]["mean_shift"],
                           fin_la["ln"]["mean_shift"]]).astype(f32),
                jnp.stack([_pad_axis(fin_al["ln"]["bias"], nbw),
                           _pad_axis(fin_la["ln"]["bias"], nbw)]).astype(f32),
            ]
            extra_specs = [
                pl.BlockSpec((T_CT, 1), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((na, 1), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((dout, fin_dim), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((dout, fin_dim), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((2, ln_nw), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((2, ln_nw), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((2, nbw), full, memory_space=pltpu.VMEM),
            ]
            scratch = [
                pltpu.VMEM((T_CT, dout), f32),
                pltpu.VMEM((na, dout), f32),
            ]
        out_d = fin_dim if fin is not None else dout
        al, la = pl.pallas_call(
            make_kernel(na // T_SRC),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, sed), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gs_n), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((T_CT, 3), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((na, 3), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((T_CT, din), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((na, din), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((T_CT, 1), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((na, 1), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((na, 1), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((ein, ns), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ns), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((ns, ns), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ns), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((h_fc, h_fc), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h_fc), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((h_fc, wn), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wn), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((h_fc, h_fc), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h_fc), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((h_fc, wn), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wn), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((9, kdim), full, memory_space=pltpu.VMEM),
                *extra_specs,
            ],
            out_specs=(
                pl.BlockSpec((T_CT, out_d), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((na, out_d), full, memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nl, out_d), jnp.float32),
                jax.ShapeDtypeStruct((na, out_d), jnp.float32),
            ),
            scratch_shapes=scratch,
            interpret=ip,
        )(*args)
        return al[:nl0], la[:na0]

    twin = make_cross_twin(
        spec, din=din, ns=ns, sed=sed, gs_stop=gs_stop, gs_n=gs_n, fin=fin,
    )
    core = _vjp_wrap(conv, twin)

    def public(lig_pos, atm_pos, lig_cm, atm_cm, lig_mask, atm_mask,
               cabflag, temb, cutoff, emb_params, fc_al, fc_la,
               fin_al=None, fin_la=None, cnt_al=None, cnt_la=None):
        args = [lig_pos, atm_pos, lig_cm, atm_cm, lig_mask, atm_mask,
                cabflag, temb, jnp.asarray(cutoff, jnp.float32),
                emb_params, fc_al, fc_la]
        if fin is not None:
            args += [fin_al, fin_la, cnt_al, cnt_la]
        return core(*args)

    return public


# ---------------------------------------------------------------------------
# knn (gather-form) kernel: fixed-degree neighbor lists, e.g. the atom graph
# ---------------------------------------------------------------------------

T_KT = 64  # targets per tile (out block 64 x dout)


def make_knn_conv(
    spec: TensorProductSpec,
    *,
    din: int,
    ns: int,
    sed: int,
    gs_stop: float,
    gs_n: int,
    k: int,
    interpret: bool | None = None,
    fin=None,
):
    """Fused knn conv: neighbors are gathered from the VMEM-resident source
    array with a one-hot matmul on the MXU (TPU has no vector gather; a
    [T*K, N] one-hot times [N, din] is far cheaper than per-row DMA).

        fn(pos [N,3], x_cm [N,din], mask [N], idx [N,K] int32,
           valid [N,K] f32, temb, params) -> msg_sum [N, dout] (CM, f32)

    Aggregation is a masked SUM over the K axis (divide by counts outside).
    """
    metas, ck_np = _path_constants(spec)
    offs_np = np.linspace(0.0, gs_stop, gs_n)
    gs_coeff = float(-0.5 / (offs_np[1] - offs_np[0]) ** 2)
    dout = spec.out.dim
    wn = spec.weight_numel
    kdim = int(ck_np.shape[1])
    ein = sed + gs_n
    h_fc = 3 * ns
    s3c = math.sqrt(3.0)
    s15 = math.sqrt(15.0)
    s5h = math.sqrt(5.0) / 2.0
    if fin is not None:
        fin_dim = fin.out.dim
        ln_fn = make_ln_cm(fin.out)
        _, ln_nw, ln_nb = ln_tables(fin.out)
        nbw = max(ln_nb, 1)

    def make_kernel(n_src: int):
        r = T_KT * k

        def kernel(temb_ref, gsoff_ref, pos, x, tpos, tx, tm, idx, valid,
                   we1, be1, we2, be2, wf1, bf1, wf2, bf2, ck, *rest):
            if fin is not None:
                mixm, lnw, lnms, lnb, out_ref, acc_ref = rest
            else:
                (out_ref,) = rest
                acc_ref = out_ref
            dt = x.dtype
            xa = x[:]
            posa = pos[:]
            txa = tx[:]
            tposa = tpos[:]
            temba, gsoffa = temb_ref[:], gsoff_ref[:]
            # one-hot gather on the MXU ([T,k,N] -> leading-dim merge only;
            # a [T,k]->[r,1] reshape is a lane->sublane cast Mosaic rejects)
            cols = jax.lax.broadcasted_iota(jnp.int32, (T_KT, k, n_src), 2)
            G = (cols == idx[:][:, :, None]).astype(dt).reshape(r, n_src)
            gx = jnp.dot(G, xa, preferred_element_type=jnp.float32).astype(dt)
            gpos = jnp.dot(G, posa, preferred_element_type=jnp.float32)

            tpr = jnp.broadcast_to(
                tposa.reshape(T_KT, 1, 3), (T_KT, k, 3)
            ).reshape(r, 3)
            dx = gpos[:, 0] - tpr[:, 0]
            dy = gpos[:, 1] - tpr[:, 1]
            dz = gpos[:, 2] - tpr[:, 2]
            d = jnp.sqrt(dx * dx + dy * dy + dz * dz + 1e-12)
            inv = 1.0 / d
            ux, uy, uz = dx * inv, dy * inv, dz * inv

            gs = jnp.exp(
                gs_coeff * (d[:, None] - gsoffa.reshape(1, gs_n)) ** 2
            ).astype(dt)
            tem = jnp.broadcast_to(temba.reshape(1, sed), (r, sed)).astype(dt)
            e_in = jnp.concatenate([tem, gs], axis=-1)
            h1 = jnp.maximum(
                jnp.dot(e_in, we1[:], preferred_element_type=jnp.float32)
                + be1[0], 0.0).astype(dt)
            attr = (jnp.dot(h1, we2[:], preferred_element_type=jnp.float32)
                    + be2[0]).astype(dt)

            tgt_sc = jnp.broadcast_to(
                txa[:, :ns].reshape(T_KT, 1, ns), (T_KT, k, ns)
            ).reshape(r, ns)
            e = jnp.concatenate([attr, tgt_sc, gx[:, :ns]], axis=-1)
            h = jnp.maximum(
                jnp.dot(e, wf1[:], preferred_element_type=jnp.float32)
                + bf1[0], 0.0).astype(dt)
            w = (jnp.dot(h, wf2[:], preferred_element_type=jnp.float32)
                 + bf2[0]).astype(dt)

            one = jnp.ones_like(ux)
            sh = jnp.stack(
                [one, s3c * ux, s3c * uy, s3c * uz,
                 s15 * ux * uy, s15 * uy * uz, s5h * (3.0 * uz * uz - 1.0),
                 s15 * ux * uz, (s15 / 2.0) * (ux * ux - uy * uy)],
                axis=-1,
            ).astype(dt)
            cb = jnp.dot(sh, ck[:], preferred_element_type=jnp.float32).astype(dt)

            mask3 = valid[:].astype(jnp.float32)[:, :, None]  # [T_KT, k, 1]
            for meta in metas:
                mul, d1, d3 = meta["mul"], meta["d1"], meta["d3"]
                wp = w[:, meta["w_off"] : meta["w_off"] + mul]
                for kk in range(d3):
                    zk = None
                    for ii in range(d1):
                        cbv = cb[:, meta["cb_off"] + ii * d3 + kk
                                 : meta["cb_off"] + ii * d3 + kk + 1]
                        a_i = gx[:, meta["s1"] + ii * mul
                                 : meta["s1"] + (ii + 1) * mul]
                        t = a_i * cbv
                        zk = t if zk is None else zk + t
                    mk = ((zk * wp).reshape(T_KT, k, mul) * mask3).sum(axis=1)
                    lo = meta["s3"] + kk * mul
                    acc_ref[:, lo : lo + mul] += mk

            if fin is not None:
                cnt = jnp.maximum(
                    jnp.sum(valid[:], axis=1, keepdims=True), 1.0
                )
                y = acc_ref[:] / cnt
                y = jnp.dot(y, mixm[:], preferred_element_type=jnp.float32)
                out_ref[:] = ln_fn(y, lnw, lnms, lnb)

        return kernel

    def conv(pos, x_cm, mask, idx, valid, temb, params):
        ip = (
            interpret
            if interpret is not None
            else jax.default_backend() == "cpu"
        )
        x_cm = x_cm.astype(jnp.float32)
        n0 = x_cm.shape[0]
        n = -(-n0 // T_KT) * T_KT
        grid = (n // T_KT,)
        f32 = jnp.float32
        im_t = lambda i: (i, 0)
        full = lambda i: (0, 0)
        e = params["emb"]
        fc = params["fc"]

        def kernel_with_init(*refs):
            # the raw accumulator is the last ref (scratch when fin is
            # set, otherwise the output itself)
            refs[-1][:] = jnp.zeros_like(refs[-1])
            make_kernel(n)(*refs)

        out = pl.pallas_call(
            kernel_with_init,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, sed), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gs_n), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((n, 3), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((n, din), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((T_KT, 3), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((T_KT, din), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((T_KT, 1), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((T_KT, k), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((T_KT, k), im_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((ein, ns), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ns), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((ns, ns), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ns), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((h_fc, h_fc), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h_fc), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((h_fc, wn), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wn), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((9, kdim), full, memory_space=pltpu.VMEM),
                *(
                    [
                        pl.BlockSpec((dout, fin_dim), full,
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, ln_nw), full,
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, ln_nw), full,
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, nbw), full,
                                     memory_space=pltpu.VMEM),
                    ]
                    if fin is not None else []
                ),
            ],
            out_specs=pl.BlockSpec(
                (T_KT, fin_dim if fin is not None else dout), im_t,
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n, fin_dim if fin is not None else dout), jnp.float32
            ),
            scratch_shapes=(
                [pltpu.VMEM((T_KT, dout), f32)] if fin is not None else []
            ),
            interpret=ip,
        )(
            temb.reshape(1, sed).astype(f32),
            jnp.asarray(offs_np, f32).reshape(1, gs_n),
            _pad_axis(pos.astype(f32), n),
            _pad_axis(x_cm, n),
            _pad_axis(pos.astype(f32), n),
            _pad_axis(x_cm, n),
            _pad_axis(mask.reshape(-1, 1).astype(f32), n),
            _pad_axis(idx.astype(jnp.int32), n),
            _pad_axis(valid.astype(f32), n),
            e["l1"]["w"].astype(f32), e["l1"]["b"].reshape(1, -1).astype(f32),
            e["l2"]["w"].astype(f32), e["l2"]["b"].reshape(1, -1).astype(f32),
            fc["l1"]["w"].astype(f32), fc["l1"]["b"].reshape(1, -1).astype(f32),
            fc["l2"]["w"].astype(f32), fc["l2"]["b"].reshape(1, -1).astype(f32),
            jnp.asarray(ck_np, f32),
            *(
                [
                    dense_mix_cm(fin.lin, params["mix"].astype(f32)),
                    params["ln"]["weight"].reshape(1, -1).astype(f32),
                    params["ln"]["mean_shift"].reshape(1, -1).astype(f32),
                    _pad_axis(
                        params["ln"]["bias"].astype(f32), nbw
                    ).reshape(1, -1),
                ]
                if fin is not None else []
            ),
        )
        return out[:n0]

    twin = make_knn_twin(
        spec, din=din, ns=ns, sed=sed, gs_stop=gs_stop, gs_n=gs_n, k=k,
        fin=fin,
    )
    return _vjp_wrap(conv, twin)
