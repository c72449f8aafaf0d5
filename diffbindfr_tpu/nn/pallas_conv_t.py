"""Transposed-layout (cmT) Pallas TPU kernels for the pair convolutions.

Round-2 measurements showed the row-major kernels (pallas_conv.py) are
bound by narrow-lane arithmetic: every depthwise-TP temporary is a
[pairs, mul] array whose channel axis (mul = 48 scalars or 12 vectors)
rides the 128-lane dimension, so Mosaic lane-pads each piece — ~2.7x
waste on the 48-channel slots and ~10.7x on the 12-channel ones — and
the VPU spends most of its issue slots on padding.

This module transposes the pair layout: CHANNELS ride the sublane axis
(padded to the 8-row f32 tile), PAIRS ride the lane axis. Every
elementwise op in the depthwise TP touches lane-dense [mul_p, R] arrays,
and the two per-pair MLPs become plain [out, in] @ [in, R] MXU matmuls
with R = 1024 dense lanes.

Layout ("cmT" = transposed component-major with 8-aligned rows):
  * node features cross the kernel boundary as [rows_p, N]: the standard
    component-major layout transposed, with every (slot, component)
    block of `mul` rows zero-padded to a multiple of 8 so all kernel
    row slices are sublane-tile aligned. `cm_to_cmt` / `cmt_to_cm`
    convert at node level (a cheap XLA transpose outside the kernel).
  * pair blocks are 8 targets x 128 sources = 1024 pairs, pair index
    p = t_local * 128 + s_local (t-major), so source-side arrays tile
    along lanes (8 aligned copies of a [C, 128] tile) and the
    per-target aggregation is a [rows, 1024] @ [1024, 8] matmul against
    a static one-hot.
  * target-side arrays are broadcast through an in-kernel one-hot
    ([C, Nt] @ [Nt, 1024]); the per-target accumulator lives in a
    [dout_p, 8] scratch and is stored once per target tile into the
    VMEM-resident [dout_p, Nt] output.
  * the time-embedding rows of the edge MLP are constant across pairs,
    so their contribution is folded into an effective bias outside the
    kernel — only the Gaussian radial (and bond) rows are materialized.

Public factories mirror pallas_conv.py (component-major in, component-
major out, jax.custom_vjp with the shared XLA twins as backward), so
score_net switches layouts with a config flag.

Reference parity: the fused chain matches the conv trunk of
druglib/models/Docking/interaction/tpscore.py:462-573 (edge embedding ->
TP-weight MLP -> depthwise TP -> masked aggregation).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .irreps import Irreps, TensorProductSpec
from .pallas_conv import (_pad_axis, _path_constants, _vjp_wrap,
                          make_cross_twin, make_knn_twin, make_pair_twin)

T_SRC = 128
T_TGT = 8

# MXU precision for the DATA-MOVEMENT matmuls (one-hot target broadcast,
# knn gather/scatter, f32-chain aggregation). HIGHEST is exact (default
# MXU rounding flips geometry decisions — round-3 lesson); DEFAULT /
# HIGH exist as a measured-experiment knob only (DIFFBINDFR_MOVE_PREC).
import os as _os  # noqa: E402

MOVE_PREC = getattr(
    jax.lax.Precision,
    _os.environ.get("DIFFBINDFR_MOVE_PREC", "HIGHEST").upper())

_S3 = math.sqrt(3.0)
_S15 = math.sqrt(15.0)
_S5H = math.sqrt(5.0) / 2.0

_VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128 MB; leave headroom


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


# ---------------------------------------------------------------------------
# cmT layout: transposed component-major with 8-aligned row blocks
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def cm_row_plan(irreps: Irreps):
    """[(cm_offset, mul, padded_row_offset)] per (slot, component) block,
    plus the total padded row count."""
    blocks, r = [], 0
    for off, mul, ir in irreps.slices():
        for k in range(ir.dim):
            blocks.append((off + k * mul, mul, r))
            r += _pad8(mul)
    return tuple(blocks), r


def cm_to_cmt(irreps: Irreps, x: jnp.ndarray) -> jnp.ndarray:
    """[..., N, dim] component-major -> [..., rows_p, N] transposed."""
    blocks, _ = cm_row_plan(irreps)
    xT = jnp.swapaxes(x, -1, -2)
    parts = []
    for cm_off, mul, _ in blocks:
        blk = xT[..., cm_off : cm_off + mul, :]
        pad = _pad8(mul) - mul
        if pad:
            blk = jnp.concatenate(
                [blk, jnp.zeros(blk.shape[:-2] + (pad, blk.shape[-1]),
                                blk.dtype)],
                axis=-2,
            )
        parts.append(blk)
    return jnp.concatenate(parts, axis=-2)


def cmt_to_cm(irreps: Irreps, xT: jnp.ndarray) -> jnp.ndarray:
    """[..., rows_p, N] transposed -> [..., N, dim] component-major."""
    blocks, _ = cm_row_plan(irreps)
    parts = [xT[..., ro : ro + mul, :] for (_, mul, ro) in blocks]
    return jnp.swapaxes(jnp.concatenate(parts, axis=-2), -1, -2)


def _tmetas(spec: TensorProductSpec):
    """Transposed path metadata: 8-aligned row offsets for the source
    features, the padded fc-weight rows, and the output accumulator."""
    metas, ck_np = _path_constants(spec)
    in_map = {cm: ro for cm, _, ro in cm_row_plan(spec.in1)[0]}
    out_map = {cm: ro for cm, _, ro in cm_row_plan(spec.out)[0]}
    w_row = 0
    out = []
    for m in metas:
        mul, d1, d3 = m["mul"], m["d1"], m["d3"]
        mp = _pad8(mul)
        out.append(dict(
            mul=mul, mul_p=mp, d1=d1, d3=d3,
            src_rows=tuple(in_map[m["s1"] + i * mul] for i in range(d1)),
            out_row=out_map[m["s3"]],
            w_row=w_row, w_off=m["w_off"], cb_off=m["cb_off"],
        ))
        w_row += mp
    _, din_p = cm_row_plan(spec.in1)
    _, dout_p = cm_row_plan(spec.out)
    return out, ck_np, w_row, din_p, dout_p


def _w2_padded_t(tmetas, wn_p, w2, b2):
    """fc second-layer weights transposed with per-path 8-aligned rows:
    w2 [h, wn] -> [wn_p, h], b2 [wn] -> [wn_p, 1] (pad rows zero)."""
    h = w2.shape[0]
    rows, brows = [], []
    for m in tmetas:
        mul, mp = m["mul"], m["mul_p"]
        blk = w2[:, m["w_off"] : m["w_off"] + mul].T
        bb = b2[m["w_off"] : m["w_off"] + mul]
        if mp > mul:
            blk = jnp.concatenate(
                [blk, jnp.zeros((mp - mul, h), blk.dtype)], axis=0)
            bb = jnp.concatenate([bb, jnp.zeros((mp - mul,), bb.dtype)])
        rows.append(blk)
        brows.append(bb)
    return (jnp.concatenate(rows, axis=0),
            jnp.concatenate(brows).reshape(-1, 1))


def _geoT(pos, mask, cab, n):
    """[5, n] bundle: x, y, z, node mask, always-connect flag."""
    g = jnp.concatenate(
        [pos.astype(jnp.float32).T,
         mask.reshape(1, -1).astype(jnp.float32),
         cab.reshape(1, -1).astype(jnp.float32)],
        axis=0,
    )
    return _pad_axis(g, n, axis=1)


def _msel_np(r: int, width: int, group: int) -> np.ndarray:
    """Static one-hot [r, width]: pair p contributes to column p//group."""
    m = np.zeros((r, width), np.float32)
    m[np.arange(r), np.arange(r) // group] = 1.0
    return m


def _sh_rows(ux, uy, uz):
    one = jnp.ones_like(ux)
    return jnp.concatenate(
        [one, _S3 * ux, _S3 * uy, _S3 * uz,
         _S15 * ux * uy, _S15 * uy * uz, _S5H * (3.0 * uz * uz - 1.0),
         _S15 * ux * uz, (_S15 / 2.0) * (ux * ux - uy * uy)],
        axis=0,
    )


def _tile_lanes(a, reps: int):
    """[C, L] -> [C, L*reps]: lane-aligned tiling (sources repeat across
    the target-major pair axis)."""
    return jnp.concatenate([a] * reps, axis=1)


def _move_dot(feat, onehot, dwdt):
    """Data-movement matmul for FEATURE rows (one-hot broadcast/gather).

    f32 chain: exact 6-pass (MOVE_PREC). bf16 chain: the features are
    rounded to bf16 immediately downstream anyway — by the depthwise
    chain's cast AND by the MXU's default-precision rounding inside the
    edge/TP-weight MLPs — so selecting PRE-rounded values with an exact
    bf16 one-hot at default precision (1 pass instead of 6) produces the
    same downstream numbers. Measured: the 6-pass movement matmuls cost
    4.3 ms of the 29.3 ms B=16 forward. GEOMETRY/mask rows never take
    this path — they always move at MOVE_PREC (cutoff flips cascade,
    round-3 lesson)."""
    f32 = jnp.float32
    if dwdt is None:
        return jnp.dot(feat, onehot, preferred_element_type=f32,
                       precision=MOVE_PREC)
    return jnp.dot(feat.astype(dwdt), onehot.astype(dwdt),
                   preferred_element_type=f32)


def _dw_paths_t(tmetas, src_b, w, cb, maskf, agg, dwdt=None):
    """Shared depthwise-TP inner loop: for every path, gate the source
    components with the masked per-pair channel weights, contract with
    the sh-CG rows, and hand each path's stacked [d3*mul_p, R] block to
    `agg(path_meta, z)` for aggregation.

    dwdt: optional narrow dtype (jnp.bfloat16) for the elementwise chain.
    Packed-bf16 VPU madds measure 2.25x f32 on v5e (tools/probe_bf16.py),
    and the chain is Σ_paths d1·(2·d3+1) vector ops per block vs three
    one-time casts, so the trunc overhead amortizes. The mask lands on
    the weights BEFORE the cast (0 is exact in bf16), z reaches `agg` in
    `dwdt`, and aggregation accumulates f32 on the MXU. Scalar math must
    stay f32 throughout — this Mosaic toolchain fails to legalize scalar
    bf16 arith (probe log)."""
    if dwdt is not None:
        src_b = src_b.astype(dwdt)
        cb = cb.astype(dwdt)
        w = (w * maskf).astype(dwdt)
        maskf = None
    for m in tmetas:
        mp, d1, d3 = m["mul_p"], m["d1"], m["d3"]
        wp = w[m["w_row"] : m["w_row"] + mp, :]
        if maskf is not None:
            wp = wp * maskf
        bs = [src_b[r0 : r0 + mp, :] * wp for r0 in m["src_rows"]]
        zs = []
        for k in range(d3):
            zk = None
            for i2 in range(d1):
                c = cb[m["cb_off"] + i2 * d3 + k
                       : m["cb_off"] + i2 * d3 + k + 1, :]
                t = bs[i2] * c
                zk = t if zk is None else zk + t
            zs.append(zk)
        z = jnp.concatenate(zs, axis=0) if d3 > 1 else zs[0]
        agg(m, z)


# ---------------------------------------------------------------------------
# pair conv (dense target x source block; serves the ligand-ligand conv)
# ---------------------------------------------------------------------------


def make_pair_conv_t(
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
    fin=None,
    bwd: str = "twin",
    dw_dtype: str = "float32",
):
    """Transposed-layout fused pair conv. Same public contract as
    pallas_conv.make_pair_conv with fin=None: component-major f32 inputs,
    returns the masked message SUM [Nt, spec.out.dim] component-major.

    bwd='twin' (default) differentiates the XLA twin (full gradients,
    incl. positions); bwd='pallas' runs the hand-written cmT backward
    kernel — feature + parameter gradients only, ZERO cotangents for
    positions/temb/masks/bond features (training never needs them; see
    make_pair_bwd_t).

    dw_dtype='bfloat16' runs the depthwise-TP elementwise chain in
    packed bf16 (see _dw_paths_t; measured 2.25x VPU headroom). Geometry,
    masks, MLPs, and all aggregation accumulators stay f32 — only the
    already-noise-tolerant feature chain is rounded (same class as the
    default-precision MXU rounding the fc MLPs carry). INFERENCE knob:
    the twin backward and the pallas backward kernels both run f32, so
    training should keep the default."""
    assert fin is None, "cmT kernels run the finalize epilogue under XLA"
    dwdt = jnp.bfloat16 if dw_dtype == "bfloat16" else None
    assert spec.in1.slices()[0][1] >= ns, "first slot must hold the scalars"
    tmetas, ck_np, wn_p, din_p, dout_p = _tmetas(spec)
    kdim = int(ck_np.shape[1])
    offs_np = np.linspace(0.0, gs_stop, gs_n)
    gs_coeff = float(-0.5 / (offs_np[1] - offs_np[0]) ** 2)
    h_emb = ns
    h_fc = 3 * ns
    eb = max(edge_extra, 1)
    r = T_TGT * T_SRC

    def make_kernel(nt: int):
        def kernel(cut, tgeo, txT, sgeo, sxT, bondb, bmaskb,
                   w1b, w1g, beff, we2, be2, wf1, bf1, wf2, bf2,
                   ckT, gsoff, msel, out_ref):
            i = pl.program_id(0)
            j = pl.program_id(1)
            f32 = jnp.float32

            @pl.when(j == 0)
            def _():
                out_ref[0] = jnp.zeros_like(out_ref[0])

            # ---- target-side broadcast via in-kernel one-hot [nt, r]
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (nt, r), 0)
            pcols = jax.lax.broadcasted_iota(jnp.int32, (nt, r), 1)
            tf = (rows_i == i * T_TGT + pcols // T_SRC).astype(f32)
            tb = jnp.dot(tgeo[:], tf, preferred_element_type=f32,
                         precision=MOVE_PREC)
            tpos, tmask, tcab = tb[0:3], tb[3:4], tb[4:5]
            tsc = _move_dot(txT[0:ns, :], tf, dwdt).astype(f32)

            # ---- source-side tiling (8 aligned copies of the 128 tile)
            sgeo_b = _tile_lanes(sgeo[:], T_TGT)
            sx_b = _tile_lanes(sxT[:], T_TGT)
            spos, smask, scab = sgeo_b[0:3], sgeo_b[3:4], sgeo_b[4:5]

            dvec = spos - tpos
            d2 = jnp.sum(dvec * dvec, axis=0, keepdims=True)
            d = jnp.sqrt(d2 + 1e-12)
            sgn = -1.0 if flip_vec else 1.0
            u = dvec * (sgn / d)

            cabrow = scab if cab_on_src else tcab
            base = (cabrow > 0) | (d <= cut[0, 0])
            if exclude_self:
                pp = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
                tg = i * T_TGT + pp // T_SRC
                sg = j * T_SRC + pp % T_SRC
                base = base & (tg != sg)
                if edge_extra:
                    base = base | (bmaskb[0, 0] > 0)
            maskf = (base & (tmask > 0) & (smask > 0)).astype(f32)

            # ---- edge MLP (time-emb rows folded into beff outside)
            gs = jnp.exp(gs_coeff * (d - gsoff[:]) ** 2)
            h1 = jnp.dot(w1g[:], gs, preferred_element_type=f32) + beff[:]
            if edge_extra:
                h1 = h1 + jnp.dot(w1b[:], bondb[0, 0],
                                  preferred_element_type=f32)
            h1 = jnp.maximum(h1, 0.0)
            attr = jnp.dot(we2[:], h1, preferred_element_type=f32) + be2[:]

            # ---- TP-weight MLP
            e = jnp.concatenate([attr, tsc, sx_b[0:ns, :]], axis=0)
            h = jnp.maximum(
                jnp.dot(wf1[:], e, preferred_element_type=f32) + bf1[:], 0.0)
            w = jnp.dot(wf2[:], h, preferred_element_type=f32) + bf2[:]

            # ---- sh -> CG rows
            sh = _sh_rows(u[0:1], u[1:2], u[2:3])
            cb = jnp.dot(ckT[:], sh, preferred_element_type=f32)

            mselk = msel[:] if dwdt is None else msel[:].astype(dwdt)

            def agg(m, z):
                n_rows = m["d3"] * m["mul_p"]
                # f32 chain: HIGHEST keeps the one-hot aggregation exact.
                # bf16 chain: inputs are already bf16, the one-hot
                # products are exact, and preferred f32 accumulates
                # exactly on the MXU — no precision override needed.
                if dwdt is None:
                    mk = jnp.dot(z, mselk, preferred_element_type=f32,
                                 precision=MOVE_PREC)
                else:
                    mk = jnp.dot(z, mselk, preferred_element_type=f32)
                out_ref[0, m["out_row"] : m["out_row"] + n_rows, :] += mk

            _dw_paths_t(tmetas, sx_b, w, cb, maskf, agg, dwdt)

        return kernel

    def conv(tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask,
             cab_t, cab_s, temb, cutoff, params, bond_feat, bond_mask,
             cnt=None):
        ip = (interpret if interpret is not None
              else jax.default_backend() == "cpu")
        f32 = jnp.float32
        nt0, ns0 = tgt_x.shape[0], src_x.shape[0]
        nt = -(-nt0 // T_TGT) * T_TGT
        nsrc = -(-ns0 // T_SRC) * T_SRC
        tgeo = _geoT(tgt_pos, tgt_mask, cab_t, nt)
        sgeo = _geoT(src_pos, src_mask, cab_s, nsrc)
        txT = _pad_axis(cm_to_cmt(spec.in1, tgt_x.astype(f32)), nt, axis=1)
        sxT = _pad_axis(cm_to_cmt(spec.in1, src_x.astype(f32)), nsrc, axis=1)

        tb_n, sb_n = nt // T_TGT, nsrc // T_SRC
        bf = _pad_axis(_pad_axis(bond_feat.astype(f32), nt, 0), nsrc, 1)
        bm = _pad_axis(_pad_axis(bond_mask.astype(f32), nt, 0), nsrc, 1)
        bondb = bf.reshape(tb_n, T_TGT, sb_n, T_SRC, eb).transpose(
            0, 2, 4, 1, 3).reshape(tb_n, sb_n, eb, r)
        bmaskb = bm.reshape(tb_n, T_TGT, sb_n, T_SRC).transpose(
            0, 2, 1, 3).reshape(tb_n, sb_n, 1, r)

        p = params
        beff = (jnp.dot(temb.astype(f32),
                        p["emb_w1"][edge_extra : edge_extra + sed].astype(f32))
                + p["emb_b1"].astype(f32)).reshape(-1, 1)
        w1b = p["emb_w1"][:edge_extra].astype(f32).T
        if edge_extra == 0:
            w1b = jnp.zeros((h_emb, 1), f32)
        w1g = p["emb_w1"][edge_extra + sed :].astype(f32).T
        we2 = p["emb_w2"].astype(f32).T
        be2 = p["emb_b2"].astype(f32).reshape(-1, 1)
        wf1 = p["fc_w1"].astype(f32).T
        bf1 = p["fc_b1"].astype(f32).reshape(-1, 1)
        wf2, bf2 = _w2_padded_t(
            tmetas, wn_p, p["fc_w2"].astype(f32), p["fc_b2"].astype(f32))

        grid = (tb_n, sb_n)
        const = lambda i, j: (0, 0)
        im_s = lambda i, j: (0, j)
        im_b = lambda i, j: (i, j, 0, 0)
        vm = lambda shp: pl.BlockSpec(shp, const, memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            make_kernel(nt),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                vm((5, nt)),
                vm((din_p, nt)),
                pl.BlockSpec((5, T_SRC), im_s, memory_space=pltpu.VMEM),
                pl.BlockSpec((din_p, T_SRC), im_s, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, eb, r), im_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, r), im_b, memory_space=pltpu.VMEM),
                vm((h_emb, max(edge_extra, 1))),
                vm((h_emb, gs_n)),
                vm((h_emb, 1)),
                vm((ns, h_emb)),
                vm((ns, 1)),
                vm((h_fc, h_fc)),
                vm((h_fc, 1)),
                vm((wn_p, h_fc)),
                vm((wn_p, 1)),
                vm((kdim, 9)),
                vm((gs_n, 1)),
                vm((r, T_TGT)),
            ],
            out_specs=pl.BlockSpec((1, dout_p, T_TGT), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tb_n, dout_p, T_TGT), f32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=ip,
        )(
            jnp.asarray(cutoff, f32).reshape(1, 1),
            tgeo, txT, sgeo, sxT, bondb, bmaskb,
            w1b, w1g, beff, we2, be2, wf1, bf1, wf2, bf2,
            jnp.asarray(ck_np.T, f32),
            jnp.asarray(offs_np, f32).reshape(-1, 1),
            jnp.asarray(_msel_np(r, T_TGT, T_SRC)),
        )
        out = out.transpose(1, 0, 2).reshape(dout_p, nt)
        return cmt_to_cm(spec.out, out)[:nt0]

    twin = make_pair_twin(
        spec, din=din, ns=ns, sed=sed, gs_stop=gs_stop, gs_n=gs_n,
        edge_extra=edge_extra, flip_vec=flip_vec, cab_on_src=cab_on_src,
        exclude_self=exclude_self, fin=None,
    )
    if bwd == "pallas":
        bwd_fn = make_pair_bwd_t(
            spec, din=din, ns=ns, sed=sed, gs_stop=gs_stop, gs_n=gs_n,
            edge_extra=edge_extra, flip_vec=flip_vec,
            cab_on_src=cab_on_src, exclude_self=exclude_self,
            interpret=interpret,
        )
        def conv13(tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask,
                   cab_t, cab_s, temb, cutoff, params, bond_feat,
                   bond_mask):
            return conv(tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask,
                        cab_t, cab_s, temb, cutoff, params, bond_feat,
                        bond_mask)

        core = jax.custom_vjp(conv13)

        def fwd_rule(*args):
            return conv13(*args), args

        def bwd_rule(args, g):
            d_tgt, d_src, d_params = bwd_fn(*args, g)
            z = _zero_ct
            (tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask,
             cab_t, cab_s, temb, cutoff, params, bond_feat,
             bond_mask) = args
            return (z(tgt_pos), z(src_pos), d_tgt, d_src, z(tgt_mask),
                    z(src_mask), z(cab_t), z(cab_s), z(temb), z(cutoff),
                    d_params, z(bond_feat), z(bond_mask))

        core.defvjp(fwd_rule, bwd_rule)
    else:
        core = _vjp_wrap(conv, twin)

    def public(tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask,
               cab_t, cab_s, temb, cutoff, params, bond_feat=None,
               bond_mask=None, cnt=None):
        nt0, ns0 = tgt_x.shape[0], src_x.shape[0]
        if bond_feat is None:
            bond_feat = jnp.zeros((nt0, ns0, eb), jnp.float32)
        if bond_mask is None:
            bond_mask = jnp.zeros((nt0, ns0), jnp.float32)
        return core(tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask,
                    cab_t, cab_s, temb, jnp.asarray(cutoff, jnp.float32),
                    params, bond_feat, bond_mask)

    return public


# ---------------------------------------------------------------------------
# dual cross conv: both directions (lig <- atoms, atoms <- lig) per block
# ---------------------------------------------------------------------------


def make_cross_conv_t(
    spec: TensorProductSpec,
    *,
    din: int,
    ns: int,
    sed: int,
    gs_stop: float,
    gs_n: int,
    interpret: bool | None = None,
    fin=None,
    bwd: str = "twin",
    dw_dtype: str = "float32",
):
    """Transposed-layout dual cross conv (pallas_conv.make_cross_conv
    contract): shares pair geometry + edge embedding between directions,
    aggregates al at ligand targets and la at atom sources. bwd='pallas'
    uses the hand-written backward kernel (feature+param grads only).
    dw_dtype='bfloat16': packed-bf16 depthwise chain (see
    make_pair_conv_t; inference knob, backward stays f32)."""
    assert fin is None, "cmT kernels run the finalize epilogue under XLA"
    dwdt = jnp.bfloat16 if dw_dtype == "bfloat16" else None
    assert spec.in1.slices()[0][1] >= ns
    tmetas, ck_np, wn_p, din_p, dout_p = _tmetas(spec)
    kdim = int(ck_np.shape[1])
    offs_np = np.linspace(0.0, gs_stop, gs_n)
    gs_coeff = float(-0.5 / (offs_np[1] - offs_np[0]) ** 2)
    h_fc = 3 * ns
    r = T_TGT * T_SRC

    def make_kernel(nl: int, na: int):
        n_src_tiles = na // T_SRC

        def kernel(cut, lgeo, lxT, ageo, axT,
                   w1g, beff, we2, be2,
                   wal1, bal1, wal2, bal2, wla1, bla1, wla2, bla2,
                   ckT, gsoff, msel, al_ref, la_ref):
            i = pl.program_id(0)
            f32 = jnp.float32

            @pl.when(i == 0)
            def _():
                la_ref[:] = jnp.zeros_like(la_ref)

            al_ref[0] = jnp.zeros_like(al_ref[0])

            # ligand (target-side) broadcast, shared across source tiles
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (nl, r), 0)
            pcols = jax.lax.broadcasted_iota(jnp.int32, (nl, r), 1)
            tf = (rows_i == i * T_TGT + pcols // T_SRC).astype(f32)
            lb = jnp.dot(lgeo[:], tf, preferred_element_type=f32,
                         precision=MOVE_PREC)
            lpos, lmask = lb[0:3], lb[3:4]
            lx_b = _move_dot(lxT[:], tf, dwdt).astype(f32)
            lsc = lx_b[0:ns, :]

            def src_tile(jt, _):
                sl = pl.ds(pl.multiple_of(jt * T_SRC, T_SRC), T_SRC)
                ageo_b = _tile_lanes(ageo[:, sl], T_TGT)
                ax_b = _tile_lanes(axT[:, sl], T_TGT)
                apos, amask, acab = ageo_b[0:3], ageo_b[3:4], ageo_b[4:5]
                asc = ax_b[0:ns, :]

                dvec = apos - lpos  # lig -> atom
                d2 = jnp.sum(dvec * dvec, axis=0, keepdims=True)
                d = jnp.sqrt(d2 + 1e-12)
                u = dvec / d

                base = (acab > 0) | (d <= cut[0, 0])
                maskf = (base & (lmask > 0) & (amask > 0)).astype(f32)

                gs = jnp.exp(gs_coeff * (d - gsoff[:]) ** 2)
                h1 = jnp.maximum(
                    jnp.dot(w1g[:], gs, preferred_element_type=f32)
                    + beff[:], 0.0)
                attr = (jnp.dot(we2[:], h1, preferred_element_type=f32)
                        + be2[:])

                sh = _sh_rows(u[0:1], u[1:2], u[2:3])
                cb = jnp.dot(ckT[:], sh, preferred_element_type=f32)

                # al: source = atoms, aggregate at ligand targets
                e_al = jnp.concatenate([attr, lsc, asc], axis=0)
                h_al = jnp.maximum(
                    jnp.dot(wal1[:], e_al, preferred_element_type=f32)
                    + bal1[:], 0.0)
                w_al = (jnp.dot(wal2[:], h_al, preferred_element_type=f32)
                        + bal2[:])

                mselk = msel[:] if dwdt is None else msel[:].astype(dwdt)

                def agg_al(m, z):
                    n_rows = m["d3"] * m["mul_p"]
                    if dwdt is None:
                        mk = jnp.dot(z, mselk, preferred_element_type=f32,
                                     precision=MOVE_PREC)
                    else:
                        mk = jnp.dot(z, mselk, preferred_element_type=f32)
                    al_ref[0, m["out_row"] : m["out_row"] + n_rows, :] += mk

                _dw_paths_t(tmetas, ax_b, w_al, cb, maskf, agg_al, dwdt)

                # la: source = ligand, aggregate at atom columns
                e_la = jnp.concatenate([attr, asc, lsc], axis=0)
                h_la = jnp.maximum(
                    jnp.dot(wla1[:], e_la, preferred_element_type=f32)
                    + bla1[:], 0.0)
                w_la = (jnp.dot(wla2[:], h_la, preferred_element_type=f32)
                        + bla2[:])

                def agg_la(m, z):
                    # per-source sums accumulate in f32 (policy: only the
                    # per-pair products are rounded, never the sums)
                    n_rows = m["d3"] * m["mul_p"]
                    s = z[:, 0:T_SRC].astype(f32)
                    for tt in range(1, T_TGT):
                        s = s + z[:, tt * T_SRC : (tt + 1) * T_SRC].astype(
                            f32)
                    la_ref[m["out_row"] : m["out_row"] + n_rows, sl] += s

                _dw_paths_t(tmetas, lx_b, w_la, cb, maskf, agg_la, dwdt)
                return _

            jax.lax.fori_loop(0, n_src_tiles, src_tile, 0, unroll=False)

        return kernel

    def conv(lig_pos, atm_pos, lig_cm, atm_cm, lig_mask, atm_mask,
             cabflag, temb, cutoff, emb_params, fc_al, fc_la,
             fin_al=None, fin_la=None, cnt_al=None, cnt_la=None):
        ip = (interpret if interpret is not None
              else jax.default_backend() == "cpu")
        f32 = jnp.float32
        nl0, na0 = lig_cm.shape[0], atm_cm.shape[0]
        nl = -(-nl0 // T_TGT) * T_TGT
        na = -(-na0 // T_SRC) * T_SRC
        zl = jnp.zeros((nl0,), f32)
        lgeo = _geoT(lig_pos, lig_mask, zl, nl)
        ageo = _geoT(atm_pos, atm_mask, cabflag, na)
        lxT = _pad_axis(cm_to_cmt(spec.in1, lig_cm.astype(f32)), nl, axis=1)
        axT = _pad_axis(cm_to_cmt(spec.in1, atm_cm.astype(f32)), na, axis=1)

        e = emb_params
        beff = (jnp.dot(temb.astype(f32), e["l1"]["w"][:sed].astype(f32))
                + e["l1"]["b"].astype(f32)).reshape(-1, 1)
        w1g = e["l1"]["w"][sed:].astype(f32).T
        we2 = e["l2"]["w"].astype(f32).T
        be2 = e["l2"]["b"].astype(f32).reshape(-1, 1)

        def fc_t(fc):
            w1 = fc["l1"]["w"].astype(f32).T
            b1 = fc["l1"]["b"].astype(f32).reshape(-1, 1)
            w2, b2 = _w2_padded_t(
                tmetas, wn_p, fc["l2"]["w"].astype(f32),
                fc["l2"]["b"].astype(f32))
            return w1, b1, w2, b2

        wal1, bal1, wal2, bal2 = fc_t(fc_al)
        wla1, bla1, wla2, bla2 = fc_t(fc_la)

        const = lambda i: (0, 0)
        vm = lambda shp: pl.BlockSpec(shp, const, memory_space=pltpu.VMEM)
        al, la = pl.pallas_call(
            make_kernel(nl, na),
            grid=(nl // T_TGT,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                vm((5, nl)),
                vm((din_p, nl)),
                vm((5, na)),
                vm((din_p, na)),
                vm((ns, gs_n)),
                vm((ns, 1)),
                vm((ns, ns)),
                vm((ns, 1)),
                vm((h_fc, h_fc)),
                vm((h_fc, 1)),
                vm((wn_p, h_fc)),
                vm((wn_p, 1)),
                vm((h_fc, h_fc)),
                vm((h_fc, 1)),
                vm((wn_p, h_fc)),
                vm((wn_p, 1)),
                vm((kdim, 9)),
                vm((gs_n, 1)),
                vm((r, T_TGT)),
            ],
            out_specs=(
                pl.BlockSpec((1, dout_p, T_TGT), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dout_p, na), const, memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nl // T_TGT, dout_p, T_TGT), f32),
                jax.ShapeDtypeStruct((dout_p, na), f32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=ip,
        )(
            jnp.asarray(cutoff, f32).reshape(1, 1),
            lgeo, lxT, ageo, axT,
            w1g, beff, we2, be2,
            wal1, bal1, wal2, bal2, wla1, bla1, wla2, bla2,
            jnp.asarray(ck_np.T, f32),
            jnp.asarray(offs_np, f32).reshape(-1, 1),
            jnp.asarray(_msel_np(r, T_TGT, T_SRC)),
        )
        al = al.transpose(1, 0, 2).reshape(dout_p, nl)
        return (cmt_to_cm(spec.out, al)[:nl0],
                cmt_to_cm(spec.out, la)[:na0])

    twin = make_cross_twin(
        spec, din=din, ns=ns, sed=sed, gs_stop=gs_stop, gs_n=gs_n, fin=None)
    if bwd == "pallas":
        bwd_fn = make_cross_bwd_t(
            spec, din=din, ns=ns, sed=sed, gs_stop=gs_stop, gs_n=gs_n,
            interpret=interpret,
        )

        def conv12(lig_pos, atm_pos, lig_cm, atm_cm, lig_mask, atm_mask,
                   cabflag, temb, cutoff, emb_params, fc_al, fc_la):
            return conv(lig_pos, atm_pos, lig_cm, atm_cm, lig_mask,
                        atm_mask, cabflag, temb, cutoff, emb_params,
                        fc_al, fc_la)

        core = jax.custom_vjp(conv12)

        def fwd_rule(*args):
            return conv12(*args), args

        def bwd_rule(args, g):
            g_al, g_la = g
            d_lig, d_atm, d_emb, d_al, d_la = bwd_fn(*args, g_al, g_la)
            z = _zero_ct
            (lig_pos, atm_pos, lig_cm, atm_cm, lig_mask, atm_mask,
             cabflag, temb, cutoff, emb_params, fc_al, fc_la) = args
            return (z(lig_pos), z(atm_pos), d_lig, d_atm, z(lig_mask),
                    z(atm_mask), z(cabflag), z(temb), z(cutoff),
                    d_emb, d_al, d_la)

        core.defvjp(fwd_rule, bwd_rule)
    else:
        core = _vjp_wrap(conv, twin)

    def public(lig_pos, atm_pos, lig_cm, atm_cm, lig_mask, atm_mask,
               cabflag, temb, cutoff, emb_params, fc_al, fc_la,
               fin_al=None, fin_la=None, cnt_al=None, cnt_la=None):
        return core(lig_pos, atm_pos, lig_cm, atm_cm, lig_mask, atm_mask,
                    cabflag, temb, jnp.asarray(cutoff, jnp.float32),
                    emb_params, fc_al, fc_la)

    return public


# ---------------------------------------------------------------------------
# knn (gather-form) conv for the fixed-degree atom graph
# ---------------------------------------------------------------------------

T_KT = 64


def make_knn_conv_t(
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
    bwd: str = "twin",
    dw_dtype: str = "float32",
):
    """Transposed-layout knn conv: neighbors gathered via a one-hot MXU
    matmul from the VMEM-resident transposed node array; aggregation over
    the K axis via per-lane-tile one-hot matmuls (128 % k == 0 keeps each
    target's K sources inside one lane tile). dw_dtype='bfloat16':
    packed-bf16 depthwise chain (see make_pair_conv_t; inference knob,
    backward stays f32)."""
    assert fin is None, "cmT kernels run the finalize epilogue under XLA"
    dwdt = jnp.bfloat16 if dw_dtype == "bfloat16" else None
    assert spec.in1.slices()[0][1] >= ns
    tmetas, ck_np, wn_p, din_p, dout_p = _tmetas(spec)
    kdim = int(ck_np.shape[1])
    offs_np = np.linspace(0.0, gs_stop, gs_n)
    gs_coeff = float(-0.5 / (offs_np[1] - offs_np[0]) ** 2)
    h_fc = 3 * ns
    r = T_KT * k
    assert T_SRC % k == 0, f"knn cmT kernel needs k | 128, got {k}"
    tpl = T_SRC // k  # targets per lane tile
    n_lt = r // T_SRC  # lane tiles per target tile

    def make_kernel(n: int):
        def kernel(srcM, idxf, validf, w1g, beff, we2, be2,
                   wf1, bf1, wf2, bf2, ckT, gsoff, m8, out_ref):
            i = pl.program_id(0)
            f32 = jnp.float32
            out_ref[0] = jnp.zeros_like(out_ref[0])

            # gather one-hot: G[nsrc, p] = (nsrc == idx_flat[p]).
            # Geometry rows (0:5) move exactly; feature rows take
            # _move_dot (bf16 chain: 1 pass — the values are rounded to
            # bf16 downstream anyway). This gather was the dominant
            # movement cost: [5+din_p, n] @ [n, r] at 6 passes.
            rows_n = jax.lax.broadcasted_iota(jnp.int32, (n, r), 0)
            G = (rows_n == idxf[0]).astype(f32)
            g_geo = jnp.dot(srcM[0:5, :], G, preferred_element_type=f32,
                            precision=MOVE_PREC)
            g_feat = _move_dot(srcM[5:, :], G, dwdt).astype(f32)
            # target repeat: Tf[nsrc, p] = (nsrc == i*T_KT + p//k)
            pcols = jax.lax.broadcasted_iota(jnp.int32, (n, r), 1)
            tf = (rows_n == i * T_KT + pcols // k).astype(f32)
            t_geo = jnp.dot(srcM[0:5, :], tf, preferred_element_type=f32,
                            precision=MOVE_PREC)
            t_sc = _move_dot(srcM[5 : 5 + ns, :], tf, dwdt).astype(f32)

            gpos = g_geo[0:3]
            tpos = t_geo[0:3]
            dvec = gpos - tpos
            d2 = jnp.sum(dvec * dvec, axis=0, keepdims=True)
            d = jnp.sqrt(d2 + 1e-12)
            u = dvec / d
            maskf = validf[0]

            gs = jnp.exp(gs_coeff * (d - gsoff[:]) ** 2)
            h1 = jnp.maximum(
                jnp.dot(w1g[:], gs, preferred_element_type=f32) + beff[:],
                0.0)
            attr = jnp.dot(we2[:], h1, preferred_element_type=f32) + be2[:]

            e = jnp.concatenate(
                [attr, t_sc, g_feat[0:ns]], axis=0)
            h = jnp.maximum(
                jnp.dot(wf1[:], e, preferred_element_type=f32) + bf1[:], 0.0)
            w = jnp.dot(wf2[:], h, preferred_element_type=f32) + bf2[:]

            sh = _sh_rows(u[0:1], u[1:2], u[2:3])
            cb = jnp.dot(ckT[:], sh, preferred_element_type=f32)

            src_b = g_feat  # full feature rows (din_p) for the TP

            m8k = m8[:] if dwdt is None else m8[:].astype(dwdt)

            def agg(m, z):
                n_rows = m["d3"] * m["mul_p"]
                if dwdt is None:
                    parts = [
                        jnp.dot(z[:, tt * T_SRC : (tt + 1) * T_SRC], m8k,
                                preferred_element_type=f32,
                                precision=MOVE_PREC)
                        for tt in range(n_lt)
                    ]
                else:
                    parts = [
                        jnp.dot(z[:, tt * T_SRC : (tt + 1) * T_SRC], m8k,
                                preferred_element_type=f32)
                        for tt in range(n_lt)
                    ]
                mk = (jnp.concatenate(parts, axis=1)
                      if n_lt > 1 else parts[0])
                out_ref[0, m["out_row"] : m["out_row"] + n_rows, :] += mk

            _dw_paths_t(tmetas, src_b, w, cb, maskf, agg, dwdt)

        return kernel

    def conv(pos, x_cm, mask, idx, valid, temb, params):
        ip = (interpret if interpret is not None
              else jax.default_backend() == "cpu")
        f32 = jnp.float32
        n0 = x_cm.shape[0]
        n = -(-n0 // T_KT) * T_KT
        zc = jnp.zeros((n0,), f32)
        geo = _geoT(pos, mask, zc, n)
        xT = _pad_axis(cm_to_cmt(spec.in1, x_cm.astype(f32)), n, axis=1)
        # gathered rows: [geo(5); scalars dup for the fc MLP is implicit
        # since scalars are the first ns feature rows]
        srcM = jnp.concatenate([geo, xT], axis=0)  # [5 + din_p, n]

        idx_p = _pad_axis(idx.astype(jnp.int32), n, axis=0)
        valid_p = _pad_axis(valid.astype(f32), n, axis=0)
        n_tiles = n // T_KT
        idxf = idx_p.reshape(n_tiles, 1, r)
        validf = valid_p.reshape(n_tiles, 1, r)

        e = params["emb"]
        fc = params["fc"]
        beff = (jnp.dot(temb.astype(f32), e["l1"]["w"][:sed].astype(f32))
                + e["l1"]["b"].astype(f32)).reshape(-1, 1)
        w1g = e["l1"]["w"][sed:].astype(f32).T
        we2 = e["l2"]["w"].astype(f32).T
        be2 = e["l2"]["b"].astype(f32).reshape(-1, 1)
        wf1 = fc["l1"]["w"].astype(f32).T
        bf1 = fc["l1"]["b"].astype(f32).reshape(-1, 1)
        wf2, bf2 = _w2_padded_t(
            tmetas, wn_p, fc["l2"]["w"].astype(f32),
            fc["l2"]["b"].astype(f32))

        const = lambda i: (0, 0)
        vm = lambda shp: pl.BlockSpec(shp, const, memory_space=pltpu.VMEM)
        im_i = lambda i: (i, 0)
        out = pl.pallas_call(
            make_kernel(n),
            grid=(n_tiles,),
            in_specs=[
                vm((5 + din_p, n)),
                pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                vm((ns, gs_n)),
                vm((ns, 1)),
                vm((ns, ns)),
                vm((ns, 1)),
                vm((h_fc, h_fc)),
                vm((h_fc, 1)),
                vm((wn_p, h_fc)),
                vm((wn_p, 1)),
                vm((kdim, 9)),
                vm((gs_n, 1)),
                vm((T_SRC, tpl)),
            ],
            out_specs=pl.BlockSpec((1, dout_p, T_KT), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, dout_p, T_KT), f32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=ip,
        )(
            srcM, idxf, validf, w1g, beff, we2, be2,
            wf1, bf1, wf2, bf2,
            jnp.asarray(ck_np.T, f32),
            jnp.asarray(offs_np, f32).reshape(-1, 1),
            jnp.asarray(_msel_np(T_SRC, tpl, k)),
        )
        out = out.transpose(1, 0, 2).reshape(dout_p, n)
        return cmt_to_cm(spec.out, out)[:n0]

    twin = make_knn_twin(
        spec, din=din, ns=ns, sed=sed, gs_stop=gs_stop, gs_n=gs_n, k=k,
        fin=None)
    if bwd == "pallas":
        bwd_fn = make_knn_bwd_t(
            spec, din=din, ns=ns, sed=sed, gs_stop=gs_stop, gs_n=gs_n,
            k=k, interpret=interpret,
        )

        def conv7(pos, x_cm, mask, idx, valid, temb, params):
            return conv(pos, x_cm, mask, idx, valid, temb, params)

        core = jax.custom_vjp(conv7)

        def fwd_rule(*args):
            return conv7(*args), args

        def bwd_rule(args, g):
            pos, x_cm, mask, idx, valid, temb, params = args
            d_x, d_params = bwd_fn(*args, g)
            z = _zero_ct
            return (z(pos), d_x, z(mask), z(idx), z(valid), z(temb),
                    d_params)

        core.defvjp(fwd_rule, bwd_rule)
        return core
    return _vjp_wrap(conv, twin)


# ---------------------------------------------------------------------------
# hand-written pallas backward (pair conv)
#
# The custom-VJP twins re-derive every pair-space intermediate under XLA,
# which makes the backward ~2/3 of a training step (round-2 measurement).
# In the cmT layout the backward is the same kind of program as the
# forward: recompute the per-block activations, then
#   dz        = g broadcast to pairs              (one-hot matmul)
#   d(wp)     = sum_k dz_k * (sum_i a_i cb_ik)    (lane-dense VPU)
#   d(a_i)    = sum_k dz_k * cb_ik * wp_m         (lane-dense VPU)
#   dW        = dX @ act^T                        (MXU, contract over pairs)
#   d(feats)  = aggregated to nodes               (one-hot / lane-tile sums)
# Positions, time embedding, masks, and bond features receive ZERO
# cotangents (they are pure data in training — nothing with parameters
# sits upstream); the factory's bwd="twin" mode keeps the full-gradient
# XLA twin for any use that needs position gradients.
# ---------------------------------------------------------------------------


def _zero_ct(x):
    """Zero cotangent matching custom_vjp conventions (float0 for ints)."""
    def one(v):
        if jnp.issubdtype(v.dtype, jnp.integer) or v.dtype == jnp.bool_:
            return np.zeros(v.shape, jax.dtypes.float0)
        return jnp.zeros_like(v)

    return jax.tree.map(one, x)


def _acc_zero(refs):
    for r_ in refs:
        r_[...] = jnp.zeros(r_.shape, r_.dtype)


def make_pair_bwd_t(
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
):
    """Backward kernel for make_pair_conv_t. Returns
    bwd(fwd_args..., g_cm) -> (d_tgt_cm, d_src_cm, d_params) where g_cm is
    the [Nt, dout] component-major cotangent of the conv output."""
    tmetas, ck_np, wn_p, din_p, dout_p = _tmetas(spec)
    kdim = int(ck_np.shape[1])
    offs_np = np.linspace(0.0, gs_stop, gs_n)
    gs_coeff = float(-0.5 / (offs_np[1] - offs_np[0]) ** 2)
    h_emb = ns
    h_fc = 3 * ns
    eb = max(edge_extra, 1)
    r = T_TGT * T_SRC
    HI = jax.lax.Precision.HIGHEST

    def make_kernel(nt: int):
        def kernel(cut, tgeo, txT, sgeo, sxT, bondb, bmaskb,
                   w1b, w1g, beff, we2, be2, wf1, bf1, wf2, bf2,
                   ckT, gsoff, msel, g3,
                   dsrc, dtgt3, dwf2, dbf2, dwf1, dbf1, dwe2, dbe2,
                   dw1g, dw1b, dbeff, dwbuf):
            i = pl.program_id(0)
            j = pl.program_id(1)
            f32 = jnp.float32

            @pl.when((i == 0) & (j == 0))
            def _():
                _acc_zero([dsrc, dwf2, dbf2, dwf1, dbf1, dwe2, dbe2,
                           dw1g, dw1b, dbeff])

            @pl.when(j == 0)
            def _():
                dtgt3[0] = jnp.zeros_like(dtgt3[0])

            # ---- recompute forward activations for this block
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (nt, r), 0)
            pcols = jax.lax.broadcasted_iota(jnp.int32, (nt, r), 1)
            tf = (rows_i == i * T_TGT + pcols // T_SRC).astype(f32)
            tcat = jnp.concatenate([tgeo[:], txT[0:ns, :]], axis=0)
            tb = jnp.dot(tcat, tf, preferred_element_type=f32, precision=HI)
            tpos, tmask, tcab = tb[0:3], tb[3:4], tb[4:5]
            tsc = tb[5 : 5 + ns]

            sgeo_b = _tile_lanes(sgeo[:], T_TGT)
            sx_b = _tile_lanes(sxT[:], T_TGT)
            spos, smask, scab = sgeo_b[0:3], sgeo_b[3:4], sgeo_b[4:5]

            dvec = spos - tpos
            d2 = jnp.sum(dvec * dvec, axis=0, keepdims=True)
            d = jnp.sqrt(d2 + 1e-12)
            sgn = -1.0 if flip_vec else 1.0
            u = dvec * (sgn / d)

            cabrow = scab if cab_on_src else tcab
            base = (cabrow > 0) | (d <= cut[0, 0])
            if exclude_self:
                pp = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
                tg = i * T_TGT + pp // T_SRC
                sg = j * T_SRC + pp % T_SRC
                base = base & (tg != sg)
                if edge_extra:
                    base = base | (bmaskb[0, 0] > 0)
            maskf = (base & (tmask > 0) & (smask > 0)).astype(f32)

            gs = jnp.exp(gs_coeff * (d - gsoff[:]) ** 2)
            h1 = jnp.dot(w1g[:], gs, preferred_element_type=f32) + beff[:]
            if edge_extra:
                h1 = h1 + jnp.dot(w1b[:], bondb[0, 0],
                                  preferred_element_type=f32)
            h1 = jnp.maximum(h1, 0.0)
            attr = jnp.dot(we2[:], h1, preferred_element_type=f32) + be2[:]

            e = jnp.concatenate([attr, tsc, sx_b[0:ns, :]], axis=0)
            h = jnp.maximum(
                jnp.dot(wf1[:], e, preferred_element_type=f32) + bf1[:], 0.0)
            w = jnp.dot(wf2[:], h, preferred_element_type=f32) + bf2[:]

            sh = _sh_rows(u[0:1], u[1:2], u[2:3])
            cb = jnp.dot(ckT[:], sh, preferred_element_type=f32)

            # ---- depthwise backward per path
            gblk = g3[0]  # [dout_p, T_TGT]

            for m in tmetas:
                mp, d1, d3 = m["mul_p"], m["d1"], m["d3"]
                n_rows = d3 * mp
                dz = jax.lax.dot_general(
                    gblk[m["out_row"] : m["out_row"] + n_rows, :],
                    msel[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32, precision=HI,
                )  # [n_rows, r] = broadcast of g to pairs
                wp_m = w[m["w_row"] : m["w_row"] + mp, :] * maskf
                a_list = [sx_b[r0 : r0 + mp, :] for r0 in m["src_rows"]]
                dwp = None
                for k in range(d3):
                    dzk = dz[k * mp : (k + 1) * mp, :]
                    zk_raw = None
                    for i2 in range(d1):
                        c = cb[m["cb_off"] + i2 * d3 + k
                               : m["cb_off"] + i2 * d3 + k + 1, :]
                        t = a_list[i2] * c
                        zk_raw = t if zk_raw is None else zk_raw + t
                    t = dzk * zk_raw
                    dwp = t if dwp is None else dwp + t
                    for i2 in range(d1):
                        c = cb[m["cb_off"] + i2 * d3 + k
                               : m["cb_off"] + i2 * d3 + k + 1, :]
                        da = dzk * c * wp_m  # [mp, r]
                        # aggregate to sources: sum over the 8 target tiles
                        s_ = da[:, 0:T_SRC]
                        for tt in range(1, T_TGT):
                            s_ = s_ + da[:, tt * T_SRC : (tt + 1) * T_SRC]
                        r0 = m["src_rows"][i2]
                        sl = pl.ds(pl.multiple_of(j * T_SRC, T_SRC), T_SRC)
                        dsrc[r0 : r0 + mp, sl] += s_
                dwbuf[m["w_row"] : m["w_row"] + mp, :] = dwp * maskf

            # ---- fc MLP backward
            dwv = dwbuf[:]
            dh = jnp.dot(jnp.swapaxes(wf2[:], 0, 1), dwv,
                         preferred_element_type=f32)
            dpre = dh * (h > 0)
            de = jnp.dot(jnp.swapaxes(wf1[:], 0, 1), dpre,
                         preferred_element_type=f32)
            dwf2[...] += jax.lax.dot_general(
                dwv, h, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            dbf2[...] += jnp.sum(dwv, axis=1, keepdims=True)
            dwf1[...] += jax.lax.dot_general(
                dpre, e, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            dbf1[...] += jnp.sum(dpre, axis=1, keepdims=True)

            dattr = de[0:ns, :]
            dtsc = de[ns : 2 * ns, :]
            dssc = de[2 * ns : 3 * ns, :]
            dtgt3[0] += jnp.dot(dtsc, msel[:],
                                preferred_element_type=f32, precision=HI)
            s_ = dssc[:, 0:T_SRC]
            for tt in range(1, T_TGT):
                s_ = s_ + dssc[:, tt * T_SRC : (tt + 1) * T_SRC]
            sl = pl.ds(pl.multiple_of(j * T_SRC, T_SRC), T_SRC)
            dsrc[0:ns, sl] += s_

            # ---- edge MLP backward
            dh1 = jnp.dot(jnp.swapaxes(we2[:], 0, 1), dattr,
                          preferred_element_type=f32)
            dpre1 = dh1 * (h1 > 0)
            dwe2[...] += jax.lax.dot_general(
                dattr, h1, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            dbe2[...] += jnp.sum(dattr, axis=1, keepdims=True)
            dw1g[...] += jax.lax.dot_general(
                dpre1, gs, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            if edge_extra:
                dw1b[...] += jax.lax.dot_general(
                    dpre1, bondb[0, 0],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
            dbeff[...] += jnp.sum(dpre1, axis=1, keepdims=True)

        return kernel

    def bwd(tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask,
            cab_t, cab_s, temb, cutoff, params, bond_feat, bond_mask, g_cm):
        ip = (interpret if interpret is not None
              else jax.default_backend() == "cpu")
        f32 = jnp.float32
        nt0, ns0 = tgt_x.shape[0], src_x.shape[0]
        nt = -(-nt0 // T_TGT) * T_TGT
        nsrc = -(-ns0 // T_SRC) * T_SRC
        tgeo = _geoT(tgt_pos, tgt_mask, cab_t, nt)
        sgeo = _geoT(src_pos, src_mask, cab_s, nsrc)
        txT = _pad_axis(cm_to_cmt(spec.in1, tgt_x.astype(f32)), nt, axis=1)
        sxT = _pad_axis(cm_to_cmt(spec.in1, src_x.astype(f32)), nsrc, axis=1)

        tb_n, sb_n = nt // T_TGT, nsrc // T_SRC
        bf = _pad_axis(_pad_axis(bond_feat.astype(f32), nt, 0), nsrc, 1)
        bm = _pad_axis(_pad_axis(bond_mask.astype(f32), nt, 0), nsrc, 1)
        bondb = bf.reshape(tb_n, T_TGT, sb_n, T_SRC, eb).transpose(
            0, 2, 4, 1, 3).reshape(tb_n, sb_n, eb, r)
        bmaskb = bm.reshape(tb_n, T_TGT, sb_n, T_SRC).transpose(
            0, 2, 1, 3).reshape(tb_n, sb_n, 1, r)

        p = params
        beff = (jnp.dot(temb.astype(f32),
                        p["emb_w1"][edge_extra : edge_extra + sed].astype(f32))
                + p["emb_b1"].astype(f32)).reshape(-1, 1)
        w1b = p["emb_w1"][:edge_extra].astype(f32).T
        if edge_extra == 0:
            w1b = jnp.zeros((h_emb, 1), f32)
        w1g = p["emb_w1"][edge_extra + sed :].astype(f32).T
        we2 = p["emb_w2"].astype(f32).T
        be2 = p["emb_b2"].astype(f32).reshape(-1, 1)
        wf1 = p["fc_w1"].astype(f32).T
        bf1 = p["fc_b1"].astype(f32).reshape(-1, 1)
        wf2, bf2 = _w2_padded_t(
            tmetas, wn_p, p["fc_w2"].astype(f32), p["fc_b2"].astype(f32))

        # cotangent -> cmT, 3D-blocked by target tile
        gT = _pad_axis(cm_to_cmt(spec.out, g_cm.astype(f32)), nt, axis=1)
        g3 = gT.reshape(dout_p, tb_n, T_TGT).transpose(1, 0, 2)

        grid = (tb_n, sb_n)
        const = lambda i, j: (0, 0)
        im_s = lambda i, j: (0, j)
        im_b = lambda i, j: (i, j, 0, 0)
        vm = lambda shp: pl.BlockSpec(shp, const, memory_space=pltpu.VMEM)

        outs = pl.pallas_call(
            make_kernel(nt),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                vm((5, nt)),
                vm((din_p, nt)),
                pl.BlockSpec((5, T_SRC), im_s, memory_space=pltpu.VMEM),
                pl.BlockSpec((din_p, T_SRC), im_s, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, eb, r), im_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, r), im_b, memory_space=pltpu.VMEM),
                vm((h_emb, eb)),
                vm((h_emb, gs_n)),
                vm((h_emb, 1)),
                vm((ns, h_emb)),
                vm((ns, 1)),
                vm((h_fc, h_fc)),
                vm((h_fc, 1)),
                vm((wn_p, h_fc)),
                vm((wn_p, 1)),
                vm((kdim, 9)),
                vm((gs_n, 1)),
                vm((r, T_TGT)),
                pl.BlockSpec((1, dout_p, T_TGT), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((din_p, nsrc), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ns, T_TGT), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                vm((wn_p, h_fc)),
                vm((wn_p, 1)),
                vm((h_fc, h_fc)),
                vm((h_fc, 1)),
                vm((ns, h_emb)),
                vm((ns, 1)),
                vm((h_emb, gs_n)),
                vm((h_emb, eb)),
                vm((h_emb, 1)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((din_p, nsrc), f32),
                jax.ShapeDtypeStruct((tb_n, ns, T_TGT), f32),
                jax.ShapeDtypeStruct((wn_p, h_fc), f32),
                jax.ShapeDtypeStruct((wn_p, 1), f32),
                jax.ShapeDtypeStruct((h_fc, h_fc), f32),
                jax.ShapeDtypeStruct((h_fc, 1), f32),
                jax.ShapeDtypeStruct((ns, h_emb), f32),
                jax.ShapeDtypeStruct((ns, 1), f32),
                jax.ShapeDtypeStruct((h_emb, gs_n), f32),
                jax.ShapeDtypeStruct((h_emb, eb), f32),
                jax.ShapeDtypeStruct((h_emb, 1), f32),
            ),
            scratch_shapes=[pltpu.VMEM((wn_p, r), f32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=ip,
        )(
            jnp.asarray(cutoff, f32).reshape(1, 1),
            tgeo, txT, sgeo, sxT, bondb, bmaskb,
            w1b, w1g, beff, we2, be2, wf1, bf1, wf2, bf2,
            jnp.asarray(ck_np.T, f32),
            jnp.asarray(offs_np, f32).reshape(-1, 1),
            jnp.asarray(_msel_np(r, T_TGT, T_SRC)),
            g3,
        )
        (dsrcT, dtgt3, dwf2, dbf2, dwf1, dbf1, dwe2, dbe2,
         dw1g, dw1b, dbeff) = outs

        # ---- map back to the public layouts
        d_src_cm = cmt_to_cm(spec.in1, dsrcT)[:ns0]
        dtgtT = dtgt3.transpose(1, 0, 2).reshape(ns, nt)[:, :nt0]
        d_tgt_cm = jnp.zeros((nt0, spec.in1.dim), f32).at[:, :ns].set(
            dtgtT.T)

        # fc_w2 [h, wn]: un-pad the per-path rows of dwf2 [wn_p, h]
        dfc_w2 = jnp.zeros_like(p["fc_w2"], dtype=f32)
        dfc_b2 = jnp.zeros_like(p["fc_b2"], dtype=f32)
        for m in tmetas:
            blk = dwf2[m["w_row"] : m["w_row"] + m["mul"], :]
            dfc_w2 = dfc_w2.at[:, m["w_off"] : m["w_off"] + m["mul"]].set(
                blk.T)
            dfc_b2 = dfc_b2.at[m["w_off"] : m["w_off"] + m["mul"]].set(
                dbf2[m["w_row"] : m["w_row"] + m["mul"], 0])

        demb_w1 = jnp.zeros_like(p["emb_w1"], dtype=f32)
        if edge_extra:
            demb_w1 = demb_w1.at[:edge_extra].set(dw1b.T)
        demb_w1 = demb_w1.at[edge_extra : edge_extra + sed].set(
            jnp.outer(temb.astype(f32), dbeff[:, 0]))
        demb_w1 = demb_w1.at[edge_extra + sed :].set(dw1g.T)

        d_params = {
            "emb_w1": demb_w1,
            "emb_b1": dbeff[:, 0],
            "emb_w2": dwe2.T,
            "emb_b2": dbe2[:, 0],
            "fc_w1": dwf1.T,
            "fc_b1": dbf1[:, 0],
            "fc_w2": dfc_w2,
            "fc_b2": dfc_b2,
        }
        d_params = jax.tree.map(
            lambda a, b: a.astype(b.dtype), d_params, dict(p))
        return d_tgt_cm.astype(tgt_x.dtype), d_src_cm.astype(src_x.dtype), \
            d_params

    return bwd


def make_cross_bwd_t(
    spec: TensorProductSpec,
    *,
    din: int,
    ns: int,
    sed: int,
    gs_stop: float,
    gs_n: int,
    interpret: bool | None = None,
):
    """Backward for make_cross_conv_t: bwd(fwd_args..., g_al_cm, g_la_cm)
    -> (d_lig_cm, d_atm_cm, d_emb, d_fc_al, d_fc_la). Positions/temb/
    masks/cab get zero cotangents (see make_pair_bwd_t)."""
    tmetas, ck_np, wn_p, din_p, dout_p = _tmetas(spec)
    kdim = int(ck_np.shape[1])
    offs_np = np.linspace(0.0, gs_stop, gs_n)
    gs_coeff = float(-0.5 / (offs_np[1] - offs_np[0]) ** 2)
    h_fc = 3 * ns
    r = T_TGT * T_SRC
    HI = jax.lax.Precision.HIGHEST

    def make_kernel(nl: int, na: int):
        n_src_tiles = na // T_SRC

        def kernel(cut, lgeo, lxT, ageo, axT,
                   w1g, beff, we2, be2,
                   wal1, bal1, wal2, bal2, wla1, bla1, wla2, bla2,
                   ckT, gsoff, msel, gal3, glaT,
                   dlig3, datm, dwal2, dbal2, dwal1, dbal1,
                   dwla2, dbla2, dwla1, dbla1,
                   dwe2, dbe2, dw1g, dbeff, dwb_al, dwb_la):
            i = pl.program_id(0)
            f32 = jnp.float32

            @pl.when(i == 0)
            def _():
                _acc_zero([datm, dwal2, dbal2, dwal1, dbal1,
                           dwla2, dbla2, dwla1, dbla1,
                           dwe2, dbe2, dw1g, dbeff])

            dlig3[0] = jnp.zeros(dlig3.shape[1:], f32)

            rows_i = jax.lax.broadcasted_iota(jnp.int32, (nl, r), 0)
            pcols = jax.lax.broadcasted_iota(jnp.int32, (nl, r), 1)
            tf = (rows_i == i * T_TGT + pcols // T_SRC).astype(f32)
            lcat = jnp.concatenate([lgeo[:], lxT[:]], axis=0)
            lb = jnp.dot(lcat, tf, preferred_element_type=f32, precision=HI)
            lpos, lmask = lb[0:3], lb[3:4]
            lx_b = lb[5:]
            lsc = lx_b[0:ns, :]
            gal = gal3[0]  # [dout_p, T_TGT]

            def src_tile(jt, _):
                sl = pl.ds(pl.multiple_of(jt * T_SRC, T_SRC), T_SRC)
                ageo_b = _tile_lanes(ageo[:, sl], T_TGT)
                ax_b = _tile_lanes(axT[:, sl], T_TGT)
                apos, amask, acab = ageo_b[0:3], ageo_b[3:4], ageo_b[4:5]
                asc = ax_b[0:ns, :]

                dvec = apos - lpos
                d2 = jnp.sum(dvec * dvec, axis=0, keepdims=True)
                d = jnp.sqrt(d2 + 1e-12)
                u = dvec / d
                base = (acab > 0) | (d <= cut[0, 0])
                maskf = (base & (lmask > 0) & (amask > 0)).astype(f32)

                gs = jnp.exp(gs_coeff * (d - gsoff[:]) ** 2)
                h1 = jnp.maximum(
                    jnp.dot(w1g[:], gs, preferred_element_type=f32)
                    + beff[:], 0.0)
                attr = (jnp.dot(we2[:], h1, preferred_element_type=f32)
                        + be2[:])
                sh = _sh_rows(u[0:1], u[1:2], u[2:3])
                cb = jnp.dot(ckT[:], sh, preferred_element_type=f32)

                e_al = jnp.concatenate([attr, lsc, asc], axis=0)
                h_al = jnp.maximum(
                    jnp.dot(wal1[:], e_al, preferred_element_type=f32)
                    + bal1[:], 0.0)
                w_al = (jnp.dot(wal2[:], h_al, preferred_element_type=f32)
                        + bal2[:])
                e_la = jnp.concatenate([attr, asc, lsc], axis=0)
                h_la = jnp.maximum(
                    jnp.dot(wla1[:], e_la, preferred_element_type=f32)
                    + bla1[:], 0.0)
                w_la = (jnp.dot(wla2[:], h_la, preferred_element_type=f32)
                        + bla2[:])

                gla_s = glaT[:, sl]  # [dout_p, T_SRC]

                for m in tmetas:
                    mp, d1, d3 = m["mul_p"], m["d1"], m["d3"]
                    n_rows = d3 * mp
                    # --- al: dz = g_al broadcast over sources
                    dz_al = jax.lax.dot_general(
                        gal[m["out_row"] : m["out_row"] + n_rows, :],
                        msel[:],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=f32, precision=HI)
                    # --- la: dz = g_la broadcast over targets
                    dz_la = _tile_lanes(
                        gla_s[m["out_row"] : m["out_row"] + n_rows, :],
                        T_TGT)
                    wp_al = w_al[m["w_row"] : m["w_row"] + mp, :] * maskf
                    wp_la = w_la[m["w_row"] : m["w_row"] + mp, :] * maskf
                    a_atm = [ax_b[r0 : r0 + mp, :] for r0 in m["src_rows"]]
                    a_lig = [lx_b[r0 : r0 + mp, :] for r0 in m["src_rows"]]
                    dwp_al = dwp_la = None
                    for k in range(d3):
                        dzk_al = dz_al[k * mp : (k + 1) * mp, :]
                        dzk_la = dz_la[k * mp : (k + 1) * mp, :]
                        zraw_al = zraw_la = None
                        for i2 in range(d1):
                            c = cb[m["cb_off"] + i2 * d3 + k
                                   : m["cb_off"] + i2 * d3 + k + 1, :]
                            t1 = a_atm[i2] * c
                            zraw_al = t1 if zraw_al is None else zraw_al + t1
                            t2 = a_lig[i2] * c
                            zraw_la = t2 if zraw_la is None else zraw_la + t2
                        t1 = dzk_al * zraw_al
                        dwp_al = t1 if dwp_al is None else dwp_al + t1
                        t2 = dzk_la * zraw_la
                        dwp_la = t2 if dwp_la is None else dwp_la + t2
                        for i2 in range(d1):
                            c = cb[m["cb_off"] + i2 * d3 + k
                                   : m["cb_off"] + i2 * d3 + k + 1, :]
                            r0 = m["src_rows"][i2]
                            # d(atm rows): al depthwise, sum over targets
                            da = dzk_al * c * wp_al
                            s_ = da[:, 0:T_SRC]
                            for tt in range(1, T_TGT):
                                s_ = s_ + da[:, tt * T_SRC
                                             : (tt + 1) * T_SRC]
                            datm[r0 : r0 + mp, sl] += s_
                            # d(lig rows): la depthwise, sum over sources
                            dl = dzk_la * c * wp_la
                            dlig3[0, r0 : r0 + mp, :] += jnp.dot(
                                dl, msel[:], preferred_element_type=f32,
                                precision=HI)
                    dwb_al[m["w_row"] : m["w_row"] + mp, :] = dwp_al * maskf
                    dwb_la[m["w_row"] : m["w_row"] + mp, :] = dwp_la * maskf

                # --- fc backward, both directions
                def fc_bwd(dwv, w1_, w2_, h_, e_, dW2, db2, dW1, db1):
                    dh = jnp.dot(jnp.swapaxes(w2_[:], 0, 1), dwv,
                                 preferred_element_type=f32)
                    dpre = dh * (h_ > 0)
                    de = jnp.dot(jnp.swapaxes(w1_[:], 0, 1), dpre,
                                 preferred_element_type=f32)
                    dW2[...] += jax.lax.dot_general(
                        dwv, h_, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=f32)
                    db2[...] += jnp.sum(dwv, axis=1, keepdims=True)
                    dW1[...] += jax.lax.dot_general(
                        dpre, e_,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=f32)
                    db1[...] += jnp.sum(dpre, axis=1, keepdims=True)
                    return de

                de_al = fc_bwd(dwb_al[:], wal1, wal2, h_al, e_al,
                               dwal2, dbal2, dwal1, dbal1)
                de_la = fc_bwd(dwb_la[:], wla1, wla2, h_la, e_la,
                               dwla2, dbla2, dwla1, dbla1)

                dattr = de_al[0:ns, :] + de_la[0:ns, :]
                dlsc = de_al[ns : 2 * ns, :] + de_la[2 * ns : 3 * ns, :]
                dasc = de_al[2 * ns : 3 * ns, :] + de_la[ns : 2 * ns, :]
                dlig3[0, 0:ns, :] += jnp.dot(
                    dlsc, msel[:], preferred_element_type=f32, precision=HI)
                s_ = dasc[:, 0:T_SRC]
                for tt in range(1, T_TGT):
                    s_ = s_ + dasc[:, tt * T_SRC : (tt + 1) * T_SRC]
                datm[0:ns, sl] += s_

                # --- shared edge MLP backward
                dh1 = jnp.dot(jnp.swapaxes(we2[:], 0, 1), dattr,
                              preferred_element_type=f32)
                dpre1 = dh1 * (h1 > 0)
                dwe2[...] += jax.lax.dot_general(
                    dattr, h1, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                dbe2[...] += jnp.sum(dattr, axis=1, keepdims=True)
                dw1g[...] += jax.lax.dot_general(
                    dpre1, gs, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                dbeff[...] += jnp.sum(dpre1, axis=1, keepdims=True)
                return _

            jax.lax.fori_loop(0, n_src_tiles, src_tile, 0, unroll=False)

        return kernel

    def bwd(lig_pos, atm_pos, lig_cm, atm_cm, lig_mask, atm_mask,
            cabflag, temb, cutoff, emb_params, fc_al, fc_la, g_al, g_la):
        ip = (interpret if interpret is not None
              else jax.default_backend() == "cpu")
        f32 = jnp.float32
        nl0, na0 = lig_cm.shape[0], atm_cm.shape[0]
        nl = -(-nl0 // T_TGT) * T_TGT
        na = -(-na0 // T_SRC) * T_SRC
        zl = jnp.zeros((nl0,), f32)
        lgeo = _geoT(lig_pos, lig_mask, zl, nl)
        ageo = _geoT(atm_pos, atm_mask, cabflag, na)
        lxT = _pad_axis(cm_to_cmt(spec.in1, lig_cm.astype(f32)), nl, axis=1)
        axT = _pad_axis(cm_to_cmt(spec.in1, atm_cm.astype(f32)), na, axis=1)

        e = emb_params
        beff = (jnp.dot(temb.astype(f32), e["l1"]["w"][:sed].astype(f32))
                + e["l1"]["b"].astype(f32)).reshape(-1, 1)
        w1g = e["l1"]["w"][sed:].astype(f32).T
        we2 = e["l2"]["w"].astype(f32).T
        be2 = e["l2"]["b"].astype(f32).reshape(-1, 1)

        def fc_t(fc):
            w1 = fc["l1"]["w"].astype(f32).T
            b1 = fc["l1"]["b"].astype(f32).reshape(-1, 1)
            w2, b2 = _w2_padded_t(
                tmetas, wn_p, fc["l2"]["w"].astype(f32),
                fc["l2"]["b"].astype(f32))
            return w1, b1, w2, b2

        wal1, bal1, wal2, bal2 = fc_t(fc_al)
        wla1, bla1, wla2, bla2 = fc_t(fc_la)

        tb_n = nl // T_TGT
        galT = _pad_axis(cm_to_cmt(spec.out, g_al.astype(f32)), nl, axis=1)
        gal3 = galT.reshape(dout_p, tb_n, T_TGT).transpose(1, 0, 2)
        glaT = _pad_axis(cm_to_cmt(spec.out, g_la.astype(f32)), na, axis=1)

        const = lambda i: (0, 0)
        vm = lambda shp: pl.BlockSpec(shp, const, memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            make_kernel(nl, na),
            grid=(tb_n,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                vm((5, nl)),
                vm((din_p, nl)),
                vm((5, na)),
                vm((din_p, na)),
                vm((ns, gs_n)),
                vm((ns, 1)),
                vm((ns, ns)),
                vm((ns, 1)),
                vm((h_fc, h_fc)),
                vm((h_fc, 1)),
                vm((wn_p, h_fc)),
                vm((wn_p, 1)),
                vm((h_fc, h_fc)),
                vm((h_fc, 1)),
                vm((wn_p, h_fc)),
                vm((wn_p, 1)),
                vm((kdim, 9)),
                vm((gs_n, 1)),
                vm((r, T_TGT)),
                pl.BlockSpec((1, dout_p, T_TGT), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                vm((dout_p, na)),
            ],
            out_specs=(
                pl.BlockSpec((1, din_p, T_TGT), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((din_p, na), const, memory_space=pltpu.VMEM),
                vm((wn_p, h_fc)), vm((wn_p, 1)),
                vm((h_fc, h_fc)), vm((h_fc, 1)),
                vm((wn_p, h_fc)), vm((wn_p, 1)),
                vm((h_fc, h_fc)), vm((h_fc, 1)),
                vm((ns, ns)), vm((ns, 1)),
                vm((ns, gs_n)), vm((ns, 1)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((tb_n, din_p, T_TGT), f32),
                jax.ShapeDtypeStruct((din_p, na), f32),
                jax.ShapeDtypeStruct((wn_p, h_fc), f32),
                jax.ShapeDtypeStruct((wn_p, 1), f32),
                jax.ShapeDtypeStruct((h_fc, h_fc), f32),
                jax.ShapeDtypeStruct((h_fc, 1), f32),
                jax.ShapeDtypeStruct((wn_p, h_fc), f32),
                jax.ShapeDtypeStruct((wn_p, 1), f32),
                jax.ShapeDtypeStruct((h_fc, h_fc), f32),
                jax.ShapeDtypeStruct((h_fc, 1), f32),
                jax.ShapeDtypeStruct((ns, ns), f32),
                jax.ShapeDtypeStruct((ns, 1), f32),
                jax.ShapeDtypeStruct((ns, gs_n), f32),
                jax.ShapeDtypeStruct((ns, 1), f32),
            ),
            scratch_shapes=[pltpu.VMEM((wn_p, r), f32),
                            pltpu.VMEM((wn_p, r), f32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=ip,
        )(
            jnp.asarray(cutoff, f32).reshape(1, 1),
            lgeo, lxT, ageo, axT,
            w1g, beff, we2, be2,
            wal1, bal1, wal2, bal2, wla1, bla1, wla2, bla2,
            jnp.asarray(ck_np.T, f32),
            jnp.asarray(offs_np, f32).reshape(-1, 1),
            jnp.asarray(_msel_np(r, T_TGT, T_SRC)),
            gal3, glaT,
        )
        (dlig3, datmT, dwal2, dbal2, dwal1, dbal1,
         dwla2, dbla2, dwla1, dbla1, dwe2, dbe2, dw1g, dbeff) = outs

        dligT = dlig3.transpose(1, 0, 2).reshape(din_p, nl)
        d_lig_cm = cmt_to_cm(spec.in1, dligT)[:nl0]
        d_atm_cm = cmt_to_cm(spec.in1, datmT)[:na0]

        def fc_grads(fc, dW1, db1, dW2, db2):
            dw2 = jnp.zeros_like(fc["l2"]["w"], dtype=f32)
            dbv = jnp.zeros_like(fc["l2"]["b"], dtype=f32)
            for m in tmetas:
                blk = dW2[m["w_row"] : m["w_row"] + m["mul"], :]
                dw2 = dw2.at[:, m["w_off"] : m["w_off"] + m["mul"]].set(
                    blk.T)
                dbv = dbv.at[m["w_off"] : m["w_off"] + m["mul"]].set(
                    db2[m["w_row"] : m["w_row"] + m["mul"], 0])
            g = {"l1": {"w": dW1.T, "b": db1[:, 0]},
                 "l2": {"w": dw2, "b": dbv}}
            return jax.tree.map(lambda a, b: a.astype(b.dtype), g, fc)

        d_fc_al = fc_grads(fc_al, dwal1, dbal1, dwal2, dbal2)
        d_fc_la = fc_grads(fc_la, dwla1, dbla1, dwla2, dbla2)
        demb_w1 = jnp.concatenate(
            [jnp.outer(temb.astype(f32), dbeff[:, 0]), dw1g.T], axis=0)
        d_emb = {"l1": {"w": demb_w1, "b": dbeff[:, 0]},
                 "l2": {"w": dwe2.T, "b": dbe2[:, 0]}}
        d_emb = jax.tree.map(
            lambda a, b: a.astype(b.dtype), d_emb, dict(emb_params))
        return (d_lig_cm.astype(lig_cm.dtype), d_atm_cm.astype(atm_cm.dtype),
                d_emb, d_fc_al, d_fc_la)

    return bwd


def make_knn_bwd_t(
    spec: TensorProductSpec,
    *,
    din: int,
    ns: int,
    sed: int,
    gs_stop: float,
    gs_n: int,
    k: int,
    interpret: bool | None = None,
):
    """Backward for make_knn_conv_t: bwd(fwd_args..., g_cm) ->
    (d_x_cm, d_params). Gradients scatter back to nodes through the SAME
    one-hot matrices the forward gathers with (d_x += dg @ G^T on the
    MXU), so no masked stores are needed."""
    tmetas, ck_np, wn_p, din_p, dout_p = _tmetas(spec)
    kdim = int(ck_np.shape[1])
    offs_np = np.linspace(0.0, gs_stop, gs_n)
    gs_coeff = float(-0.5 / (offs_np[1] - offs_np[0]) ** 2)
    h_fc = 3 * ns
    r = T_KT * k
    assert T_SRC % k == 0
    tpl = T_SRC // k
    n_lt = r // T_SRC
    HI = jax.lax.Precision.HIGHEST

    def make_kernel(n: int):
        def kernel(srcM, idxf, validf, w1g, beff, we2, be2,
                   wf1, bf1, wf2, bf2, ckT, gsoff, mselk, g3,
                   dx, dwf2, dbf2, dwf1, dbf1, dwe2, dbe2,
                   dw1g, dbeff, dwbuf, dgbuf):
            i = pl.program_id(0)
            f32 = jnp.float32

            @pl.when(i == 0)
            def _():
                _acc_zero([dx, dwf2, dbf2, dwf1, dbf1, dwe2, dbe2,
                           dw1g, dbeff])

            rows_n = jax.lax.broadcasted_iota(jnp.int32, (n, r), 0)
            G = (rows_n == idxf[0]).astype(f32)
            pcols = jax.lax.broadcasted_iota(jnp.int32, (n, r), 1)
            tf = (rows_n == i * T_KT + pcols // k).astype(f32)
            g_all = jnp.dot(srcM[:], G, preferred_element_type=f32,
                            precision=HI)
            t_all = jnp.dot(srcM[0 : 5 + ns, :], tf,
                            preferred_element_type=f32, precision=HI)

            gpos = g_all[0:3]
            tpos = t_all[0:3]
            dvec = gpos - tpos
            d2 = jnp.sum(dvec * dvec, axis=0, keepdims=True)
            d = jnp.sqrt(d2 + 1e-12)
            u = dvec / d
            maskf = validf[0]

            gs = jnp.exp(gs_coeff * (d - gsoff[:]) ** 2)
            h1 = jnp.maximum(
                jnp.dot(w1g[:], gs, preferred_element_type=f32) + beff[:],
                0.0)
            attr = jnp.dot(we2[:], h1, preferred_element_type=f32) + be2[:]
            e = jnp.concatenate(
                [attr, t_all[5 : 5 + ns], g_all[5 : 5 + ns]], axis=0)
            h = jnp.maximum(
                jnp.dot(wf1[:], e, preferred_element_type=f32) + bf1[:], 0.0)
            w = jnp.dot(wf2[:], h, preferred_element_type=f32) + bf2[:]
            sh = _sh_rows(u[0:1], u[1:2], u[2:3])
            cb = jnp.dot(ckT[:], sh, preferred_element_type=f32)

            src_b = g_all[5:]
            gblk = g3[0]  # [dout_p, T_KT]
            dgbuf[...] = jnp.zeros(dgbuf.shape, f32)

            for m in tmetas:
                mp, d1, d3 = m["mul_p"], m["d1"], m["d3"]
                n_rows = d3 * mp
                # dz: g broadcast to pairs (pair p belongs to target p//k)
                grows = gblk[m["out_row"] : m["out_row"] + n_rows, :]
                dz = jax.lax.dot_general(
                    grows, mselk[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32, precision=HI)  # [n_rows, r]
                wp_m = w[m["w_row"] : m["w_row"] + mp, :] * maskf
                a_list = [src_b[r0 : r0 + mp, :] for r0 in m["src_rows"]]
                dwp = None
                for kk in range(d3):
                    dzk = dz[kk * mp : (kk + 1) * mp, :]
                    zraw = None
                    for i2 in range(d1):
                        c = cb[m["cb_off"] + i2 * d3 + kk
                               : m["cb_off"] + i2 * d3 + kk + 1, :]
                        t = a_list[i2] * c
                        zraw = t if zraw is None else zraw + t
                    t = dzk * zraw
                    dwp = t if dwp is None else dwp + t
                    for i2 in range(d1):
                        c = cb[m["cb_off"] + i2 * d3 + kk
                               : m["cb_off"] + i2 * d3 + kk + 1, :]
                        r0 = m["src_rows"][i2]
                        dgbuf[5 + r0 : 5 + r0 + mp, :] += dzk * c * wp_m
                dwbuf[m["w_row"] : m["w_row"] + mp, :] = dwp * maskf

            dwv = dwbuf[:]
            dh = jnp.dot(jnp.swapaxes(wf2[:], 0, 1), dwv,
                         preferred_element_type=f32)
            dpre = dh * (h > 0)
            de = jnp.dot(jnp.swapaxes(wf1[:], 0, 1), dpre,
                         preferred_element_type=f32)
            dwf2[...] += jax.lax.dot_general(
                dwv, h, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            dbf2[...] += jnp.sum(dwv, axis=1, keepdims=True)
            dwf1[...] += jax.lax.dot_general(
                dpre, e, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            dbf1[...] += jnp.sum(dpre, axis=1, keepdims=True)

            dattr = de[0:ns, :]
            dgbuf[5 : 5 + ns, :] += de[2 * ns : 3 * ns, :]

            dh1 = jnp.dot(jnp.swapaxes(we2[:], 0, 1), dattr,
                          preferred_element_type=f32)
            dpre1 = dh1 * (h1 > 0)
            dwe2[...] += jax.lax.dot_general(
                dattr, h1, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            dbe2[...] += jnp.sum(dattr, axis=1, keepdims=True)
            dw1g[...] += jax.lax.dot_general(
                dpre1, gs, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            dbeff[...] += jnp.sum(dpre1, axis=1, keepdims=True)

            # scatter back to nodes: through the gather one-hot for the
            # source contributions, through the target one-hot for tsc
            dx[...] += jax.lax.dot_general(
                dgbuf[5:, :], G,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=HI)
            dx[0:ns, :] += jax.lax.dot_general(
                de[ns : 2 * ns, :], tf,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=HI)

        return kernel

    def bwd(pos, x_cm, mask, idx, valid, temb, params, g_cm):
        ip = (interpret if interpret is not None
              else jax.default_backend() == "cpu")
        f32 = jnp.float32
        n0 = x_cm.shape[0]
        n = -(-n0 // T_KT) * T_KT
        zc = jnp.zeros((n0,), f32)
        geo = _geoT(pos, mask, zc, n)
        xT = _pad_axis(cm_to_cmt(spec.in1, x_cm.astype(f32)), n, axis=1)
        srcM = jnp.concatenate([geo, xT], axis=0)

        idx_p = _pad_axis(idx.astype(jnp.int32), n, axis=0)
        valid_p = _pad_axis(valid.astype(f32), n, axis=0)
        n_tiles = n // T_KT
        idxf = idx_p.reshape(n_tiles, 1, r)
        validf = valid_p.reshape(n_tiles, 1, r)

        e = params["emb"]
        fc = params["fc"]
        beff = (jnp.dot(temb.astype(f32), e["l1"]["w"][:sed].astype(f32))
                + e["l1"]["b"].astype(f32)).reshape(-1, 1)
        w1g = e["l1"]["w"][sed:].astype(f32).T
        we2 = e["l2"]["w"].astype(f32).T
        be2 = e["l2"]["b"].astype(f32).reshape(-1, 1)
        wf1 = fc["l1"]["w"].astype(f32).T
        bf1 = fc["l1"]["b"].astype(f32).reshape(-1, 1)
        wf2, bf2 = _w2_padded_t(
            tmetas, wn_p, fc["l2"]["w"].astype(f32),
            fc["l2"]["b"].astype(f32))

        gT = _pad_axis(cm_to_cmt(spec.out, g_cm.astype(f32)), n, axis=1)
        g3 = gT.reshape(dout_p, n_tiles, T_KT).transpose(1, 0, 2)

        const = lambda i: (0, 0)
        vm = lambda shp: pl.BlockSpec(shp, const, memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            make_kernel(n),
            grid=(n_tiles,),
            in_specs=[
                vm((5 + din_p, n)),
                pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                vm((ns, gs_n)),
                vm((ns, 1)),
                vm((ns, ns)),
                vm((ns, 1)),
                vm((h_fc, h_fc)),
                vm((h_fc, 1)),
                vm((wn_p, h_fc)),
                vm((wn_p, 1)),
                vm((kdim, 9)),
                vm((gs_n, 1)),
                vm((r, T_KT)),
                pl.BlockSpec((1, dout_p, T_KT), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((din_p, n), const, memory_space=pltpu.VMEM),
                vm((wn_p, h_fc)), vm((wn_p, 1)),
                vm((h_fc, h_fc)), vm((h_fc, 1)),
                vm((ns, ns)), vm((ns, 1)),
                vm((ns, gs_n)), vm((ns, 1)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((din_p, n), f32),
                jax.ShapeDtypeStruct((wn_p, h_fc), f32),
                jax.ShapeDtypeStruct((wn_p, 1), f32),
                jax.ShapeDtypeStruct((h_fc, h_fc), f32),
                jax.ShapeDtypeStruct((h_fc, 1), f32),
                jax.ShapeDtypeStruct((ns, ns), f32),
                jax.ShapeDtypeStruct((ns, 1), f32),
                jax.ShapeDtypeStruct((ns, gs_n), f32),
                jax.ShapeDtypeStruct((ns, 1), f32),
            ),
            scratch_shapes=[pltpu.VMEM((wn_p, r), f32),
                            pltpu.VMEM((5 + din_p, r), f32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=ip,
        )(
            srcM, idxf, validf, w1g, beff, we2, be2,
            wf1, bf1, wf2, bf2,
            jnp.asarray(ck_np.T, f32),
            jnp.asarray(offs_np, f32).reshape(-1, 1),
            jnp.asarray(_msel_np(r, T_KT, k)),
            g3,
        )
        (dxT, dwf2g, dbf2g, dwf1g, dbf1g, dwe2g, dbe2g,
         dw1gg, dbeffg) = outs

        d_x_cm = cmt_to_cm(spec.in1, dxT)[:n0]

        dfc_w2 = jnp.zeros_like(fc["l2"]["w"], dtype=f32)
        dfc_b2 = jnp.zeros_like(fc["l2"]["b"], dtype=f32)
        for m in tmetas:
            blk = dwf2g[m["w_row"] : m["w_row"] + m["mul"], :]
            dfc_w2 = dfc_w2.at[:, m["w_off"] : m["w_off"] + m["mul"]].set(
                blk.T)
            dfc_b2 = dfc_b2.at[m["w_off"] : m["w_off"] + m["mul"]].set(
                dbf2g[m["w_row"] : m["w_row"] + m["mul"], 0])

        demb_w1 = jnp.concatenate(
            [jnp.outer(temb.astype(f32), dbeffg[:, 0]), dw1gg.T], axis=0)
        d_params = {
            "emb": {"l1": {"w": demb_w1, "b": dbeffg[:, 0]},
                    "l2": {"w": dwe2g.T, "b": dbe2g[:, 0]}},
            "fc": {"l1": {"w": dwf1g.T, "b": dbf1g[:, 0]},
                   "l2": {"w": dfc_w2, "b": dfc_b2}},
        }
        d_params = jax.tree.map(
            lambda a, b: a.astype(b.dtype), d_params,
            {"emb": dict(params["emb"]), "fc": dict(params["fc"])})
        return d_x_cm.astype(x_cm.dtype), d_params

    return bwd
