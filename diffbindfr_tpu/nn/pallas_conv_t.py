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


def _dw_paths_t(tmetas, src_b, w, cb, maskf, agg):
    """Shared depthwise-TP inner loop: for every path, gate the source
    components with the masked per-pair channel weights, contract with
    the sh-CG rows, and hand each path's stacked [d3*mul_p, R] block to
    `agg(path_meta, z)` for aggregation."""
    for m in tmetas:
        mp, d1, d3 = m["mul_p"], m["d1"], m["d3"]
        wp = w[m["w_row"] : m["w_row"] + mp, :] * maskf
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
):
    """Transposed-layout fused pair conv. Same public contract as
    pallas_conv.make_pair_conv with fin=None: component-major f32 inputs,
    returns the masked message SUM [Nt, spec.out.dim] component-major."""
    assert fin is None, "cmT kernels run the finalize epilogue under XLA"
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
            tcat = jnp.concatenate([tgeo[:], txT[0:ns, :]], axis=0)
            tb = jnp.dot(tcat, tf, preferred_element_type=f32,
                         precision=jax.lax.Precision.HIGHEST)
            tpos, tmask, tcab = tb[0:3], tb[3:4], tb[4:5]
            tsc = tb[5 : 5 + ns]

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

            def agg(m, z):
                n_rows = m["d3"] * m["mul_p"]
                out_ref[0, m["out_row"] : m["out_row"] + n_rows, :] += (
                    jnp.dot(z, msel[:], preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST))

            _dw_paths_t(tmetas, sx_b, w, cb, maskf, agg)

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
):
    """Transposed-layout dual cross conv (pallas_conv.make_cross_conv
    contract): shares pair geometry + edge embedding between directions,
    aggregates al at ligand targets and la at atom sources."""
    assert fin is None, "cmT kernels run the finalize epilogue under XLA"
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
            lcat = jnp.concatenate([lgeo[:], lxT[:]], axis=0)
            lb = jnp.dot(lcat, tf, preferred_element_type=f32,
                         precision=jax.lax.Precision.HIGHEST)
            lpos, lmask = lb[0:3], lb[3:4]
            lx_b = lb[5:]
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

                def agg_al(m, z):
                    n_rows = m["d3"] * m["mul_p"]
                    al_ref[0, m["out_row"] : m["out_row"] + n_rows, :] += (
                        jnp.dot(z, msel[:], preferred_element_type=f32,
                                precision=jax.lax.Precision.HIGHEST))

                _dw_paths_t(tmetas, ax_b, w_al, cb, maskf, agg_al)

                # la: source = ligand, aggregate at atom columns
                e_la = jnp.concatenate([attr, asc, lsc], axis=0)
                h_la = jnp.maximum(
                    jnp.dot(wla1[:], e_la, preferred_element_type=f32)
                    + bla1[:], 0.0)
                w_la = (jnp.dot(wla2[:], h_la, preferred_element_type=f32)
                        + bla2[:])

                def agg_la(m, z):
                    n_rows = m["d3"] * m["mul_p"]
                    s = z[:, 0:T_SRC]
                    for tt in range(1, T_TGT):
                        s = s + z[:, tt * T_SRC : (tt + 1) * T_SRC]
                    la_ref[m["out_row"] : m["out_row"] + n_rows, sl] += s

                _dw_paths_t(tmetas, lx_b, w_la, cb, maskf, agg_la)
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
):
    """Transposed-layout knn conv: neighbors gathered via a one-hot MXU
    matmul from the VMEM-resident transposed node array; aggregation over
    the K axis via per-lane-tile one-hot matmuls (128 % k == 0 keeps each
    target's K sources inside one lane tile)."""
    assert fin is None, "cmT kernels run the finalize epilogue under XLA"
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

            # gather one-hot: G[nsrc, p] = (nsrc == idx_flat[p])
            rows_n = jax.lax.broadcasted_iota(jnp.int32, (n, r), 0)
            G = (rows_n == idxf[0]).astype(f32)
            g_all = jnp.dot(srcM[:], G, preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)
            # target repeat: Tf[nsrc, p] = (nsrc == i*T_KT + p//k)
            pcols = jax.lax.broadcasted_iota(jnp.int32, (n, r), 1)
            tf = (rows_n == i * T_KT + pcols // k).astype(f32)
            t_all = jnp.dot(srcM[0 : 5 + ns, :], tf,
                            preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)

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

            src_b = g_all[5:]  # full feature rows (din_p) for the TP

            def agg(m, z):
                n_rows = m["d3"] * m["mul_p"]
                parts = [
                    jnp.dot(z[:, tt * T_SRC : (tt + 1) * T_SRC], m8[:],
                            preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)
                    for tt in range(n_lt)
                ]
                mk = (jnp.concatenate(parts, axis=1)
                      if n_lt > 1 else parts[0])
                out_ref[0, m["out_row"] : m["out_row"] + n_rows, :] += mk

            _dw_paths_t(tmetas, src_b, w, cb, maskf, agg)

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
    return _vjp_wrap(conv, twin)
