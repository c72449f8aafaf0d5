"""Fused pallas pair-conv vs the XLA reference lowering (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbindfr_tpu.nn import layers as L
from diffbindfr_tpu.nn import pallas_conv as pc
from diffbindfr_tpu.nn.irreps import apply_dw_tensor_product

NS, NV = 8, 4
LADDER = f"{NS}x0e+{NV}x1o+{NV}x1e+{NS}x0o"
SH = "1x0e+1x1o+1x2e"
SED, GSN = 16, 16


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(0)
    cs = L.make_conv_spec(LADDER, SH, LADDER, "sep")
    nt, nsrc = 16, 256
    din = cs.dw.in1.dim
    tgt_pos = jnp.asarray(rng.normal(size=(nt, 3)) * 3, jnp.float32)
    src_pos = jnp.asarray(rng.normal(size=(nsrc, 3)) * 6, jnp.float32)
    tgt_x = jnp.asarray(rng.normal(size=(nt, din)), jnp.float32)
    src_x = jnp.asarray(rng.normal(size=(nsrc, din)), jnp.float32)
    tgt_mask = jnp.asarray((rng.random(nt) > 0.1).astype(np.float32))
    src_mask = jnp.asarray((rng.random(nsrc) > 0.1).astype(np.float32))
    cab_s = jnp.asarray((rng.random(nsrc) > 0.8).astype(np.float32))

    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 8)
    ein = SED + GSN
    wn = cs.dw.weight_numel
    params = {
        "emb_w1": jax.random.normal(ks[0], (ein, NS)) * 0.2,
        "emb_b1": jax.random.normal(ks[1], (NS,)) * 0.1,
        "emb_w2": jax.random.normal(ks[2], (NS, NS)) * 0.2,
        "emb_b2": jax.random.normal(ks[3], (NS,)) * 0.1,
        "fc_w1": jax.random.normal(ks[4], (3 * NS, 3 * NS)) * 0.2,
        "fc_b1": jax.random.normal(ks[5], (3 * NS,)) * 0.1,
        "fc_w2": jax.random.normal(ks[6], (3 * NS, wn)) * 0.2,
        "fc_b2": jax.random.normal(ks[7], (wn,)) * 0.1,
    }
    temb = jnp.asarray(rng.normal(size=(SED,)), jnp.float32)
    return cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s, params, temb


def _reference(cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask,
               cab_s, params, temb, cutoff, flip_vec, exclude_self=False):
    nt, nsrc = tgt_x.shape[0], src_x.shape[0]
    vec = src_pos[None, :, :] - tgt_pos[:, None, :]
    if flip_vec:
        vec = -vec
    d = jnp.linalg.norm(vec + 1e-12, axis=-1)
    mask = ((cab_s[None, :] > 0) | (d <= cutoff))
    mask = mask & (tgt_mask[:, None] > 0) & (src_mask[None, :] > 0)
    if exclude_self:
        mask = mask & ~jnp.eye(nt, nsrc, dtype=bool)
    gs = L.gaussian_smearing(d, 0.0, 32.0, GSN)
    tem = jnp.broadcast_to(temb, (nt, nsrc, SED))
    emb = {"l1": {"w": params["emb_w1"], "b": params["emb_b1"]},
           "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
    fc = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
          "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}
    attr = L.mlp_apply(emb, jnp.concatenate([tem, gs], -1))
    e = jnp.concatenate(
        [attr,
         jnp.broadcast_to(tgt_x[:, None, :NS], (nt, nsrc, NS)),
         jnp.broadcast_to(src_x[None, :, :NS], (nt, nsrc, NS))], -1)
    w = L.mlp_apply(fc, e)
    sh = L.sh_l2(vec)
    src_b = jnp.broadcast_to(src_x[None, :, :], (nt, nsrc, src_x.shape[-1]))
    m = apply_dw_tensor_product(cs.dw, src_b, sh, w)
    return jnp.sum(m * mask[..., None], axis=1)


@pytest.mark.parametrize("flip", [False, True])
def test_pallas_matches_reference(system, flip):
    cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s, params, temb = system
    cutoff = 6.5
    conv = pc.make_pair_conv(
        cs.dw, din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN,
        flip_vec=flip, cab_on_src=True, interpret=True,
    )
    got_cm = conv(
        tgt_pos, src_pos,
        pc.cm_from_irreps(cs.dw.in1, tgt_x), pc.cm_from_irreps(cs.dw.in1, src_x),
        tgt_mask, src_mask,
        jnp.zeros_like(tgt_mask), cab_s, temb, cutoff, params,
    )
    got = pc.cm_to_irreps(cs.dw.out, got_cm)
    want = _reference(cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask,
                      src_mask, cab_s, params, temb, cutoff, flip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_cm_roundtrip(system):
    cs = system[0]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(5, cs.dw.out.dim)), jnp.float32)
    back = pc.cm_to_irreps(cs.dw.out, pc.cm_from_irreps(cs.dw.out, x))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_cross_conv_dual_matches_reference(system):
    cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s, params, temb = system
    cutoff = 6.5
    emb = {"l1": {"w": params["emb_w1"], "b": params["emb_b1"]},
           "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
    fc_al = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
             "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}
    # distinct la weights
    fc_la = jax.tree.map(lambda x: x * 0.7 + 0.01, fc_al)

    conv = pc.make_cross_conv(
        cs.dw, din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN,
        interpret=True,
    )
    al_cm, la_cm = conv(
        tgt_pos, src_pos,
        pc.cm_from_irreps(cs.dw.in1, tgt_x), pc.cm_from_irreps(cs.dw.in1, src_x),
        tgt_mask, src_mask, cab_s, temb, cutoff, emb, fc_al, fc_la,
    )
    al = pc.cm_to_irreps(cs.dw.out, al_cm)
    la = pc.cm_to_irreps(cs.dw.out, la_cm)

    want_al = _reference(cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask,
                         src_mask, cab_s, params, temb, cutoff, False)
    np.testing.assert_allclose(np.asarray(al), np.asarray(want_al),
                               rtol=2e-4, atol=2e-4)
    # la reference: same pair block; messages from tgt side, aggregated at src
    nt, nsrc = tgt_x.shape[0], src_x.shape[0]
    vec = src_pos[None, :, :] - tgt_pos[:, None, :]
    d = jnp.linalg.norm(vec + 1e-12, axis=-1)
    mask = ((cab_s[None, :] > 0) | (d <= cutoff))
    mask = mask & (tgt_mask[:, None] > 0) & (src_mask[None, :] > 0)
    gs = L.gaussian_smearing(d, 0.0, 32.0, GSN)
    tem = jnp.broadcast_to(temb, (nt, nsrc, SED))
    attr = L.mlp_apply(emb, jnp.concatenate([tem, gs], -1))
    e = jnp.concatenate(
        [attr,
         jnp.broadcast_to(src_x[None, :, :NS], (nt, nsrc, NS)),
         jnp.broadcast_to(tgt_x[:, None, :NS], (nt, nsrc, NS))], -1)
    w = L.mlp_apply(fc_la, e)
    sh = L.sh_l2(vec)
    tgt_b = jnp.broadcast_to(tgt_x[:, None, :], (nt, nsrc, tgt_x.shape[-1]))
    m = apply_dw_tensor_product(cs.dw, tgt_b, sh, w)
    want_la = jnp.sum(m * mask[..., None], axis=0)
    np.testing.assert_allclose(np.asarray(la), np.asarray(want_la),
                               rtol=2e-4, atol=2e-4)


def test_knn_conv_matches_reference(system):
    cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s, params, temb = system
    # self-graph on the sources (like the atom conv)
    pos, x, mask = src_pos, src_x, src_mask
    K = 8
    idx, valid = L.knn_edges(pos, pos, mask, mask, K, 4.5, exclude_self=True)
    emb = {"l1": {"w": params["emb_w1"], "b": params["emb_b1"]},
           "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
    fc = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
          "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}
    conv = pc.make_knn_conv(cs.dw, din=cs.dw.in1.dim, ns=NS, sed=SED,
                            gs_stop=4.5, gs_n=GSN, k=K, interpret=True)
    got = pc.cm_to_irreps(
        cs.dw.out,
        conv(pos, pc.cm_from_irreps(cs.dw.in1, x), mask, idx, valid, temb,
             {"emb": emb, "fc": fc}),
    )
    # XLA reference: gather-form messages, masked SUM over K
    vec = pos[idx] - pos[:, None, :]
    d = jnp.linalg.norm(vec + 1e-12, axis=-1)
    attr = L.mlp_apply(emb, jnp.concatenate(
        [jnp.broadcast_to(temb, idx.shape + (SED,)),
         L.gaussian_smearing(d, 0.0, 4.5, GSN)], -1))
    e = jnp.concatenate(
        [attr, jnp.broadcast_to(x[:, None, :NS], idx.shape + (NS,)),
         x[idx][..., :NS]], -1)
    w = L.mlp_apply(fc, e)
    m = apply_dw_tensor_product(cs.dw, x[idx], L.sh_l2(vec), w)
    want = jnp.sum(m * valid.astype(jnp.float32)[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_cm_finalize_matches_irreps_layout(system):
    cs = system[0]
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(6, cs.dw.out.dim)), jnp.float32)
    key = jax.random.PRNGKey(4)
    p = L.tp_conv_init(key, cs, 3 * NS)
    want = L.tp_conv_finalize(p, cs, x)
    got_cm = L.tp_conv_finalize_cm(p, cs, pc.cm_from_irreps(cs.dw.out, x))
    got = pc.cm_to_irreps(cs.out, got_cm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# custom-VJP gradchecks: grads of the fused kernels (pallas fwd, twin bwd)
# must match grads of the independently-written XLA reference above
# ---------------------------------------------------------------------------


def test_pair_conv_grads_match_reference(system):
    cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s, params, temb = system
    cutoff = 6.5
    conv = pc.make_pair_conv(
        cs.dw, din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN,
        flip_vec=False, cab_on_src=True, interpret=True,
    )
    ct = jnp.asarray(
        np.random.default_rng(11).normal(size=(tgt_x.shape[0], cs.dw.out.dim)),
        jnp.float32,
    )

    def loss_pallas(tx, sx, p):
        out_cm = conv(tgt_pos, src_pos,
                      pc.cm_from_irreps(cs.dw.in1, tx),
                      pc.cm_from_irreps(cs.dw.in1, sx),
                      tgt_mask, src_mask, jnp.zeros_like(tgt_mask), cab_s,
                      temb, cutoff, p)
        return jnp.sum(pc.cm_to_irreps(cs.dw.out, out_cm) * ct)

    def loss_ref(tx, sx, p):
        out = _reference(cs, tgt_pos, src_pos, tx, sx, tgt_mask, src_mask,
                         cab_s, p, temb, cutoff, False)
        return jnp.sum(out * ct)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(tgt_x, src_x, params)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(tgt_x, src_x, params)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_cross_conv_grads_match_reference(system):
    cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s, params, temb = system
    cutoff = 6.5
    emb = {"l1": {"w": params["emb_w1"], "b": params["emb_b1"]},
           "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
    fc_al = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
             "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}
    fc_la = jax.tree.map(lambda x: x * 0.7 + 0.01, fc_al)
    conv = pc.make_cross_conv(
        cs.dw, din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN,
        interpret=True,
    )
    rng = np.random.default_rng(12)
    ct_al = jnp.asarray(rng.normal(size=(tgt_x.shape[0], cs.dw.out.dim)),
                        jnp.float32)
    ct_la = jnp.asarray(rng.normal(size=(src_x.shape[0], cs.dw.out.dim)),
                        jnp.float32)

    def loss_pallas(tx, sx, f_al, f_la):
        al_cm, la_cm = conv(tgt_pos, src_pos,
                            pc.cm_from_irreps(cs.dw.in1, tx),
                            pc.cm_from_irreps(cs.dw.in1, sx),
                            tgt_mask, src_mask, cab_s, temb, cutoff,
                            emb, f_al, f_la)
        return (jnp.sum(pc.cm_to_irreps(cs.dw.out, al_cm) * ct_al)
                + jnp.sum(pc.cm_to_irreps(cs.dw.out, la_cm) * ct_la))

    def loss_ref(tx, sx, f_al, f_la):
        nt, nsrc = tx.shape[0], sx.shape[0]
        p_al = {"emb_w1": emb["l1"]["w"], "emb_b1": emb["l1"]["b"],
                "emb_w2": emb["l2"]["w"], "emb_b2": emb["l2"]["b"],
                "fc_w1": f_al["l1"]["w"], "fc_b1": f_al["l1"]["b"],
                "fc_w2": f_al["l2"]["w"], "fc_b2": f_al["l2"]["b"]}
        al = _reference(cs, tgt_pos, src_pos, tx, sx, tgt_mask, src_mask,
                        cab_s, p_al, temb, cutoff, False)
        vec = src_pos[None, :, :] - tgt_pos[:, None, :]
        d = jnp.linalg.norm(vec + 1e-12, axis=-1)
        mask = ((cab_s[None, :] > 0) | (d <= cutoff))
        mask = mask & (tgt_mask[:, None] > 0) & (src_mask[None, :] > 0)
        gs = L.gaussian_smearing(d, 0.0, 32.0, GSN)
        tem = jnp.broadcast_to(temb, (nt, nsrc, SED))
        attr = L.mlp_apply(emb, jnp.concatenate([tem, gs], -1))
        e = jnp.concatenate(
            [attr,
             jnp.broadcast_to(sx[None, :, :NS], (nt, nsrc, NS)),
             jnp.broadcast_to(tx[:, None, :NS], (nt, nsrc, NS))], -1)
        w = L.mlp_apply(f_la, e)
        sh = L.sh_l2(vec)
        tgt_b = jnp.broadcast_to(tx[:, None, :], (nt, nsrc, tx.shape[-1]))
        m = apply_dw_tensor_product(cs.dw, tgt_b, sh, w)
        la = jnp.sum(m * mask[..., None], axis=0)
        return jnp.sum(al * ct_al) + jnp.sum(la * ct_la)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(tgt_x, src_x, fc_al, fc_la)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(tgt_x, src_x, fc_al, fc_la)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_knn_conv_grads_match_reference(system):
    cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s, params, temb = system
    pos, x, mask = src_pos, src_x, src_mask
    K = 8
    idx, valid = L.knn_edges(pos, pos, mask, mask, K, 4.5, exclude_self=True)
    emb = {"l1": {"w": params["emb_w1"], "b": params["emb_b1"]},
           "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
    fc = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
          "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}
    conv = pc.make_knn_conv(cs.dw, din=cs.dw.in1.dim, ns=NS, sed=SED,
                            gs_stop=4.5, gs_n=GSN, k=K, interpret=True)
    ct = jnp.asarray(
        np.random.default_rng(13).normal(size=(x.shape[0], cs.dw.out.dim)),
        jnp.float32,
    )

    def loss_pallas(xx, f):
        out_cm = conv(pos, pc.cm_from_irreps(cs.dw.in1, xx), mask, idx,
                      valid, temb, {"emb": emb, "fc": f})
        return jnp.sum(pc.cm_to_irreps(cs.dw.out, out_cm) * ct)

    def loss_ref(xx, f):
        vec = pos[idx] - pos[:, None, :]
        d = jnp.linalg.norm(vec + 1e-12, axis=-1)
        attr = L.mlp_apply(emb, jnp.concatenate(
            [jnp.broadcast_to(temb, idx.shape + (SED,)),
             L.gaussian_smearing(d, 0.0, 4.5, GSN)], -1))
        e = jnp.concatenate(
            [attr, jnp.broadcast_to(xx[:, None, :NS], idx.shape + (NS,)),
             xx[idx][..., :NS]], -1)
        w = L.mlp_apply(f, e)
        m = apply_dw_tensor_product(cs.dw, xx[idx], L.sh_l2(vec), w)
        out = jnp.sum(m * valid.astype(jnp.float32)[..., None], axis=1)
        return jnp.sum(out * ct)

    g_p = jax.grad(loss_pallas, argnums=(0, 1))(x, fc)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(x, fc)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
