"""Transposed-layout (cmT) pallas kernels vs XLA references + gradchecks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbindfr_tpu.nn import layers as L
from diffbindfr_tpu.nn import pallas_conv as pc
from diffbindfr_tpu.nn import pallas_conv_t as pt

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
    return (cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s,
            params, temb)


def test_cmt_roundtrip(system):
    cs = system[0]
    rng = np.random.default_rng(3)
    for ir in (cs.dw.in1, cs.dw.out):
        x = jnp.asarray(rng.normal(size=(5, ir.dim)), jnp.float32)
        xT = pt.cm_to_cmt(ir, x)
        assert xT.shape[0] % 8 == 0
        back = pt.cmt_to_cm(ir, xT)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # batched leading axis
    x = jnp.asarray(rng.normal(size=(2, 5, cs.dw.out.dim)), jnp.float32)
    back = pt.cmt_to_cm(cs.dw.out, pt.cm_to_cmt(cs.dw.out, x))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("flip", [False, True])
def test_pair_conv_t_matches_twin(system, flip):
    (cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s,
     params, temb) = system
    cutoff = jnp.float32(6.5)
    kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN,
              flip_vec=flip, cab_on_src=True)
    conv = pt.make_pair_conv_t(cs.dw, interpret=True, **kw)
    twin = pc.make_pair_twin(cs.dw, **kw)
    tcm = pc.cm_from_irreps(cs.dw.in1, tgt_x)
    scm = pc.cm_from_irreps(cs.dw.in1, src_x)
    zt = jnp.zeros_like(tgt_mask)
    got = conv(tgt_pos, src_pos, tcm, scm, tgt_mask, src_mask,
               zt, cab_s, temb, cutoff, params)
    bf = jnp.zeros((tgt_x.shape[0], src_x.shape[0], 1), jnp.float32)
    bm = jnp.zeros((tgt_x.shape[0], src_x.shape[0]), jnp.float32)
    want = twin(tgt_pos, src_pos, tcm, scm, tgt_mask, src_mask,
                zt, cab_s, temb, cutoff, params, bf, bm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pair_conv_t_bond_self_exclusion(system):
    """ll-conv mode: bond features + self exclusion + bond connectivity."""
    (cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s,
     params, temb) = system
    rng = np.random.default_rng(7)
    nt = tgt_x.shape[0]
    eb = 6
    # square ligand-like graph on the targets
    bond_feat = jnp.asarray(rng.normal(size=(nt, nt, eb)), jnp.float32)
    bond_mask = jnp.asarray(
        (rng.random((nt, nt)) > 0.8).astype(np.float32))
    ein = eb + SED + GSN
    k = jax.random.PRNGKey(5)
    p = dict(params)
    p["emb_w1"] = jax.random.normal(k, (ein, NS)) * 0.2
    kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN,
              edge_extra=eb, exclude_self=True, cab_on_src=True)
    conv = pt.make_pair_conv_t(cs.dw, interpret=True, **kw)
    twin = pc.make_pair_twin(cs.dw, **kw)
    tcm = pc.cm_from_irreps(cs.dw.in1, tgt_x)
    zt = jnp.zeros_like(tgt_mask)
    cutoff = jnp.float32(4.5)
    got = conv(tgt_pos, tgt_pos, tcm, tcm, tgt_mask, tgt_mask,
               zt, zt, temb, cutoff, p, bond_feat, bond_mask)
    want = twin(tgt_pos, tgt_pos, tcm, tcm, tgt_mask, tgt_mask,
                zt, zt, temb, cutoff, p, bond_feat, bond_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_cross_conv_t_matches_twin(system):
    (cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s,
     params, temb) = system
    cutoff = jnp.float32(6.5)
    emb = {"l1": {"w": params["emb_w1"], "b": params["emb_b1"]},
           "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
    fc_al = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
             "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}
    fc_la = jax.tree.map(lambda x: x * 0.7 + 0.01, fc_al)
    kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN)
    conv = pt.make_cross_conv_t(cs.dw, interpret=True, **kw)
    twin = pc.make_cross_twin(cs.dw, **kw)
    tcm = pc.cm_from_irreps(cs.dw.in1, tgt_x)
    scm = pc.cm_from_irreps(cs.dw.in1, src_x)
    al, la = conv(tgt_pos, src_pos, tcm, scm, tgt_mask, src_mask,
                  cab_s, temb, cutoff, emb, fc_al, fc_la)
    wal, wla = twin(tgt_pos, src_pos, tcm, scm, tgt_mask, src_mask,
                    cab_s, temb, cutoff, emb, fc_al, fc_la)
    np.testing.assert_allclose(np.asarray(al), np.asarray(wal),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(la), np.asarray(wla),
                               rtol=2e-4, atol=2e-4)


def test_knn_conv_t_matches_twin(system):
    (cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s,
     params, temb) = system
    pos, x, mask = src_pos, src_x, src_mask
    K = 8
    idx, valid = L.knn_edges(pos, pos, mask, mask, K, 4.5,
                             exclude_self=True)
    emb = {"l1": {"w": params["emb_w1"], "b": params["emb_b1"]},
           "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
    fc = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
          "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}
    kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=4.5, gs_n=GSN, k=K)
    conv = pt.make_knn_conv_t(cs.dw, interpret=True, **kw)
    twin = pc.make_knn_twin(cs.dw, **kw)
    xcm = pc.cm_from_irreps(cs.dw.in1, x)
    got = conv(pos, xcm, mask, idx, valid, temb, {"emb": emb, "fc": fc})
    want = twin(pos, xcm, mask, idx, valid, temb, {"emb": emb, "fc": fc})
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_pair_conv_t_grads_match_twin(system):
    (cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s,
     params, temb) = system
    cutoff = jnp.float32(6.5)
    kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN,
              cab_on_src=True)
    conv = pt.make_pair_conv_t(cs.dw, interpret=True, **kw)
    twin = pc.make_pair_twin(cs.dw, **kw)
    tcm = pc.cm_from_irreps(cs.dw.in1, tgt_x)
    scm = pc.cm_from_irreps(cs.dw.in1, src_x)
    zt = jnp.zeros_like(tgt_mask)
    ct = jnp.asarray(
        np.random.default_rng(11).normal(
            size=(tgt_x.shape[0], cs.dw.out.dim)), jnp.float32)
    bf = jnp.zeros((tgt_x.shape[0], src_x.shape[0], 1), jnp.float32)
    bm = jnp.zeros((tgt_x.shape[0], src_x.shape[0]), jnp.float32)

    def loss_k(tx, sx, p):
        out = conv(tgt_pos, src_pos, tx, sx, tgt_mask, src_mask,
                   zt, cab_s, temb, cutoff, p)
        return jnp.sum(out * ct)

    def loss_t(tx, sx, p):
        out = twin(tgt_pos, src_pos, tx, sx, tgt_mask, src_mask,
                   zt, cab_s, temb, cutoff, p, bf, bm)
        return jnp.sum(out * ct)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(tcm, scm, params)
    gt = jax.grad(loss_t, argnums=(0, 1, 2))(tcm, scm, params)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_cross_conv_t_grads_match_twin(system):
    (cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s,
     params, temb) = system
    cutoff = jnp.float32(6.5)
    emb = {"l1": {"w": params["emb_w1"], "b": params["emb_b1"]},
           "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
    fc_al = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
             "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}
    fc_la = jax.tree.map(lambda x: x * 0.7 + 0.01, fc_al)
    kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN)
    conv = pt.make_cross_conv_t(cs.dw, interpret=True, **kw)
    twin = pc.make_cross_twin(cs.dw, **kw)
    tcm = pc.cm_from_irreps(cs.dw.in1, tgt_x)
    scm = pc.cm_from_irreps(cs.dw.in1, src_x)
    rng = np.random.default_rng(13)
    c_al = jnp.asarray(rng.normal(size=(tgt_x.shape[0], cs.dw.out.dim)),
                       jnp.float32)
    c_la = jnp.asarray(rng.normal(size=(src_x.shape[0], cs.dw.out.dim)),
                       jnp.float32)

    def mk(fn):
        def loss(tx, sx, al_p, la_p):
            al, la = fn(tgt_pos, src_pos, tx, sx, tgt_mask, src_mask,
                        cab_s, temb, cutoff, emb, al_p, la_p)
            return jnp.sum(al * c_al) + jnp.sum(la * c_la)
        return loss

    gk = jax.grad(mk(conv), argnums=(0, 1, 2, 3))(tcm, scm, fc_al, fc_la)
    gt = jax.grad(mk(twin), argnums=(0, 1, 2, 3))(tcm, scm, fc_al, fc_la)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_pair_conv_t_pallas_bwd_matches_twin(system):
    """Hand-written backward kernel: feature + parameter grads match the
    twin's (positions/temb get zero cotangents by design)."""
    (cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s,
     params, temb) = system
    cutoff = jnp.float32(6.5)
    kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN,
              cab_on_src=True)
    conv = pt.make_pair_conv_t(cs.dw, interpret=True, bwd="pallas", **kw)
    twin = pc.make_pair_twin(cs.dw, **kw)
    tcm = pc.cm_from_irreps(cs.dw.in1, tgt_x)
    scm = pc.cm_from_irreps(cs.dw.in1, src_x)
    zt = jnp.zeros_like(tgt_mask)
    ct = jnp.asarray(
        np.random.default_rng(11).normal(
            size=(tgt_x.shape[0], cs.dw.out.dim)), jnp.float32)
    bf = jnp.zeros((tgt_x.shape[0], src_x.shape[0], 1), jnp.float32)
    bm = jnp.zeros((tgt_x.shape[0], src_x.shape[0]), jnp.float32)

    def loss_k(tx, sx, p):
        out = conv(tgt_pos, src_pos, tx, sx, tgt_mask, src_mask,
                   zt, cab_s, temb, cutoff, p)
        return jnp.sum(out * ct)

    def loss_t(tx, sx, p):
        out = twin(tgt_pos, src_pos, tx, sx, tgt_mask, src_mask,
                   zt, cab_s, temb, cutoff, p, bf, bm)
        return jnp.sum(out * ct)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(tcm, scm, params)
    gt = jax.grad(loss_t, argnums=(0, 1, 2))(tcm, scm, params)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_pair_conv_t_pallas_bwd_bond_mode(system):
    """Backward kernel with bond features + self-exclusion (ll-conv mode),
    including emb_w1 bond-row grads."""
    (cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s,
     params, temb) = system
    rng = np.random.default_rng(17)
    nt = tgt_x.shape[0]
    eb = 6
    bond_feat = jnp.asarray(rng.normal(size=(nt, nt, eb)), jnp.float32)
    bond_mask = jnp.asarray((rng.random((nt, nt)) > 0.8).astype(np.float32))
    ein = eb + SED + GSN
    k = jax.random.PRNGKey(5)
    p = dict(params)
    p["emb_w1"] = jax.random.normal(k, (ein, NS)) * 0.2
    kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN,
              edge_extra=eb, exclude_self=True, cab_on_src=True)
    conv = pt.make_pair_conv_t(cs.dw, interpret=True, bwd="pallas", **kw)
    twin = pc.make_pair_twin(cs.dw, **kw)
    tcm = pc.cm_from_irreps(cs.dw.in1, tgt_x)
    zt = jnp.zeros_like(tgt_mask)
    cutoff = jnp.float32(4.5)
    ct = jnp.asarray(
        np.random.default_rng(19).normal(size=(nt, cs.dw.out.dim)),
        jnp.float32)

    def loss_k(tx, p_):
        out = conv(tgt_pos, tgt_pos, tx, tx, tgt_mask, tgt_mask,
                   zt, zt, temb, cutoff, p_, bond_feat, bond_mask)
        return jnp.sum(out * ct)

    def loss_t(tx, p_):
        out = twin(tgt_pos, tgt_pos, tx, tx, tgt_mask, tgt_mask,
                   zt, zt, temb, cutoff, p_, bond_feat, bond_mask)
        return jnp.sum(out * ct)

    gk = jax.grad(loss_k, argnums=(0, 1))(tcm, p)
    gt = jax.grad(loss_t, argnums=(0, 1))(tcm, p)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_cross_conv_t_pallas_bwd_matches_twin(system):
    (cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s,
     params, temb) = system
    cutoff = jnp.float32(6.5)
    emb = {"l1": {"w": params["emb_w1"], "b": params["emb_b1"]},
           "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
    fc_al = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
             "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}
    fc_la = jax.tree.map(lambda x: x * 0.7 + 0.01, fc_al)
    kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN)
    conv = pt.make_cross_conv_t(cs.dw, interpret=True, bwd="pallas", **kw)
    twin = pc.make_cross_twin(cs.dw, **kw)
    tcm = pc.cm_from_irreps(cs.dw.in1, tgt_x)
    scm = pc.cm_from_irreps(cs.dw.in1, src_x)
    rng = np.random.default_rng(13)
    c_al = jnp.asarray(rng.normal(size=(tgt_x.shape[0], cs.dw.out.dim)),
                       jnp.float32)
    c_la = jnp.asarray(rng.normal(size=(src_x.shape[0], cs.dw.out.dim)),
                       jnp.float32)

    def mk(fn):
        def loss(tx, sx, ep, al_p, la_p):
            al, la = fn(tgt_pos, src_pos, tx, sx, tgt_mask, src_mask,
                        cab_s, temb, cutoff, ep, al_p, la_p)
            return jnp.sum(al * c_al) + jnp.sum(la * c_la)
        return loss

    gk = jax.grad(mk(conv), argnums=(0, 1, 2, 3, 4))(
        tcm, scm, emb, fc_al, fc_la)
    gt = jax.grad(mk(twin), argnums=(0, 1, 2, 3, 4))(
        tcm, scm, emb, fc_al, fc_la)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_knn_conv_t_pallas_bwd_matches_twin(system):
    (cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s,
     params, temb) = system
    pos, x, mask = src_pos, src_x, src_mask
    K = 8
    idx, valid = L.knn_edges(pos, pos, mask, mask, K, 4.5,
                             exclude_self=True)
    emb = {"l1": {"w": params["emb_w1"], "b": params["emb_b1"]},
           "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
    fc = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
          "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}
    kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=4.5, gs_n=GSN, k=K)
    conv = pt.make_knn_conv_t(cs.dw, interpret=True, bwd="pallas", **kw)
    twin = pc.make_knn_twin(cs.dw, **kw)
    xcm = pc.cm_from_irreps(cs.dw.in1, x)
    ct = jnp.asarray(
        np.random.default_rng(23).normal(size=(x.shape[0], cs.dw.out.dim)),
        jnp.float32)

    def mk(fn):
        def loss(xc, p_):
            out = fn(pos, xc, mask, idx, valid, temb,
                     {"emb": p_["emb"], "fc": p_["fc"]})
            return jnp.sum(out * ct)
        return loss

    pp = {"emb": emb, "fc": fc}
    gk = jax.grad(mk(conv), argnums=(0, 1))(xcm, pp)
    gt = jax.grad(mk(twin), argnums=(0, 1))(xcm, pp)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


# ---- packed-bf16 depthwise chain (dw_dtype='bfloat16') -------------------
# The chain's products are bf16-rounded (~4e-3 relative per element); sums
# and everything else stay f32, so a message summed over S unit-scale
# sources carries ~4e-3 * sqrt(S) absolute noise (S = 256 here -> ~0.06
# per unit of product scale, with a fat tail). Tolerances are bf16-level,
# not f32-level, by construction.

BF_TOL = dict(rtol=5e-2, atol=0.15)


def test_pair_conv_t_bf16_chain_matches_twin(system):
    (cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s,
     params, temb) = system
    cutoff = jnp.float32(6.5)
    kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN,
              cab_on_src=True)
    conv = pt.make_pair_conv_t(cs.dw, interpret=True,
                               dw_dtype="bfloat16", **kw)
    twin = pc.make_pair_twin(cs.dw, **kw)
    tcm = pc.cm_from_irreps(cs.dw.in1, tgt_x)
    scm = pc.cm_from_irreps(cs.dw.in1, src_x)
    zt = jnp.zeros_like(tgt_mask)
    got = conv(tgt_pos, src_pos, tcm, scm, tgt_mask, src_mask,
               zt, cab_s, temb, cutoff, params)
    bf = jnp.zeros((tgt_x.shape[0], src_x.shape[0], 1), jnp.float32)
    bm = jnp.zeros((tgt_x.shape[0], src_x.shape[0]), jnp.float32)
    want = twin(tgt_pos, src_pos, tcm, scm, tgt_mask, src_mask,
                zt, cab_s, temb, cutoff, params, bf, bm)
    assert got.dtype == jnp.float32  # narrow dtype never leaks out
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **BF_TOL)
    # masked/padded rows must still be EXACTLY zero (mask applies before
    # the cast; 0 is exact in bf16)
    dead = np.asarray(tgt_mask) == 0
    assert np.all(np.asarray(got)[dead] == 0)


def test_cross_conv_t_bf16_chain_matches_twin(system):
    (cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s,
     params, temb) = system
    cutoff = jnp.float32(6.5)
    emb = {"l1": {"w": params["emb_w1"], "b": params["emb_b1"]},
           "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
    fc_al = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
             "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}
    fc_la = jax.tree.map(lambda x: x * 0.7 + 0.01, fc_al)
    kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN)
    conv = pt.make_cross_conv_t(cs.dw, interpret=True,
                                dw_dtype="bfloat16", **kw)
    twin = pc.make_cross_twin(cs.dw, **kw)
    tcm = pc.cm_from_irreps(cs.dw.in1, tgt_x)
    scm = pc.cm_from_irreps(cs.dw.in1, src_x)
    al, la = conv(tgt_pos, src_pos, tcm, scm, tgt_mask, src_mask,
                  cab_s, temb, cutoff, emb, fc_al, fc_la)
    wal, wla = twin(tgt_pos, src_pos, tcm, scm, tgt_mask, src_mask,
                    cab_s, temb, cutoff, emb, fc_al, fc_la)
    np.testing.assert_allclose(np.asarray(al), np.asarray(wal), **BF_TOL)
    np.testing.assert_allclose(np.asarray(la), np.asarray(wla), **BF_TOL)


def test_knn_conv_t_bf16_chain_matches_twin(system):
    (cs, tgt_pos, src_pos, tgt_x, src_x, tgt_mask, src_mask, cab_s,
     params, temb) = system
    pos, x, mask = src_pos, src_x, src_mask
    K = 8
    idx, valid = L.knn_edges(pos, pos, mask, mask, K, 4.5,
                             exclude_self=True)
    emb = {"l1": {"w": params["emb_w1"], "b": params["emb_b1"]},
           "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
    fc = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
          "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}
    kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=4.5, gs_n=GSN, k=K)
    conv = pt.make_knn_conv_t(cs.dw, interpret=True,
                              dw_dtype="bfloat16", **kw)
    twin = pc.make_knn_twin(cs.dw, **kw)
    xcm = pc.cm_from_irreps(cs.dw.in1, x)
    got = conv(pos, xcm, mask, idx, valid, temb, {"emb": emb, "fc": fc})
    want = twin(pos, xcm, mask, idx, valid, temb, {"emb": emb, "fc": fc})
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **BF_TOL)
