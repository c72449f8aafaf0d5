"""Whole-layer fused pallas kernel vs its jnp twin (interpret mode).

The twin is built from the battle-tested XLA primitives
(apply_dw_tensor_product, apply_linear_cm, irreps_layer_norm_apply_cm);
the kernel is an independent Mosaic implementation — agreement validates
both. Full independence from the XLA score-net path is covered by
test_pallas_integration (fused path vs use_pallas=False apply).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbindfr_tpu.nn import layers as L
from diffbindfr_tpu.nn import pallas_conv as pc
from diffbindfr_tpu.nn import pallas_layer as PL

NS, NV = 8, 4
IN = f"{NS}x0e+{NV}x1o"
OUT = f"{NS}x0e+{NV}x1o+{NV}x1e"
SH = "1x0e+1x1o+1x2e"
SED, GSN = 16, 16
LIG_CUT, CROSS_CUT, ATOM_CUT = 6.0, 9.0, 4.5
K = 8


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(7)
    cs = L.make_conv_spec(IN, SH, OUT, "sep")
    din = cs.dw.in1.dim
    nl, na = 20, 200
    lig_pos = jnp.asarray(rng.normal(size=(nl, 3)) * 3, jnp.float32)
    atm_pos = jnp.asarray(rng.normal(size=(na, 3)) * 7, jnp.float32)
    lig_x = jnp.asarray(rng.normal(size=(nl, din)), jnp.float32)
    atm_x = jnp.asarray(rng.normal(size=(na, din)), jnp.float32)
    lig_mask = jnp.asarray((rng.random(nl) > 0.1).astype(np.float32))
    atm_mask = jnp.asarray((rng.random(na) > 0.1).astype(np.float32))
    cab = jnp.asarray((rng.random(na) > 0.85).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(SED,)), jnp.float32)

    edim = 6
    bond_mask = np.zeros((nl, nl), np.float32)
    bond_feat = np.zeros((nl, nl, edim), np.float32)
    for _ in range(nl - 1):
        a, b = rng.integers(0, nl, 2)
        if a != b:
            bond_mask[a, b] = bond_mask[b, a] = 1.0
            f = rng.normal(size=edim).astype(np.float32)
            bond_feat[a, b] = bond_feat[b, a] = f
    bond_mask = jnp.asarray(bond_mask)
    bond_feat = jnp.asarray(bond_feat)

    idx, valid = L.knn_edges(atm_pos, atm_pos, atm_mask, atm_mask, K,
                             ATOM_CUT, exclude_self=True)

    # counts from the same masks the kernel rebuilds (score_net contract)
    d_ll = jnp.linalg.norm(
        lig_pos[None] - lig_pos[:, None] + 1e-12, axis=-1)
    eye = jnp.eye(nl, dtype=bool)
    m_ll = (((d_ll <= LIG_CUT) & ~eye) | (bond_mask > 0))
    m_ll = m_ll & (lig_mask[:, None] > 0) & (lig_mask[None, :] > 0)
    d_c = jnp.linalg.norm(atm_pos[None] - lig_pos[:, None] + 1e-12, axis=-1)
    m_c = ((cab[None, :] > 0) | (d_c <= CROSS_CUT))
    m_c = m_c & (lig_mask[:, None] > 0) & (atm_mask[None, :] > 0)
    cnt_lig = m_ll.sum(1).astype(jnp.float32)
    cnt_al = m_c.sum(1).astype(jnp.float32)
    cnt_la = m_c.sum(0).astype(jnp.float32)
    cnt_atm = valid.astype(jnp.float32).sum(1)

    ks = iter(jax.random.split(jax.random.PRNGKey(3), 32))
    params = {
        "emb_lig": L.mlp_init(next(ks), edim + SED + GSN, NS),
        "emb_cross": L.mlp_init(next(ks), SED + GSN, NS),
        "emb_atom": L.mlp_init(next(ks), SED + GSN, NS),
    }
    for t in ("lig", "al", "la", "atom"):
        tp = L.tp_conv_init(next(ks), cs, 3 * NS)
        params[f"fc_{t}"] = tp["fc"]
        params[f"mix_{t}"] = tp["mix"]
        ln = tp["ln"]
        # non-trivial LN params so the test is sensitive to them
        ln = {
            "weight": ln["weight"] * (1.0 + 0.1 * jax.random.normal(
                next(ks), ln["weight"].shape)),
            "mean_shift": ln["mean_shift"],
            "bias": ln["bias"] + 0.05 * jax.random.normal(
                next(ks), ln["bias"].shape),
        }
        params[f"ln_{t}"] = ln

    conv = PL.make_layer_conv(
        cs, din=din, ns=NS, sed=SED, lig_gs_stop=LIG_CUT,
        cross_gs_stop=CROSS_CUT, atom_gs_stop=ATOM_CUT, gs_n=GSN,
        lig_edge_dim=edim, k=K, interpret=True,
    )
    args = (lig_pos, atm_pos,
            pc.cm_from_irreps(cs.dw.in1, lig_x),
            pc.cm_from_irreps(cs.dw.in1, atm_x),
            lig_mask, atm_mask, cab, temb, jnp.asarray(CROSS_CUT),
            bond_feat, bond_mask, idx, valid,
            cnt_lig, cnt_al, cnt_la, cnt_atm, params)
    return cs, conv, args


def test_layer_kernel_matches_twin(system):
    cs, conv, args = system
    lig_o, atm_o = conv(*args)
    lig_t, atm_t = conv.twin(*args)
    assert lig_o.shape == lig_t.shape
    assert atm_o.shape == atm_t.shape
    np.testing.assert_allclose(np.asarray(lig_o), np.asarray(lig_t),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(atm_o), np.asarray(atm_t),
                               rtol=2e-4, atol=2e-4)


def test_layer_kernel_grads_match_twin(system):
    cs, conv, args = system
    rng = np.random.default_rng(9)
    lig_o, atm_o = conv(*args)
    ct_l = jnp.asarray(rng.normal(size=lig_o.shape), jnp.float32)
    ct_a = jnp.asarray(rng.normal(size=atm_o.shape), jnp.float32)

    def loss(fn, lig_cm, atm_cm, params):
        a = list(args)
        a[2], a[3], a[17] = lig_cm, atm_cm, params
        lo, ao = fn(*a)
        return jnp.sum(lo * ct_l) + jnp.sum(ao * ct_a)

    g_k = jax.grad(lambda *x: loss(conv, *x), argnums=(0, 1, 2))(
        args[2], args[3], args[17])
    g_t = jax.grad(lambda *x: loss(conv.twin, *x), argnums=(0, 1, 2))(
        args[2], args[3], args[17])
    for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
