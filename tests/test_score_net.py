"""Score network: shapes, masking invariance, and SE(3) equivariance.

Equivariance contract (the core correctness property of the score net,
reference tpscore.py:202-758): under a global rotation R of all input
coordinates, tr and rot score vectors rotate by R while torsion and
side-chain scores are invariant. Under translation everything is invariant
(the network only consumes relative vectors).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbindfr_tpu.data.sample import DockingSample
from diffbindfr_tpu.models import score_net as sn
from diffbindfr_tpu.nn.irreps import wigner_d_real


def random_sample(rng, nl=12, el=24, nt=4, r=6, na=40, ncab=12):
    """Synthetic padded sample exercising every mask path."""
    nl_real, na_real, r_real, nt_real, el_real = nl - 3, na - 6, r - 2, nt - 1, el - 4

    lig_pos = np.zeros((nl, 3), np.float32)
    lig_pos[:nl_real] = rng.normal(size=(nl_real, 3)) * 2.0
    lig_mask = np.zeros(nl, np.float32)
    lig_mask[:nl_real] = 1

    # chain covalent bonds, both directions
    src = np.arange(nl_real - 1)
    e_src = np.zeros(el, np.int32)
    e_dst = np.zeros(el, np.int32)
    n_cov = 2 * (nl_real - 1)
    assert n_cov <= el_real
    e_src[: nl_real - 1], e_dst[: nl_real - 1] = src, src + 1
    e_src[nl_real - 1 : n_cov], e_dst[nl_real - 1 : n_cov] = src + 1, src
    e_mask = np.zeros(el, np.float32)
    e_mask[:n_cov] = 1

    tor_src = np.zeros(nt, np.int32)
    tor_dst = np.zeros(nt, np.int32)
    tor_mask = np.zeros(nt, np.float32)
    tor_src[:nt_real] = np.arange(nt_real) + 1
    tor_dst[:nt_real] = np.arange(nt_real) + 2
    tor_mask[:nt_real] = 1
    rot_node_mask = np.zeros((nt, nl), np.float32)
    for k in range(nt_real):
        rot_node_mask[k, k + 2 : nl_real] = 1

    atm_pos = np.zeros((na, 3), np.float32)
    atm_pos[:na_real] = rng.normal(size=(na_real, 3)) * 4.0 + 1.0
    atm_mask = np.zeros(na, np.float32)
    atm_mask[:na_real] = 1
    atm_feat = np.zeros((na, 5), np.int64)
    atm_feat[:na_real] = np.stack(
        [
            rng.integers(0, 37, na_real),
            rng.integers(0, 22, na_real),
            rng.integers(0, 4, na_real),
            rng.integers(0, 21, na_real),
            rng.integers(0, 2, na_real),
        ],
        axis=-1,
    )
    cab_idx = np.zeros(ncab, np.int32)
    cab_mask = np.zeros(ncab, np.float32)
    ncab_real = min(ncab - 2, na_real // 3)
    cab_idx[:ncab_real] = rng.choice(na_real, ncab_real, replace=False)
    cab_mask[:ncab_real] = 1
    noncab_mask = atm_mask.copy()
    noncab_mask[cab_idx[:ncab_real]] = 0

    sc_src = np.zeros((r, 4), np.int32)
    sc_dst = np.zeros((r, 4), np.int32)
    chi_mask = np.zeros((r, 4), np.float32)
    for i in range(r_real):
        nchi = rng.integers(1, 5)
        sc_src[i, :nchi] = rng.integers(0, na_real, nchi)
        sc_dst[i, :nchi] = rng.integers(0, na_real, nchi)
        chi_mask[i, :nchi] = 1

    z3 = np.zeros((r, 3), np.float32)
    return DockingSample(
        lig_feat=rng.normal(size=(nl, 27)).astype(np.float32) * lig_mask[:, None],
        lig_pos=lig_pos,
        lig_ref_pos=lig_pos.copy(),
        lig_mask=lig_mask,
        lig_e_src=e_src,
        lig_e_dst=e_dst,
        lig_e_feat=rng.normal(size=(el, 10)).astype(np.float32) * e_mask[:, None],
        lig_e_mask=e_mask,
        tor_src=tor_src,
        tor_dst=tor_dst,
        tor_mask=tor_mask,
        rot_node_mask=rot_node_mask,
        atm_pos=atm_pos,
        atm_mask=atm_mask,
        atm_feat=atm_feat,
        cab_idx=cab_idx,
        cab_mask=cab_mask,
        noncab_mask=noncab_mask,
        sc_src=sc_src,
        sc_dst=sc_dst,
        chi_mask=chi_mask,
        aatype=np.zeros(r, np.int32),
        res_mask=np.zeros(r, np.float32),
        backbone_rots=np.tile(np.eye(3, dtype=np.float32), (r, 1, 1)),
        backbone_transl=z3,
        default_frame=np.tile(np.eye(4, dtype=np.float32), (r, 8, 1, 1)),
        template_pos=np.zeros((r, 14, 3), np.float32),
        group_idx=np.zeros((r, 14), np.int32),
        atom14_mask=np.zeros((r, 14), np.float32),
        torsion_angle=np.zeros((r, 5), np.float32),
        pack_flat=np.zeros(na, np.int32),
        pocket_center=np.zeros(3, np.float32),
    )


CFG = sn.ScoreNetConfig(ns=8, nv=4, num_conv_layers=3, dropout=0.0)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    s = random_sample(rng)
    params = sn.init_params(jax.random.PRNGKey(0), CFG)
    t = jnp.asarray(0.5)
    sigmas = sn.Sigmas(
        tr=jnp.asarray(1.2), rot=jnp.asarray(0.5),
        tor=jnp.asarray(1.0), sc_tor=jnp.asarray(1.0),
    )
    return s, params, t, sigmas


def _rotate_sample(s: DockingSample, R: np.ndarray, shift=0.0) -> DockingSample:
    rot = lambda x: (x @ R.T + shift).astype(np.float32)
    return s._replace(
        lig_pos=rot(s.lig_pos),
        lig_ref_pos=rot(s.lig_ref_pos),
        atm_pos=rot(s.atm_pos),
    )


def test_shapes_and_finiteness(setup):
    s, params, t, sigmas = setup
    out = sn.apply(params, CFG, jax.tree.map(jnp.asarray, s), t, sigmas)
    assert out.tr.shape == (3,)
    assert out.rot.shape == (3,)
    assert out.tor.shape == (s.tor_mask.shape[0],)
    assert out.sc_tor.shape == s.chi_mask.shape
    for leaf in out:
        assert bool(jnp.all(jnp.isfinite(leaf)))
    # padded entries exactly zero
    np.testing.assert_allclose(np.asarray(out.tor) * (1 - s.tor_mask), 0.0)
    np.testing.assert_allclose(np.asarray(out.sc_tor) * (1 - s.chi_mask), 0.0)


def test_se3_equivariance_fc_mode():
    """The reference-exact per-edge uvw conv mode stays equivariant too."""
    rng = np.random.default_rng(11)
    s = random_sample(rng)
    cfg = sn.ScoreNetConfig(ns=4, nv=2, num_conv_layers=2, dropout=0.0,
                            conv_mode="fc")
    params = sn.init_params(jax.random.PRNGKey(1), cfg)
    t = jnp.asarray(0.4)
    sigmas = sn.Sigmas(*(jnp.asarray(v) for v in (1.0, 0.4, 1.0, 1.0)))
    q = rng.normal(size=4); q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    out0 = sn.apply(params, cfg, jax.tree.map(jnp.asarray, s), t, sigmas)
    outR = sn.apply(params, cfg,
                    jax.tree.map(jnp.asarray, _rotate_sample(s, R, 1.0)), t, sigmas)
    np.testing.assert_allclose(np.asarray(outR.tr), R @ np.asarray(out0.tr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(outR.rot), R @ np.asarray(out0.rot), atol=2e-4)
    np.testing.assert_allclose(np.asarray(outR.tor), np.asarray(out0.tor), atol=2e-4)


def test_se3_equivariance(setup):
    s, params, t, sigmas = setup
    rng = np.random.default_rng(3)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    assert np.allclose(wigner_d_real(1, R), R)

    out0 = sn.apply(params, CFG, jax.tree.map(jnp.asarray, s), t, sigmas)
    outR = sn.apply(
        params, CFG, jax.tree.map(jnp.asarray, _rotate_sample(s, R, shift=3.0)),
        t, sigmas,
    )
    np.testing.assert_allclose(np.asarray(outR.tr), R @ np.asarray(out0.tr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(outR.rot), R @ np.asarray(out0.rot), atol=2e-4)
    np.testing.assert_allclose(np.asarray(outR.tor), np.asarray(out0.tor), atol=2e-4)
    np.testing.assert_allclose(np.asarray(outR.sc_tor), np.asarray(out0.sc_tor), atol=2e-4)


def test_padding_invariance(setup):
    """Growing the padding must not change the outputs on real entries."""
    s, params, t, sigmas = setup
    rng = np.random.default_rng(7)
    big = random_sample(rng, nl=16, el=32, nt=6, r=8, na=56, ncab=16)
    # re-generate with the same rng stream is not identical; instead pad s
    out0 = sn.apply(params, CFG, jax.tree.map(jnp.asarray, s), t, sigmas)

    def grow(a, target_shape):
        pad = [(0, tgt - cur) for cur, tgt in zip(a.shape, target_shape)]
        return np.pad(a, pad)

    nl, el, nt, r, na, ncab = 20, 40, 8, 10, 64, 20
    s2 = DockingSample(
        lig_feat=grow(s.lig_feat, (nl, 27)),
        lig_pos=grow(s.lig_pos, (nl, 3)),
        lig_ref_pos=grow(s.lig_ref_pos, (nl, 3)),
        lig_mask=grow(s.lig_mask, (nl,)),
        lig_e_src=grow(s.lig_e_src, (el,)),
        lig_e_dst=grow(s.lig_e_dst, (el,)),
        lig_e_feat=grow(s.lig_e_feat, (el, 10)),
        lig_e_mask=grow(s.lig_e_mask, (el,)),
        tor_src=grow(s.tor_src, (nt,)),
        tor_dst=grow(s.tor_dst, (nt,)),
        tor_mask=grow(s.tor_mask, (nt,)),
        rot_node_mask=grow(s.rot_node_mask, (nt, nl)),
        atm_pos=grow(s.atm_pos, (na, 3)),
        atm_mask=grow(s.atm_mask, (na,)),
        atm_feat=grow(s.atm_feat, (na, 5)),
        cab_idx=grow(s.cab_idx, (ncab,)),
        cab_mask=grow(s.cab_mask, (ncab,)),
        noncab_mask=grow(s.noncab_mask, (na,)),
        sc_src=grow(s.sc_src, (r, 4)),
        sc_dst=grow(s.sc_dst, (r, 4)),
        chi_mask=grow(s.chi_mask, (r, 4)),
        aatype=grow(s.aatype, (r,)),
        res_mask=grow(s.res_mask, (r,)),
        backbone_rots=grow(s.backbone_rots, (r, 3, 3)),
        backbone_transl=grow(s.backbone_transl, (r, 3)),
        default_frame=grow(s.default_frame, (r, 8, 4, 4)),
        template_pos=grow(s.template_pos, (r, 14, 3)),
        group_idx=grow(s.group_idx, (r, 14)),
        atom14_mask=grow(s.atom14_mask, (r, 14)),
        torsion_angle=grow(s.torsion_angle, (r, 5)),
        pack_flat=grow(s.pack_flat, (na,)),
        pocket_center=s.pocket_center,
    )
    out2 = sn.apply(params, CFG, jax.tree.map(jnp.asarray, s2), t, sigmas)
    np.testing.assert_allclose(np.asarray(out2.tr), np.asarray(out0.tr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out2.rot), np.asarray(out0.rot), atol=1e-4)
    nt0 = s.tor_mask.shape[0]
    np.testing.assert_allclose(
        np.asarray(out2.tor)[:nt0], np.asarray(out0.tor), atol=1e-4
    )
    r0 = s.chi_mask.shape[0]
    np.testing.assert_allclose(
        np.asarray(out2.sc_tor)[:r0], np.asarray(out0.sc_tor), atol=1e-4
    )


def test_batched_apply(setup):
    s, params, t, sigmas = setup
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *( [jax.tree.map(jnp.asarray, s)] * 3 ))
    tb = jnp.array([0.5, 0.5, 0.5])
    sg = sn.Sigmas(*[jnp.full((3,), v) for v in (1.2, 0.5, 1.0, 1.0)])
    out = sn.apply_batched(params, CFG, batch, tb, sg)
    assert out.tr.shape == (3, 3)
    single = sn.apply(params, CFG, jax.tree.map(jnp.asarray, s), t, sigmas)
    np.testing.assert_allclose(np.asarray(out.tr[1]), np.asarray(single.tr), atol=1e-5)
