"""e3nn score-net import map (utils/e3nn_compat.py + torch_import
import_score_net; VERDICT r3 task 5).

Everything DERIVABLE is machine-checked here: basis orthogonality +
Wigner intertwining, w3j invariance + documented anchors, CG
proportionality, and — the decisive check — conv-level FUNCTION
equality between this package's TP with converted weights and a numpy
evaluator of e3nn TensorProduct semantics. What these tests cannot do
is verify the A1-A4 assumption set against e3nn itself (not installed);
that is the documented 'unverified' in --unverified-scorenet."""
import math
import os

import numpy as np
import pytest

import jax.numpy as jnp

from diffbindfr_tpu.nn import irreps as IR
from diffbindfr_tpu.utils import e3nn_compat as E


def _rand_R(seed):
    q = np.random.default_rng(seed).normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


MODEL_TRIPLES = [(0, 0, 0), (0, 1, 1), (1, 0, 1), (1, 1, 0), (1, 1, 1),
                 (1, 2, 1)]


def test_basis_change_orthogonal_and_intertwining():
    for l in (0, 1, 2):
        B = E.basis_change(l)
        np.testing.assert_allclose(B @ B.T, np.eye(2 * l + 1), atol=1e-9)
        # B D_ours B^T must equal the Wigner matrix computed directly
        # from the e3nn-basis SH functions (round-trip, VERDICT wording)
        R = _rand_R(l + 1)
        D_ours = IR.wigner_d_real(l, R)
        rng = np.random.default_rng(3)
        v = rng.normal(size=(64, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        A = E._sh_e3nn_l(l, v)
        Bv = E._sh_e3nn_l(l, v @ R.T)
        D_e3nn, *_ = np.linalg.lstsq(A, Bv, rcond=None)
        np.testing.assert_allclose(B @ D_ours @ B.T, D_e3nn.T, atol=1e-8)
    # l=1: ours (x,y,z) -> e3nn (y,z,x) is the cyclic permutation
    np.testing.assert_allclose(
        E.basis_change(1), np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0.]]),
        atol=1e-9)


def test_w3j_anchors_and_scales():
    """The two publicly documented e3nn w3j values anchor the A2 sign
    rule; every model triple yields a CG proportionality with |lambda|=1
    (asserted inside path_scale)."""
    W = E.w3j_e3nn(1, 1, 0)
    np.testing.assert_allclose(W[:, :, 0], np.eye(3) / math.sqrt(3),
                               atol=1e-9)
    W = E.w3j_e3nn(1, 1, 1)  # + cross-product orientation
    eps = np.zeros((3, 3, 3))
    for i, j, k in [(0, 1, 2), (1, 2, 0), (2, 0, 1)]:
        eps[i, j, k] = 1.0
        eps[j, i, k] = -1.0
    np.testing.assert_allclose(W, eps / math.sqrt(6), atol=1e-9)
    for tri in MODEL_TRIPLES:
        lam = E.path_scale(*tri)
        assert abs(abs(lam) - 1.0) < 1e-8


def test_trunk_conv_function_equality():
    """Converted weights make our FC-TP compute EXACTLY the e3nn
    function (in the rotated basis): y_e3nn = B_out @ y_ours."""
    rng = np.random.default_rng(0)
    in1_s, sh_s, out_s = ("8x0e+3x1o+3x1e", "1x0e+1x1o+1x2e",
                          "8x0e+3x1o+3x1e+8x0o")
    in1, sh, out = (IR.Irreps.parse(s) for s in (in1_s, sh_s, out_s))
    spec = IR.compile_fc_tensor_product(in1_s, sh_s, out_s)
    fe = E.E3nnFCTP(in1, sh, out)
    assert fe.weight_numel == spec.weight_numel

    n = 16
    x_ours = rng.normal(size=(n, in1.dim))
    v = rng.normal(size=(n, 3))
    w_e = rng.normal(size=(n, fe.weight_numel))
    y_e = fe(x_ours @ E.irreps_basis_matrix(in1).T, E.sh_e3nn(v), w_e)

    scale = E.convert_fctp_weights(in1_s, sh_s, out_s)
    y_o = np.asarray(IR.apply_fc_tensor_product(
        spec, jnp.asarray(x_ours, jnp.float64),
        jnp.asarray(np.asarray(IR.spherical_harmonics_l2(
            jnp.asarray(v, jnp.float64)))),
        jnp.asarray(w_e * scale[None, :], jnp.float64)))
    np.testing.assert_allclose(
        y_o @ E.irreps_basis_matrix(out).T, y_e, atol=1e-5)


def test_tor_conv_function_equality():
    """Same for the torque conv, whose in2 is the FullTensorProduct
    (sorted + l<=3 on the e3nn side, unsorted l<=1 truncation on ours):
    slot permutation, per-slot sign, and path scales must compose to
    exact function equality."""
    rng = np.random.default_rng(1)
    sh = IR.Irreps.parse("1x0e+1x1o+1x2e")
    in1_s, out_s = "8x0e+3x1o+3x1e+8x0o", "8x0o+8x0e"
    tor_tp = IR.compile_full_tensor_product(str(sh), "1x2e", lmax_out=1)
    spec = IR.compile_fc_tensor_product(in1_s, str(tor_tp.out), out_s)
    perm, scale, slot_fix = E.convert_tor_fctp_weights(in1_s, "1x2e", out_s)
    assert set(slot_fix) == {0, 1, 2}

    in1 = IR.Irreps.parse(in1_s)
    out = IR.Irreps.parse(out_s)
    e_slots = E.full_tp_slots_e3nn(sh, IR.Irreps.parse("1x2e"))
    e_in2 = IR.Irreps(tuple(
        (s["mul"], IR.Irrep(s["l"], s["p"])) for s in e_slots))
    fe = E.E3nnFCTP(in1, e_in2, out)

    n = 16
    x_ours = rng.normal(size=(n, in1.dim))
    ve, vb = rng.normal(size=(n, 3)), rng.normal(size=(n, 3))
    w_e = rng.normal(size=(n, fe.weight_numel))

    in2_e, _ = E.e3nn_full_tp(sh, IR.Irreps.parse("1x2e"),
                              E.sh_e3nn(ve), E._sh_e3nn_l(2, vb))
    y_e = fe(x_ours @ E.irreps_basis_matrix(in1).T, in2_e, w_e)

    sh_o = np.asarray(IR.spherical_harmonics_l2(jnp.asarray(ve, jnp.float64)))
    b2_o = IR._sh_np(2, vb / np.linalg.norm(vb, axis=-1, keepdims=True))
    in2_o = np.asarray(IR.apply_full_tensor_product(
        tor_tp, jnp.asarray(sh_o), jnp.asarray(b2_o)))
    y_o = np.asarray(IR.apply_fc_tensor_product(
        spec, jnp.asarray(x_ours, jnp.float64), jnp.asarray(in2_o),
        jnp.asarray(w_e[:, perm] * scale[None, :], jnp.float64)))
    np.testing.assert_allclose(
        y_o @ E.irreps_basis_matrix(out).T, y_e, atol=1e-5)


def test_raw_readout_transformation_law():
    """Documents WHY imported checkpoints carry readout_rot: under the
    A1 (y,z,x) ordering, the reference's raw l=1 slot readout
    (tpscore.py:537 reads final-conv slots directly as xyz) transforms
    under the CONJUGATED representation P R P^T, and P^T-decoding makes
    it cleanly equivariant. readout_rot = B_1 reproduces the reference's
    raw convention bit-for-bit."""
    rng = np.random.default_rng(0)
    sh = IR.Irreps.parse("1x0e+1x1o+1x2e")
    f = E.E3nnFCTP(sh, sh, IR.Irreps.parse("1x1o"))
    w = rng.normal(size=(1, f.weight_numel))
    v1, v2 = rng.normal(size=3), rng.normal(size=3)
    R = _rand_R(7)
    r0 = f(E.sh_e3nn(v1[None]), E.sh_e3nn(v2[None]), w)[0]
    r1 = f(E.sh_e3nn((R @ v1)[None]), E.sh_e3nn((R @ v2)[None]), w)[0]
    P = E.basis_change(1)
    assert np.abs(r1 - P @ R @ P.T @ r0).max() < 1e-10  # conjugated
    assert np.abs(P.T @ r1 - R @ (P.T @ r0)).max() < 1e-10  # decoded
    assert np.abs(r1 - R @ r0).max() > 1e-3  # NOT xyz-equivariant raw


# ---------------------------------------------------------------------------
# full importer
# ---------------------------------------------------------------------------


def _fake_reference_sd(cfg):
    """Random state dict with the reference TensorProductModel's key
    names and shapes (tpscore.py:203-411)."""
    rng = np.random.default_rng(0)
    sd = {}

    def lin(prefix, din, dout, bias=True):
        sd[f"{prefix}.weight"] = rng.normal(
            size=(dout, din)).astype(np.float32) * 0.2
        if bias:
            sd[f"{prefix}.bias"] = rng.normal(
                size=(dout,)).astype(np.float32) * 0.1

    def simple(prefix, din, dout, hidden=None, bias=True):
        hidden = dout if hidden is None else hidden
        lin(f"{prefix}.lin.0", din, hidden, bias)
        lin(f"{prefix}.lin.3", hidden, dout, bias)

    def ln(prefix, irr):
        irr = IR.Irreps.parse(irr)
        ni = sum(m for m, _ in irr.items)
        sd[f"{prefix}.mean_shift"] = np.concatenate([
            (np.ones(m) if (ir.l == 0 and ir.p == 1) else np.zeros(m))
            for m, ir in irr.items]).astype(np.float32)[None, :]
        sd[f"{prefix}.affine_weight"] = np.ones(ni, np.float32)
        sd[f"{prefix}.affine_bias"] = np.zeros(irr.num_scalars, np.float32)

    def conv(prefix, in_s, in2, out_s, nef):
        fe = E.E3nnFCTP(IR.Irreps.parse(in_s), in2, IR.Irreps.parse(out_s))
        simple(f"{prefix}.fc", nef, fe.weight_numel, hidden=nef)
        ln(f"{prefix}.batch_norm", out_s)

    ns, sed, ded = cfg.ns, cfg.sigma_embed_dim, cfg.distance_embed_dim
    sh = IR.Irreps.parse("1x0e+1x1o+1x2e")
    simple("lig_node_embedding", cfg.lig_node_dim + sed, ns)
    simple("lig_edge_embedding", cfg.lig_edge_dim + sed + ded, ns)
    for i, n in enumerate(cfg.atom_cat_dims):
        sd[f"atom_node_embedding.atom_emb_list.{i}.weight"] = rng.normal(
            size=(n, ns)).astype(np.float32) * 0.2
    lin("atom_node_embedding.scalar_lin", ns + sed, ns, bias=False)
    simple("atom_edge_embedding", sed + ded, ns)
    simple("la_edge_embedding", sed + ded, ns)
    for fam in ("lig_conv_layers", "atom_conv_layers",
                "cross_al_conv_layers", "cross_la_conv_layers"):
        for li in range(cfg.num_conv_layers):
            in_s, out_s = cfg.layer_irreps(li)
            conv(f"{fam}.{li}", in_s, sh, out_s, 3 * ns)
    final_in = cfg.layer_irreps(cfg.num_conv_layers - 1)[1]
    simple("center_edge_embedding", sed + ded, ns)
    conv("final_conv", final_in, sh, "2x1o+2x1e", 2 * ns)
    simple("tr_final_layer", 1 + sed, 1, hidden=ns)
    simple("rot_final_layer", 1 + sed, 1, hidden=ns)
    simple("tor_edge_embedding", ded, ns)
    e_slots = E.full_tp_slots_e3nn(sh, IR.Irreps.parse("1x2e"))
    e_in2 = IR.Irreps(tuple(
        (s["mul"], IR.Irrep(s["l"], s["p"])) for s in e_slots))
    conv("tor_bond_conv", final_in, e_in2, f"{ns}x0o+{ns}x0e", 3 * ns)
    simple("tor_final_layer", 2 * ns, 1, hidden=ns, bias=False)
    simple("sc_edge_embedding", ded, ns)
    conv("sc_tor_bond_conv", final_in, e_in2, f"{ns}x0o+{ns}x0e", 3 * ns)
    simple("sc_tor_final_layer", 2 * ns, 1, hidden=ns, bias=False)
    return sd


@pytest.fixture(scope="module")
def small_cfg():
    from diffbindfr_tpu.models.score_net import ScoreNetConfig

    return ScoreNetConfig(ns=8, nv=4, num_conv_layers=3,
                          sigma_embed_dim=8, distance_embed_dim=8,
                          conv_mode="fc", compute_dtype="float32",
                          dropout=0.0)


def test_score_net_import_full_coverage(small_cfg):
    """100% of source keys map (per-key report empty on both sides) and
    the converted pytree drives the real model."""
    from diffbindfr_tpu.utils import torch_import as TI

    sd = _fake_reference_sd(small_cfg)
    params, report = TI.import_score_net(sd, small_cfg)
    assert report.skipped == [], report.skipped
    assert len(report.mapped) == len(
        [k for k in sd if "num_batches_tracked" not in k])
    assert "readout_rot" in params
    np.testing.assert_allclose(params["readout_rot"],
                               E.basis_change(1), atol=1e-7)
    # converted fc weights flowed through (not at init): spot-check one
    w = params["lig_convs"][0]["fc"]["l1"]["w"]
    np.testing.assert_allclose(
        np.asarray(w), sd["lig_conv_layers.0.fc.lin.0.weight"].T,
        atol=1e-7)


def test_score_net_import_runs_model(small_cfg):
    """Converted params produce finite scores on a real featurized
    sample through the fc-mode model, readout_rot applied."""
    import jax

    from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
    from diffbindfr_tpu.chem.mol import perceive
    from diffbindfr_tpu.chem.protein_feats import build_pocket_record
    from diffbindfr_tpu.data import make_sample
    from diffbindfr_tpu.io.pdb import parse_pdb
    from diffbindfr_tpu.io.sdf import parse_sdf
    from diffbindfr_tpu.models import score_net as sn
    from diffbindfr_tpu.utils import torch_import as TI

    FWD = "/root/reference/examples/forward"
    prot = parse_pdb(f"{FWD}/3dbs_protein.pdb")
    lig = featurize_ligand(
        perceive(parse_sdf(f"{FWD}/3dbs_protein_crystal.sdf")[0]), "3dbs")
    pocket = build_pocket_record(prot, lig.pos, cutoff=8.0)
    lig.pos = lig.pos - pocket.center
    s = make_sample(lig, pocket)

    from diffbindfr_tpu.sampler import SamplerConfig

    sd = _fake_reference_sd(small_cfg)
    params, _ = TI.import_score_net(sd, small_cfg)
    t = jnp.asarray(0.5)
    sig = sn.sigmas_from_t(t, SamplerConfig().schedule)
    out = jax.jit(
        lambda p, s_, t_, sg: sn.apply(p, small_cfg, s_, t_, sg)
    )(params, s, t, sig)
    for name, v in out._asdict().items():
        assert np.isfinite(np.asarray(v)).all(), name


def test_score_net_import_refused_without_flag(small_cfg, tmp_path):
    """CLI stance: refuse without --unverified-scorenet, convert with."""
    import torch

    from diffbindfr_tpu.utils import torch_import as TI

    sd = _fake_reference_sd(small_cfg)
    pth = str(tmp_path / "ref.pth")
    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, pth)
    with pytest.raises(NotImplementedError, match="unverified-scorenet"):
        TI.import_checkpoint(pth, arch="score_net", cfg=small_cfg)
    params, report = TI.import_checkpoint(
        pth, arch="score_net", cfg=small_cfg, unverified_scorenet=True)
    assert report.skipped == []
    assert "readout_rot" in params

def test_verify_harness_selftest():
    """The import-verification harness (tools/verify_e3nn_import.py)
    passes its synthetic round-trip against the checked-in fixture —
    the contract that will check real weights the day they arrive."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "tools",
                                      "verify_e3nn_import.py"),
         "--selftest"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "PASS" in out.stdout


def test_verify_harness_checkpoint_path(small_cfg, tmp_path):
    """The REAL-weights path of the harness (positional .pth -> convert ->
    head activations -> npz) runs end-to-end on a synthetic reference
    checkpoint. Regression: import_checkpoint returns (params, report);
    the harness once passed the tuple straight into the model and crashed
    on exactly the path it exists for."""
    import subprocess
    import sys

    import torch

    sd = _fake_reference_sd(small_cfg)
    pth = str(tmp_path / "ref.pth")
    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, pth)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    acts = str(tmp_path / "acts.npz")
    out = subprocess.run(
        [sys.executable, os.path.join(root, "tools",
                                      "verify_e3nn_import.py"),
         pth, "--cfg", "small", "-o", acts],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stdout + out.stderr
    data = dict(np.load(acts))
    assert data, "no activations written"
    assert all(np.isfinite(v).all() for v in data.values())
    # self-comparison through the --expected path must PASS
    out2 = subprocess.run(
        [sys.executable, os.path.join(root, "tools",
                                      "verify_e3nn_import.py"),
         pth, "--cfg", "small", "--expected", acts],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out2.returncode == 0, out2.stdout + out2.stderr
