"""Reference-checkpoint import (utils/torch_import.py).

Ground truth is computed with torch itself: a synthetic state_dict with
the reference MDN_Block key layout (scoring/architecture/MDN_Block.py —
Linear(2h,h) + BatchNorm1d(eval) + ELU + five heads) is built from real
torch modules, its eval-mode forward is run on a dense pair matrix, and
the converted params must reproduce pi/sigma/mu through our mdn_head
exactly (the import claims inference-exactness, so the test tolerance is
float32 round-off, not "close")."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

H = 32
NG = 10
NL, R = 5, 7


def _synthetic_reference_block(seed=0):
    torch.manual_seed(seed)
    mods = {
        "MLP.0": torch.nn.Linear(2 * H, H),
        "MLP.1": torch.nn.BatchNorm1d(H),
        "z_pi": torch.nn.Linear(H, NG),
        "z_sigma": torch.nn.Linear(H, NG),
        "z_mu": torch.nn.Linear(H, NG),
        "atom_types": torch.nn.Linear(H, 18),
        "bond_types": torch.nn.Linear(2 * H, 5),
    }
    bn = mods["MLP.1"]
    bn.eval()
    with torch.no_grad():
        bn.running_mean.normal_(0.0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_(1.0, 0.2)
        bn.bias.normal_(0.0, 0.3)
    sd = {}
    for name, m in mods.items():
        for pk, v in m.state_dict().items():
            sd[f"mdn_layer.{name}.{pk}"] = v.clone()
    return mods, sd


def _torch_pair_forward(mods, lig_s, pro_s):
    with torch.no_grad():
        C = torch.cat(
            [lig_s[:, None, :].expand(NL, R, H),
             pro_s[None, :, :].expand(NL, R, H)], dim=-1).reshape(-1, 2 * H)
        h = torch.nn.functional.elu(mods["MLP.1"](mods["MLP.0"](C)))
        pi = torch.softmax(mods["z_pi"](h), dim=-1)
        sigma = torch.nn.functional.elu(mods["z_sigma"](h)) + 1.1
        mu = torch.nn.functional.elu(mods["z_mu"](h)) + 1.0
    shape = (NL, R, NG)
    return (pi.reshape(shape).numpy(), sigma.reshape(shape).numpy(),
            mu.reshape(shape).numpy())


def test_mdn_head_import_exact():
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from diffbindfr_tpu.models import mdn_scorer as mdn
    from diffbindfr_tpu.utils.torch_import import import_mdn_head

    mods, sd_t = _synthetic_reference_block()
    sd = {k: v.numpy().astype(np.float32) for k, v in sd_t.items()}

    cfg = mdn.MDNConfig(hidden=H)
    params = mdn.init_params(jax.random.PRNGKey(0), cfg)
    params, report = import_mdn_head(sd, params)
    assert "pair_norm" in params
    assert len(report.mapped) == 16
    assert not report.skipped  # synthetic dict holds only the head

    rng = np.random.RandomState(1)
    lig_s = rng.randn(NL, H).astype(np.float32)
    pro_s = rng.randn(R, H).astype(np.float32)
    want_pi, want_sigma, want_mu = _torch_pair_forward(
        mods, torch.from_numpy(lig_s), torch.from_numpy(pro_s))

    s = SimpleNamespace(
        atom14_mask=jnp.ones((R, 14)),
        lig_mask=jnp.ones(NL), res_mask=jnp.ones(R),
        lig_e_src=jnp.zeros(1, jnp.int32), lig_e_dst=jnp.zeros(1, jnp.int32))
    out = mdn.mdn_head(
        params, cfg, jnp.asarray(lig_s), jnp.asarray(pro_s),
        jnp.zeros((NL, 3)), jnp.zeros((R, 14, 3)), s)
    np.testing.assert_allclose(np.asarray(out.pi), want_pi, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.sigma), want_sigma, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.mu), want_mu, atol=2e-5)


def test_import_checkpoint_roundtrip(tmp_path):
    """mmcv-style .pth -> import_checkpoint -> npz save/load round-trip."""
    import jax

    from diffbindfr_tpu.utils import torch_import as ti
    from diffbindfr_tpu.utils.checkpoint import (load_checkpoint,
                                                 save_checkpoint)
    from diffbindfr_tpu.models import mdn_scorer as mdn

    _, sd = _synthetic_reference_block(seed=2)
    # module.-prefixed, mmcv-wrapped, with an extra encoder key to skip
    wrapped = {"meta": {"epoch": 1},
               "state_dict": {f"module.{k}": v for k, v in sd.items()}}
    wrapped["state_dict"]["module.lig_encoder.some.weight"] = torch.zeros(3)
    pth = tmp_path / "ref.pth"
    torch.save(wrapped, pth)

    params, report = ti.import_checkpoint(
        str(pth), arch="mdn", cfg=mdn.MDNConfig(hidden=H))
    assert report.skipped == ["lig_encoder.some.weight"]
    assert "gt_layers" in report.untouched

    out = tmp_path / "out.npz"
    save_checkpoint(str(out), params)
    loaded, _ = load_checkpoint(str(out))
    np.testing.assert_array_equal(
        loaded["pair_norm"]["scale"], params["pair_norm"]["scale"])

    with pytest.raises(NotImplementedError):
        ti.import_checkpoint(str(pth), arch="score_net")
