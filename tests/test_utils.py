"""Config system, checkpoints, observability utilities."""
import os

import jax.numpy as jnp
import numpy as np

from diffbindfr_tpu.utils import (
    find_latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from diffbindfr_tpu.utils.config import apply_overrides, deep_merge, load_config
from diffbindfr_tpu.utils.observe import MetricsLogger, Timer, get_logger


def test_config_base_inheritance(tmp_path):
    (tmp_path / "base.py").write_text(
        "lr = 0.001\nmodel = dict(ns=48, nv=12)\nname = 'run-${tag}'\ntag = 'a1'\n"
    )
    (tmp_path / "exp.py").write_text(
        "_base_ = 'base.py'\nmodel = dict(nv=24)\ntag = 'b2'\n"
    )
    cfg = load_config(str(tmp_path / "exp.py"))
    assert cfg["lr"] == 0.001
    assert cfg["model"] == {"ns": 48, "nv": 24}
    assert cfg["name"] == "run-b2"  # interpolation sees the override


def test_config_overrides():
    cfg = {"model": {"ns": 48}, "lr": 1e-3}
    out = apply_overrides(cfg, ["model.ns=96", "lr=0.01", "note=hello"])
    assert out["model"]["ns"] == 96 and out["lr"] == 0.01
    assert out["note"] == "hello"
    assert cfg["model"]["ns"] == 48  # original untouched


def test_checkpoint_roundtrip(tmp_path):
    params = {
        "a": {"w": jnp.ones((3, 2)), "b": jnp.zeros(2)},
        "layers": [{"w": jnp.full((2,), 2.0)}, {"w": jnp.full((2,), 3.0)}],
    }
    ema = {"a": {"w": jnp.ones((3, 2)) * 5, "b": jnp.zeros(2)},
           "layers": [{"w": jnp.zeros(2)}, {"w": jnp.zeros(2)}]}
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, params, ema_params=ema, step=7)
    back, step = load_checkpoint(p)
    assert step == 7
    np.testing.assert_array_equal(back["layers"][1]["w"], [3.0, 3.0])
    ema_back, _ = load_checkpoint(p, use_ema=True)
    np.testing.assert_array_equal(ema_back["a"]["w"], np.full((3, 2), 5.0))
    assert find_latest_checkpoint(str(tmp_path)) == p


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = MetricsLogger(p)
    for i in range(5):
        m.log(i, loss=float(i))
    assert m.average("loss", last=2) == 3.5
    m.close()
    assert len(open(p).readlines()) == 5


def test_timer_and_logger():
    t = Timer()
    x = jnp.ones((8, 8)) * 2
    dt = t.elapsed(x)
    assert dt >= 0
    lg = get_logger("test_x")
    lg.info("hello")


def test_compile_cache_enable(tmp_path, monkeypatch):
    from diffbindfr_tpu.utils import compile_cache

    monkeypatch.setattr(compile_cache, "_enabled", False)
    d = str(tmp_path / "xla")
    import jax

    if jax.default_backend() == "tpu":
        assert compile_cache.enable(d) == d
        assert jax.config.jax_compilation_cache_dir == d
        assert compile_cache.enable(d) == d  # idempotent
    else:
        # cache is TPU-only (XLA:CPU AOT entries are machine-feature pinned)
        assert compile_cache.enable(d) == ""
    monkeypatch.setenv("DIFFBINDFR_CACHE_DIR", "off")
    assert compile_cache.enable() == ""


def test_resolve_checkpoint_policy(tmp_path):
    """Run-dir resolution: ckpt_best.npz wins; else highest-step snapshot,
    including the mdn_ckpt_ naming (EvalHook model-selection analogue)."""
    from diffbindfr_tpu.utils.checkpoint import resolve_checkpoint

    f = tmp_path / "some.npz"
    f.write_bytes(b"x")
    assert resolve_checkpoint(str(f)) == str(f)  # files pass through

    d = tmp_path / "run"
    d.mkdir()
    (d / "ckpt_0000500.npz").write_bytes(b"x")
    (d / "ckpt_0001000.npz").write_bytes(b"x")
    assert resolve_checkpoint(str(d)).endswith("ckpt_0001000.npz")
    (d / "ckpt_best.npz").write_bytes(b"x")
    assert resolve_checkpoint(str(d)).endswith("ckpt_best.npz")

    m = tmp_path / "mdn_run"
    m.mkdir()
    (m / "mdn_ckpt_0000500.npz").write_bytes(b"x")
    (m / "mdn_ckpt_0002000.npz").write_bytes(b"x")
    assert resolve_checkpoint(str(m)).endswith("mdn_ckpt_0002000.npz")


def test_choose_bucket_decoupled_ladders():
    """Ligand and pocket size classes are independent: a small ligand in a
    large pocket keeps its small ligand pad (the joint ladder padded 3dbs's
    35-atom ligand to 128 because its 113-res pocket needed the top pocket
    class — 1.49x dock cost for nothing, ROUND5_NOTES section 4)."""
    from diffbindfr_tpu.data.sample import choose_bucket

    b = choose_bucket(35, 80, 5, 113, 927)  # the 3dbs shape
    assert (b.n_lig, b.n_lig_edges, b.n_tor) == (64, 160, 24)
    assert (b.n_res, b.n_atm) == (128, 1024)

    # big ligand, small pocket: the converse decoupling
    b2 = choose_bucket(120, 280, 40, 40, 300)
    assert (b2.n_lig, b2.n_res, b2.n_atm) == (128, 48, 384)

    # any single ligand dim over its level bumps the whole ligand class
    b3 = choose_bucket(30, 80, 13, 40, 300)  # 13 torsions > level-1's 12
    assert b3.n_lig == 64 and b3.n_tor == 24

    import pytest

    with pytest.raises(ValueError):
        choose_bucket(200, 80, 5, 40, 300)  # ligand too large
    with pytest.raises(ValueError):
        choose_bucket(35, 80, 5, 200, 300)  # pocket too large
