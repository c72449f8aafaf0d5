"""Checkpoint save/load for param pytrees.

Replaces the reference's torch checkpoint layer (druglib/core/runner/
checkpoint.py:403-652: URI schemes, regex key revision, EMA prefix
stripping) with a flat-key npz format: every leaf is stored under its
pytree path, so checkpoints are portable numpy files independent of any
framework version. EMA weights live under their own prefix; `use_ema=True`
loads them in place of the raw params (mirroring the reference's
`use_ema` strip of the `ema_` prefix).
"""
from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        # '#' prefix marks list indices explicitly so _unflatten never has to
        # guess list-ness from digit-shaped dict keys (which would corrupt the
        # pytree structure of dicts that happen to use digit-string keys)
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}/"))
    elif tree is None:
        pass
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.startswith("#") and k[1:].isdigit() for k in keys):
                idx = sorted(int(k[1:]) for k in keys)
                if idx == list(range(len(idx))):
                    return [fix(node[f"#{i}"]) for i in idx]
            elif keys and all(k.isdigit() for k in keys):
                # legacy round-1 checkpoints encoded list indices as bare
                # digits; only convert when they form a contiguous 0..n-1
                # range, otherwise keep the dict untouched
                idx = sorted(int(k) for k in keys)
                if idx == list(range(len(idx))):
                    return [fix(node[str(i)]) for i in idx]
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(root)


def save_checkpoint(path: str, params, ema_params=None, step: int | None = None,
                    extra: dict | None = None) -> None:
    flat = {f"params/{k}": v for k, v in _flatten(params).items()}
    if ema_params is not None:
        flat.update({f"ema/{k}": v for k, v in _flatten(ema_params).items()})
    if step is not None:
        flat["meta/step"] = np.asarray(step)
    for k, v in (extra or {}).items():
        flat[f"extra/{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + f".{os.getpid()}.tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_checkpoint(path: str, use_ema: bool = False):
    """Returns (params_pytree, step or None)."""
    data = np.load(path, allow_pickle=False)
    prefix = "ema/" if use_ema and any(k.startswith("ema/") for k in data.files) \
        else "params/"
    flat = {k[len(prefix):]: data[k] for k in data.files if k.startswith(prefix)}
    if not flat:
        raise ValueError(f"no parameters under prefix {prefix!r} in {path}")
    step = int(data["meta/step"]) if "meta/step" in data.files else None
    params = jax.tree.map(lambda x: x, _unflatten(flat))
    return params, step


def find_latest_checkpoint(dirpath: str, pattern: str = ".npz"):
    """Newest checkpoint file in a directory (reference checkpoint.py:618)."""
    if not os.path.isdir(dirpath):
        return None
    cands = [
        os.path.join(dirpath, f)
        for f in os.listdir(dirpath)
        if f.endswith(pattern)
    ]
    return max(cands, key=os.path.getmtime) if cands else None


def save_train_state(path: str, state) -> None:
    """Persist a full training state (params + EMA + optimizer) by pytree
    leaves — the runner.resume equivalent (reference base_runner resume
    with optimizer state)."""
    import jax

    leaves = jax.tree_util.tree_leaves(state)
    flat = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + f".{os.getpid()}.tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_train_state(path: str, template):
    """Restore into the structure of `template` (same configs/optimizer)."""
    import jax

    data = np.load(path)
    treedef = jax.tree_util.tree_structure(template)
    t_leaves = jax.tree_util.tree_leaves(template)
    leaves = []
    for i, tl in enumerate(t_leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != np.shape(tl):
            raise ValueError(
                f"leaf {i} shape mismatch: ckpt {arr.shape} vs {np.shape(tl)}"
            )
        leaves.append(arr.astype(np.asarray(tl).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def resolve_checkpoint(path: str) -> str:
    """Checkpoint-selection policy: a file path is used as-is; a training
    run DIRECTORY resolves to its validation-best checkpoint
    (ckpt_best.npz, written by train_cli's val loop — the EvalHook
    model-selection analogue, druglib/core/runner/hooks/evaluation.py)
    when present, else the highest-step ckpt_*.npz / mdn_ckpt_*.npz."""
    if not os.path.isdir(path):
        return path
    best = os.path.join(path, "ckpt_best.npz")
    if os.path.exists(best):
        print(f"[model] checkpoint policy: best-val ({best})")
        return best
    import glob as _glob

    cands = sorted(
        _glob.glob(os.path.join(path, "ckpt_*.npz"))
        or _glob.glob(os.path.join(path, "*ckpt_*.npz"))
    )
    if not cands:
        raise FileNotFoundError(f"no ckpt_*.npz under {path}")
    print(f"[model] checkpoint policy: no ckpt_best.npz in {path}; "
          f"falling back to latest ({cands[-1]})")
    return cands[-1]
