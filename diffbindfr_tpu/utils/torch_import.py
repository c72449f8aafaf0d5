"""Reference-checkpoint import: DiffBindFR ``.pth`` -> diffbindfr_tpu npz.

The reference ships paper weights as an mmcv-style torch checkpoint
(``{'meta': ..., 'state_dict': OrderedDict}``, loaded by
``DiffBindFR/common/engines.py:161`` via mmcv ``load_checkpoint``; default
path ``weights/diffbindfr_paper.pth``, ``common/args.py:90``).  This
module is SURVEY §7 step 4's converter: it reads such a checkpoint with
torch (CPU) and maps parameters onto this package's pytrees, writing the
result in our npz checkpoint format.

Import stance — what converts EXACTLY and what does not:

* **MDN scoring head** (``mdn_layer.*`` of ``scoring/architecture/
  KarmaDock_sc.py``): exact at inference.  The reference's first pair
  layer is ``Linear(2h, h)`` over ``cat(lig, pro)``; ours is the same
  function split across the concat boundary (``pair_l``/``pair_p``), so
  the torch weight is sliced and transposed.  The eval-mode
  ``BatchNorm1d`` that follows is a fixed per-channel affine
  (``y = (x - mean) / sqrt(var + eps) * gamma + beta``); it is folded to
  ``pair_norm = {scale, shift}`` which ``mdn_head`` applies verbatim when
  present (from-scratch checkpoints use the mask-safe LayerNorm instead).
  ``z_pi/z_sigma/z_mu/atom_types/bond_types`` transpose directly, and the
  surrounding activation conventions already match (softmax /
  ``elu()+1.1`` / ``elu()+1``).

* **Encoders and the diffusion score net: NOT imported — from-scratch
  weights are the supported path.**  The GVP/GraphTransformer encoders
  here are independent re-derivations with deliberately different
  featurization (on-device protein features, dense masked attention,
  own RBF placement), so reference encoder weights do not correspond
  parameter-for-parameter to a function this package computes.  The
  SE(3) score net differs more deeply by design: this package uses its
  own real-SH basis, component-major irreps layout, and numerical CG
  solver (``nn/irreps.py``) rather than e3nn's conventions
  (``druglib/models/Docking/interaction/tpscore.py``), a layout chosen
  for TPU lane-density — there is no per-tensor permutation that maps
  e3nn weights onto it without re-deriving every basis change, and no
  reference weights exist in this environment to verify such a map
  against.  Converting them blind would produce silently-wrong models,
  so the converter refuses and says why.

Every conversion returns a report listing exactly which source keys were
mapped, which were skipped, and which target leaves remain at their
initialization — no silent partial imports.
"""
from __future__ import annotations

import argparse
from dataclasses import dataclass, field

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    """Read a torch checkpoint into {key: np.float32 array}.

    Handles the mmcv layout ({'state_dict': ...}, optional 'ema_state_dict')
    and raw state dicts; strips DataParallel 'module.' prefixes
    (reference druglib checkpoint conventions)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict):
        for k in ("ema_state_dict", "state_dict", "model"):
            if k in obj and isinstance(obj[k], dict):
                obj = obj[k]
                break
    out = {}
    for k, v in obj.items():
        if not hasattr(v, "numpy"):
            continue
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v.detach().to(torch.float32).numpy())
    return out


def fold_batchnorm(gamma, beta, mean, var, eps: float = 1e-5):
    """Eval-mode BatchNorm1d == fixed affine: returns (scale, shift) with
    y = x * scale + shift."""
    scale = gamma / np.sqrt(var + eps)
    return scale.astype(np.float32), (beta - mean * scale).astype(np.float32)


@dataclass
class ImportReport:
    mapped: list = field(default_factory=list)  # source keys converted
    skipped: list = field(default_factory=list)  # source keys not mapped
    untouched: list = field(default_factory=list)  # target leaves left at init

    def __str__(self):
        lines = [f"[import] {len(self.mapped)} source keys mapped exactly"]
        if self.skipped:
            lines.append(
                f"[import] {len(self.skipped)} source keys NOT mapped "
                "(no exact counterpart — see utils/torch_import.py stance):")
            for k in self.skipped:
                lines.append(f"  - {k}")
        if self.untouched:
            lines.append(
                f"[import] {len(self.untouched)} target leaves left at "
                "initialization:")
            for k in self.untouched:
                lines.append(f"  - {k}")
        return "\n".join(lines)


def _lin(sd, key):
    """torch Linear -> our {'w': [in, out], 'b': [out]}."""
    p = {"w": sd[f"{key}.weight"].T.copy()}
    if f"{key}.bias" in sd:
        p["b"] = sd[f"{key}.bias"].copy()
    return p


def import_mdn_head(sd: dict, params: dict, prefix: str = "mdn_layer."):
    """Map the reference MDN_Block head onto our MDN pytree (exact at
    inference; see module docstring). Mutates and returns params."""
    report = ImportReport()
    h = params["pair_l"]["w"].shape[0]

    w0 = sd[f"{prefix}MLP.0.weight"]  # [h, 2h]
    if w0.shape != (h, 2 * h):
        raise ValueError(
            f"MLP.0 weight {w0.shape} incompatible with hidden={h}")
    params["pair_l"] = {"w": w0[:, :h].T.copy(),
                        "b": sd[f"{prefix}MLP.0.bias"].copy()}
    params["pair_p"] = {"w": w0[:, h:].T.copy()}
    report.mapped += [f"{prefix}MLP.0.weight", f"{prefix}MLP.0.bias"]

    scale, shift = fold_batchnorm(
        sd[f"{prefix}MLP.1.weight"], sd[f"{prefix}MLP.1.bias"],
        sd[f"{prefix}MLP.1.running_mean"], sd[f"{prefix}MLP.1.running_var"])
    params["pair_norm"] = {"scale": scale, "shift": shift}
    report.mapped += [f"{prefix}MLP.1.{s}" for s in
                      ("weight", "bias", "running_mean", "running_var")]

    for name in ("z_pi", "z_sigma", "z_mu", "atom_types", "bond_types"):
        params[name] = _lin(sd, f"{prefix}{name}")
        report.mapped += [f"{prefix}{name}.weight", f"{prefix}{name}.bias"]

    mapped = set(report.mapped)
    report.skipped = sorted(
        k for k in sd
        if k not in mapped and "num_batches_tracked" not in k)
    report.untouched = sorted(
        k for k in ("seq_emb", "pro_node_in", "pro_edge_in", "gvp_layers",
                    "pro_out", "lig_node_in", "lig_edge_in", "gt_layers")
        if k in params)
    return params, report


def import_checkpoint(path: str, arch: str = "mdn", cfg=None):
    """Load a reference .pth and map it onto a fresh pytree of `arch`.

    arch='mdn': the KarmaDock_sc scorer — MDN head imports exactly,
    encoders stay at initialization (reported).
    arch='score_net': refused with the documented from-scratch stance."""
    if arch == "score_net":
        raise NotImplementedError(
            "The diffusion score net uses this package's own SH basis and "
            "component-major irreps layout (nn/irreps.py) — e3nn reference "
            "weights have no parameter-for-parameter correspondence and "
            "cannot be verified against in this environment. Train from "
            "scratch (app/train_cli.py); see utils/torch_import.py for the "
            "full stance.")
    if arch != "mdn":
        raise ValueError(f"unknown arch {arch!r}")
    import jax

    from ..models import mdn_scorer as mdn

    sd = load_torch_state_dict(path)
    cfg = cfg or mdn.MDNConfig()
    params = mdn.init_params(jax.random.PRNGKey(0), cfg)
    return import_mdn_head(sd, params)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Convert a reference DiffBindFR .pth checkpoint to the "
                    "diffbindfr_tpu npz format (see module docstring for "
                    "what imports exactly).")
    ap.add_argument("pth")
    ap.add_argument("-o", "--out", required=True, help="output .npz")
    ap.add_argument("--arch", choices=["mdn", "score_net"], default="mdn")
    args = ap.parse_args(argv)

    from .checkpoint import save_checkpoint

    params, report = import_checkpoint(args.pth, arch=args.arch)
    print(report)
    save_checkpoint(args.out, params)
    print(f"[import] wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
