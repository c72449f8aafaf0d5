"""Retrofit checkpoint-selection for pre-policy training runs.

train_cli now writes ckpt_best.npz at every new validation-EMA-loss low
(the EvalHook model-selection analogue, druglib/core/runner/hooks/
evaluation.py); runs trained before that policy landed only have
ckpt_{step}.npz snapshots.  This tool scans the run's train_log.jsonl for
`val_ema_loss` entries, keeps the LAST occurrence per step (after a
crash/resume the files on disk are the later run's writes), picks the
minimum among steps whose checkpoint file exists, and copies it to
ckpt_best.npz so eval_cli's resolve_checkpoint() finds it.

Usage: python tools/select_best_ckpt.py <run_dir> [--key val_ema_loss]
"""
import argparse
import json
import os
import shutil
import sys


AUTO_KEYS = ("val_best_lrmsd_mean", "val_ema_loss", "val_mdn_nll")


def select(run_dir: str, key: str = "auto"):
    log = os.path.join(run_dir, "train_log.jsonl")
    rows = [json.loads(line) for line in open(log)]
    if key == "auto":
        # same preference order as train_cli's in-training policy: the
        # sampling eval when present, else the DSM / MDN val loss
        key = next((k for k in AUTO_KEYS if any(k in r for r in rows)),
                   "val_ema_loss")
        print(f"[key] auto -> {key}")
    vals = {}  # step -> latest metric value
    for r in rows:
        if key in r and r.get("step") is not None:
            vals[int(r["step"])] = float(r[key])
    cands = []
    for step, v in sorted(vals.items()):
        # match either diffusion (ckpt_) or mdn (mdn_ckpt_) naming
        for pat in (f"ckpt_{step:07d}.npz", f"mdn_ckpt_{step:07d}.npz"):
            p = os.path.join(run_dir, pat)
            if os.path.exists(p):
                cands.append((v, step, p))
    if not cands:
        raise SystemExit(f"no {key} entries with saved checkpoints in {log}")
    cands.sort()
    print(f"{'step':>8}  {key}")
    for v, step, _ in sorted(cands, key=lambda c: c[1]):
        mark = "  <-- best" if (v, step) == (cands[0][0], cands[0][1]) else ""
        print(f"{step:>8}  {v:.4f}{mark}")
    best_v, best_step, best_path = cands[0]
    dst = os.path.join(run_dir, "ckpt_best.npz")
    shutil.copyfile(best_path, dst)
    print(f"[best] step {best_step} ({key}={best_v:.4f}) -> {dst}")
    return dst


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--key", default="auto")
    a = ap.parse_args()
    select(a.run_dir, a.key)
