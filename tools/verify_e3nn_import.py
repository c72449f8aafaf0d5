"""Verification harness for the e3nn score-net import (VERDICT r4 task 7).

The e3nn conversion (utils/e3nn_compat.py + utils/torch_import.import_score_net)
rests on the A1-A4 assumption set about e3nn's conventions, which cannot be
checked in an environment without e3nn or real reference weights. This
harness turns the "unverified" flag into a checkable contract the day either
becomes available (reference load path: druglib/core/runner/checkpoint.py:403):

  1. SELF-CONSISTENCY (runs green today, no deps):
         python tools/verify_e3nn_import.py --selftest
     Builds the deterministic reference-shaped synthetic state dict, converts
     it, runs the fc-mode score net on canned 3dbs inputs at three noise
     levels, and compares every head output against the recorded expectations
     in tests/fixtures/e3nn_selftest_expected.npz (atol/rtol 1e-4; f32 CPU).
     Any change to the conversion pipeline that alters converted-model
     numerics trips this. Regenerate (after an INTENDED change, with the
     reason in the commit message): --selftest --record.

  2. REAL WEIGHTS (the day a reference .pth arrives):
         python tools/verify_e3nn_import.py diffbindfr_paper.pth -o acts.npz
     Converts the checkpoint (full flagship config) and dumps the head
     activations on the same canned inputs. With recorded REFERENCE
     activations (run the torch model on the exported canned inputs — see
     dump_canned_inputs below — and save the same keys):
         python tools/verify_e3nn_import.py diffbindfr_paper.pth \
             --expected ref_acts.npz
     reports per-head max absolute/relative deviation; PASS threshold
     max_rel < 1e-3 (bf16-free f32 path; the two implementations share
     exact table numerics).

  3. E3NN CONVENTIONS (the day e3nn is installable): if `import e3nn`
     succeeds, --check-e3nn verifies A1 (real SH basis), A2 (w3j signs,
     INCLUDING the otherwise-unanchored (1,2,1) triple), A3 (irreps sort
     order), A4 (FCTP path normalization/weight layout) directly against
     the installed library.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures",
    "e3nn_selftest_expected.npz")
FWD = "/root/reference/examples/forward"
T_VALUES = (0.9, 0.5, 0.1)


def small_cfg():
    from diffbindfr_tpu.models.score_net import ScoreNetConfig

    return ScoreNetConfig(ns=8, nv=4, num_conv_layers=3,
                          sigma_embed_dim=8, distance_embed_dim=8,
                          conv_mode="fc", compute_dtype="float32",
                          dropout=0.0)


def flagship_cfg():
    from diffbindfr_tpu.models.score_net import ScoreNetConfig

    return ScoreNetConfig(conv_mode="fc", compute_dtype="float32",
                          dropout=0.0)


def canned_sample():
    """Deterministic real-featurized input: the 3dbs crystal pair at
    cutoff 8 (same fixture the import tests use)."""
    from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
    from diffbindfr_tpu.chem.mol import perceive
    from diffbindfr_tpu.chem.protein_feats import build_pocket_record
    from diffbindfr_tpu.data import make_sample
    from diffbindfr_tpu.io.pdb import parse_pdb
    from diffbindfr_tpu.io.sdf import parse_sdf

    prot = parse_pdb(f"{FWD}/3dbs_protein.pdb")
    lig = featurize_ligand(
        perceive(parse_sdf(f"{FWD}/3dbs_protein_crystal.sdf")[0]), "3dbs")
    pocket = build_pocket_record(prot, lig.pos, cutoff=8.0)
    lig.pos = lig.pos - pocket.center
    return make_sample(lig, pocket)


def head_activations(params, cfg, sample):
    """{head_t: array} for every score head at each canned noise level."""
    import jax
    import jax.numpy as jnp

    from diffbindfr_tpu.models import score_net as sn
    from diffbindfr_tpu.sampler import SamplerConfig

    sched = SamplerConfig().schedule
    fn = jax.jit(lambda p, s_, t_, sg: sn.apply(p, cfg, s_, t_, sg))
    out = {}
    for t in T_VALUES:
        tt = jnp.asarray(t, jnp.float32)
        res = fn(params, sample, tt, sn.sigmas_from_t(tt, sched))
        for k, v in res._asdict().items():
            if v is not None:
                out[f"{k}@t={t}"] = np.asarray(v, np.float64)
    return out


def compare(acts: dict, expected: dict, atol=1e-4, rtol=1e-3) -> bool:
    ok = True
    print(f"{'head':28s} {'max_abs':>12s} {'max_rel':>12s}")
    for k in sorted(expected):
        if k not in acts:
            print(f"{k:28s} MISSING from converted run")
            ok = False
            continue
        a, e = acts[k], np.asarray(expected[k], np.float64)
        if a.shape != e.shape:
            print(f"{k:28s} shape {a.shape} != {e.shape}")
            ok = False
            continue
        d = np.abs(a - e)
        rel = d / (np.abs(e) + 1e-8)
        line_ok = (d.max() < atol) or (rel.max() < rtol)
        print(f"{k:28s} {d.max():12.3e} {rel.max():12.3e}"
              + ("" if line_ok else "  FAIL"))
        ok = ok and line_ok
    return ok


def run_selftest(record: bool) -> int:
    sys.path.insert(0, os.path.join(os.path.dirname(FIXTURE), ".."))
    from test_e3nn_import import _fake_reference_sd  # deterministic, seed 0

    from diffbindfr_tpu.utils import torch_import as TI

    cfg = small_cfg()
    sd = _fake_reference_sd(cfg)
    params, report = TI.import_score_net(sd, cfg)
    assert report.skipped == [], f"unmapped keys: {report.skipped}"
    acts = head_activations(params, cfg, canned_sample())
    if record:
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez(FIXTURE, **acts)
        print(f"[selftest] recorded {len(acts)} heads -> {FIXTURE}")
        return 0
    if not os.path.exists(FIXTURE):
        sys.exit(f"no fixture at {FIXTURE}; run --selftest --record once")
    ok = compare(acts, dict(np.load(FIXTURE)))
    print(f"[selftest] {'PASS' if ok else 'FAIL'}: converted synthetic "
          f"model {'matches' if ok else 'DIVERGES from'} recorded "
          "expectations")
    return 0 if ok else 1


def dump_canned_inputs(path: str) -> None:
    """Export the canned DockingSample as plain arrays so the reference
    torch model can be driven on IDENTICAL inputs to record ref_acts."""
    s = canned_sample()
    np.savez(path, **{k: np.asarray(v) for k, v in s._asdict().items()})
    print(f"[inputs] canned sample -> {path}")


def check_e3nn() -> int:
    """A1-A4 against an installed e3nn (no-op here: e3nn absent)."""
    try:
        import e3nn  # noqa: F401
        import torch
        from e3nn import o3
    except ImportError:
        print("[e3nn] not installed in this environment; skipping "
              "(A1-A4 remain assumption-checked only)")
        return 0
    from diffbindfr_tpu.nn import irreps as IR
    from diffbindfr_tpu.utils import e3nn_compat as EC

    failures = []
    # A1: real SH convention at sampled directions
    rng = np.random.default_rng(0)
    v = rng.normal(size=(64, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    ours = EC.sh_e3nn(v)  # [64, 9] l=0..2, e3nn basis, component-normalized
    theirs = o3.spherical_harmonics(
        [0, 1, 2], torch.from_numpy(v), normalize=False,
        normalization="component").numpy()
    if not np.allclose(ours, theirs, atol=1e-6):
        failures.append(f"A1 SH basis: max dev "
                        f"{np.abs(ours - theirs).max():.2e}")
    # A2: w3j for every triple the model uses — (1,2,1) is the one the
    # anchors cannot reach
    for tri in [(1, 1, 0), (1, 1, 1), (1, 2, 1), (0, 0, 0), (1, 0, 1),
                (2, 2, 0), (2, 1, 1), (2, 2, 1)]:
        ours_w = EC.w3j_e3nn(*tri)
        theirs_w = o3.wigner_3j(*tri).numpy()
        if not np.allclose(ours_w, theirs_w, atol=1e-7):
            failures.append(f"A2 w3j{tri}: max dev "
                            f"{np.abs(ours_w - theirs_w).max():.2e}")
    # A3: irreps sort order
    si = o3.Irreps("1x2e+1x0o+1x1o+1x0e+1x1e").sort().irreps
    ours_sort = sorted(
        [(2, 1), (0, -1), (1, -1), (0, 1), (1, 1)],
        key=lambda lp: EC.e3nn_sort_key(*lp))
    theirs_sort = [(ir.ir.l, ir.ir.p) for ir in si]
    if ours_sort != theirs_sort:
        failures.append(f"A3 sort: {ours_sort} != {theirs_sort}")
    # A4: FCTP weight numel + per-path normalization on a model-shaped TP
    in1 = "8x0e+4x1o+4x1e+8x0o"
    tp = o3.FullyConnectedTensorProduct(
        o3.Irreps(in1), o3.Irreps("1x0e+1x1o+1x2e"), o3.Irreps(in1),
        shared_weights=False)
    ours_tp = EC.E3nnFCTP(IR.Irreps.parse(in1),
                          IR.Irreps.parse("1x0e+1x1o+1x2e"),
                          IR.Irreps.parse(in1))
    if tp.weight_numel != ours_tp.weight_numel:
        failures.append(f"A4 weight_numel {ours_tp.weight_numel} != "
                        f"{tp.weight_numel}")
    else:
        x1 = rng.normal(size=(5, ours_tp.in1.dim)).astype(np.float32)
        x2 = rng.normal(size=(5, ours_tp.in2.dim)).astype(np.float32)
        w = rng.normal(size=(5, ours_tp.weight_numel)).astype(np.float32)
        ours_y = ours_tp(x1, x2, w)
        theirs_y = tp(torch.from_numpy(x1), torch.from_numpy(x2),
                      torch.from_numpy(w)).detach().numpy()
        if not np.allclose(ours_y, theirs_y, atol=1e-5):
            failures.append(f"A4 FCTP function: max dev "
                            f"{np.abs(ours_y - theirs_y).max():.2e}")
    if failures:
        print("[e3nn] ASSUMPTION FAILURES:\n  " + "\n  ".join(failures))
        return 1
    print("[e3nn] A1-A4 verified against installed e3nn "
          f"{e3nn.__version__}: PASS")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("checkpoint", nargs="?",
                    help="reference .pth (torch state dict)")
    ap.add_argument("--selftest", action="store_true",
                    help="synthetic round-trip vs checked-in fixtures")
    ap.add_argument("--record", action="store_true",
                    help="(with --selftest) re-record the fixture")
    ap.add_argument("--expected",
                    help="npz of recorded reference activations to compare")
    ap.add_argument("-o", "--out", help="write converted-model activations")
    ap.add_argument("--dump-inputs",
                    help="export the canned DockingSample arrays (drive the "
                         "torch reference on identical inputs)")
    ap.add_argument("--check-e3nn", action="store_true",
                    help="verify A1-A4 against an installed e3nn")
    ap.add_argument("--cfg", choices=["flagship", "small"],
                    default="flagship",
                    help="model config for --checkpoint conversion "
                         "(small = the selftest architecture; lets tests "
                         "drive the real-checkpoint path cheaply)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    rc = 0
    if args.dump_inputs:
        dump_canned_inputs(args.dump_inputs)
    if args.check_e3nn:
        rc |= check_e3nn()
    if args.selftest:
        rc |= run_selftest(args.record)
    if args.checkpoint:
        from diffbindfr_tpu.utils import torch_import as TI

        cfg = flagship_cfg() if args.cfg == "flagship" else small_cfg()
        params, report = TI.import_checkpoint(
            args.checkpoint, arch="score_net", cfg=cfg,
            unverified_scorenet=True)
        if getattr(report, "skipped", None):
            print(f"[weights] {len(report.skipped)} unmapped keys "
                  f"(first: {report.skipped[:3]})")
        acts = head_activations(params, cfg, canned_sample())
        if args.out:
            np.savez(args.out, **acts)
            print(f"[weights] activations -> {args.out}")
        if args.expected:
            ok = compare(acts, dict(np.load(args.expected)))
            print(f"[weights] {'PASS' if ok else 'FAIL'} vs recorded "
                  "reference activations")
            rc |= 0 if ok else 1
    if not (args.selftest or args.checkpoint or args.check_e3nn
            or args.dump_inputs):
        ap.print_help()
        return 2
    return rc


if __name__ == "__main__":
    sys.exit(main())
