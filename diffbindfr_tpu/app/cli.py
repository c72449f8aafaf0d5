"""Command-line entry point: `python -m diffbindfr_tpu.app.cli predict ...`.

Mirrors the reference's argument surface (DiffBindFR/common/args.py:32-252)
with the flags that are meaningful on TPU. Job table input is either a CSV
(-i) or receptor/ligand lists (-p / -l) with pocket auto-discovery.
"""
from __future__ import annotations

import argparse
import os
import sys


def build_parser():
    ap = argparse.ArgumentParser(
        prog="diffbindfr_tpu",
        description="TPU-native flexible protein-ligand diffusion docking",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("predict", help="end-to-end docking")
    p.add_argument("-i", "--input-csv", help="job table csv")
    p.add_argument("-l", "--ligands", nargs="+", help="ligand files/dirs")
    p.add_argument("-p", "--receptors", nargs="+", help="receptor files/dirs")
    p.add_argument("-o", "--outdir", required=True)
    p.add_argument("-np", "--num-poses", type=int, default=40)
    p.add_argument("-bs", "--batch-size", type=int, default=16)
    p.add_argument("-dr", "--pocket-radius", type=float, default=12.0)
    p.add_argument("-j", "--job", choices=["prep", "dock"], default="dock")
    p.add_argument("-ckt", "--checkpoint", help="diffusion model checkpoint (.npz)")
    p.add_argument("-mdn", "--mdn-checkpoint", help="MDN scorer checkpoint (.npz)")
    p.add_argument("-sd", "--seed", type=int, default=0)
    p.add_argument("-nw", "--num-workers", type=int, default=0,
                   help="parallel featurization workers (0 = serial)")
    p.add_argument("-nc", "--num-conformers", type=int, default=0,
                   help="DG-embed N fresh starting conformers per ligand "
                        "(ETKDG analogue; 0 = use input geometry)")
    p.add_argument("-s", "--start", type=int, default=0, help="job slice start")
    p.add_argument("-e", "--end", type=int, default=None, help="job slice end")
    p.add_argument("-int", "--interval", type=int, default=1)
    p.add_argument("-es", "--export-pocket", action="store_true")
    p.add_argument("-et", "--export-top", type=int, default=-1,
                   help="write structure files only for the K best poses "
                        "per complex (mdn rank, else vina); other rows "
                        "keep scores/metrics in results.csv with empty "
                        "file columns. -1 = all (default). At screen "
                        "scale the per-pose protein PDB dominates export "
                        "time.")
    p.add_argument("-no_score", "--no-score", action="store_true",
                   help="skip MDN scoring")
    p.add_argument("--save-poses", action="store_true",
                   help="persist final pose arrays to <outdir>/poses.npz "
                        "so scorers can be re-run on them without "
                        "re-docking (app/rescore_cli.py; eval_cli always "
                        "saves)")
    p.add_argument("-no_ec", "--no-ec", action="store_true",
                   help="skip vina-style pose re-minimization")
    p.add_argument("--ec-steps", type=int, default=150)
    p.add_argument("--cart-relax", action="store_true",
                   help="all-atom Cartesian fine-relax of every pose after "
                        "EC (the OpenMM relax role, reference relax/pl.py; "
                        "repairs clashes/planarity EC's pose-space moves "
                        "cannot reach — see ops/cartesian.py)")
    p.add_argument("--cart-steps", type=int, default=300)
    p.add_argument("--ec-bs", type=int, default=0,
                   help="EC minimization batch size (0 = same as -bs); "
                        "EC is far lighter per pose than the sampler, so "
                        "larger batches amortize dispatch overhead")
    p.add_argument("--score-bs", type=int, default=0,
                   help="MDN scoring batch size (0 = same as -bs)")
    p.add_argument("-st", "--steps", type=int, default=20,
                   help="actual diffusion steps")
    p.add_argument("--cluster-rank", type=float, default=0.0,
                   help="cluster poses (symmetric-RMSD single linkage at "
                        "this cutoff, A) and write results_cluster_top1"
                        ".csv ranking cluster representatives by mdn_nll "
                        "— measured 60%% vs 40%% raw top-1<=2A at 320-"
                        "pose budgets (runs/pose_budget); 0 = off")
    p.add_argument("--cluster-mode", choices=["best", "mean", "size"],
                   default="mean")
    p.add_argument("--expand-sdf", action="store_true",
                   help="expand multi-molecule ligand SDFs into one job "
                        "per record (path#<i> addressing); single-"
                        "molecule files are unaffected")
    p.add_argument("-traj", "--trajectory", action="store_true",
                   help="export per-step denoising trajectories")
    p.add_argument("--pallas", action="store_true",
                   help="use fused pallas kernels for the dense convs")
    p.add_argument("--conv-mode", choices=["sep", "fc"], default="sep")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("-cfg", "--config", help="python config file (see "
                   "utils/config.py: _base_ inheritance, ${var} interp)")
    p.add_argument("--cfg-options", nargs="*", default=None,
                   help="dotted overrides, e.g. score_net.ns=96 sampler.eps=1e-4")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")

    r = sub.add_parser(
        "relax",
        help="re-minimize exported poses in place (vina-style local "
             "minimization; the reference uses OpenMM, DiffBindFR/relax/pl.py)",
    )
    r.add_argument("-i", "--results-csv", required=True)
    r.add_argument("--steps", type=int, default=300)
    r.add_argument("-dr", "--pocket-radius", type=float, default=8.0)
    r.add_argument("--flex", action="store_true",
                   help="joint ligand + side-chain relax (restrained chi "
                        "DOFs, receptor clash term — the relax/pl.py "
                        "analogue); writes <name>_relaxed.pdb next to the "
                        "pose with the re-packed pocket side chains")
    r.add_argument("--cartesian", action="store_true",
                   help="all-atom Cartesian fine-relax (ligand Cartesian "
                        "coords + restrained receptor heavy atoms, "
                        "ops/cartesian.py — the closest analogue of the "
                        "reference's OpenMM minimization); writes the "
                        "relaxed receptor as <pose>_relaxed.pdb")
    r.add_argument("--angular-hb", action="store_true",
                   help="angular H-bond term: scale the hbond pair term "
                        "by donor/acceptor cone factors derived from "
                        "heavy-atom geometry (implicit-H directionality; "
                        "the relax/pl.py force-field analogue)")
    r.add_argument("--w-chi", type=float, default=1.0,
                   help="chi restraint weight (flex mode)")
    r.add_argument("--explicit-h", action="store_true",
                   help="place explicit polar hydrogens on the receptor "
                        "(pdbfixer-role protonation, chem/protonate.py) "
                        "and use the actual H directions in the angular "
                        "H-bond term (implies --angular-hb; rigid "
                        "receptor mode only)")
    r.add_argument("--cpu", action="store_true")
    return ap


def cmd_predict(args):
    if args.pallas:
        from ..utils.tpu_flags import enable_fused_layer_vmem

        enable_fused_layer_vmem()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from ..utils import compile_cache

    compile_cache.enable()

    from .. import sampler as sp
    from ..models import mdn_scorer as mdn
    from ..models import score_net as sn
    from ..utils import load_checkpoint
    from . import jobs as J
    from . import pipeline as P

    if args.input_csv:
        jobs = J.load_jobs_csv(args.input_csv)
    elif args.ligands and args.receptors:
        jobs = J.make_jobs(args.ligands, args.receptors)
    else:
        sys.exit("need -i CSV or both -l and -p")
    if args.expand_sdf:
        n0 = len(jobs)
        jobs = J.expand_ligand_library(jobs)
        if len(jobs) != n0:
            print(f"[jobs] library expansion: {n0} -> {len(jobs)}")
    jobs = J.job_slice(jobs, args.start, args.end, args.interval)
    print(f"[jobs] {len(jobs)} pairs")

    os.makedirs(args.outdir, exist_ok=True)
    prepared, failures = P.prep(
        jobs, pocket_radius=args.pocket_radius,
        cache_dir=os.path.join(args.outdir, "prep_cache"),
        num_workers=args.num_workers, n_conformers=args.num_conformers,
    )
    P.write_failures(args.outdir, failures)
    if args.job == "prep":
        print("[prep] done (job=prep, stopping before dock)")
        return 0
    if not prepared:
        sys.exit("no pairs prepared")

    net_kw = dict(conv_mode=args.conv_mode, compute_dtype=args.dtype,
                  use_pallas=args.pallas)
    samp_kw = dict(inference_steps=args.steps + 2, actual_steps=args.steps)
    if args.config or args.cfg_options:
        from ..utils.config import apply_overrides, load_config

        cfg_d = load_config(args.config) if args.config else {}
        cfg_d = apply_overrides(cfg_d, args.cfg_options)
        net_kw.update(cfg_d.get("score_net", {}))
        samp_kw.update(cfg_d.get("sampler", {}))
    net_cfg = sn.ScoreNetConfig(**net_kw)
    scfg = sp.SamplerConfig(**samp_kw)
    if args.checkpoint:
        from ..utils.checkpoint import resolve_checkpoint

        ckpt = resolve_checkpoint(args.checkpoint)
        params, step = load_checkpoint(ckpt, use_ema=True)
        print(f"[model] loaded {ckpt} (step {step})")
    else:
        print(
            "[model] WARNING: no checkpoint given — using random weights "
            "(poses will not be meaningful; train with diffbindfr_tpu.train)"
        )
        params = sn.init_params(jax.random.PRNGKey(0), net_cfg)

    results = P.dock(
        prepared, params, net_cfg, scfg,
        num_poses=args.num_poses, batch_size=args.batch_size, seed=args.seed,
        keep_trajectory=args.trajectory,
    )

    if not args.no_ec:
        P.error_correct(prepared, results, steps=args.ec_steps,
                        batch_size=args.ec_bs or args.batch_size)

    if args.cart_relax:
        P.cartesian_relax(prepared, results, steps=args.cart_steps,
                          batch_size=args.batch_size)

    if args.save_poses:
        P.save_poses(args.outdir, prepared, results)

    if not args.no_score:
        mdn_cfg = mdn.MDNConfig()
        if args.mdn_checkpoint:
            from ..utils.checkpoint import resolve_checkpoint

            mdn_params, _ = load_checkpoint(
                resolve_checkpoint(args.mdn_checkpoint), use_ema=True)
        else:
            print("[score] WARNING: random MDN weights (ranking untrained)")
            mdn_params = mdn.init_params(jax.random.PRNGKey(1), mdn_cfg)
        P.score_mdn(prepared, results, mdn_params, mdn_cfg,
                    batch_size=args.score_bs or args.batch_size)

    res_csv = P.export_and_rank(
        prepared, results, args.outdir, export_pocket=args.export_pocket,
        export_top=args.export_top, cluster_rank=args.cluster_rank,
        cluster_mode=args.cluster_mode,
    )
    print(f"[done] results at {res_csv}")
    return 0


def _relax_cartesian(args, rows):
    """`relax --cartesian`: all-atom Cartesian fine-relax of exported
    poses (ops/cartesian.py; the reference's standalone OpenMM relax CLI,
    DiffBindFR/relax/pl.py). Updates the ligand SDF in place and writes
    the relaxed receptor next to it."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..chem.ligand_feats import featurize_ligand
    from ..chem.mol import perceive
    from ..chem.protein_feats import build_pocket_record
    from ..io.pdb import Protein, parse_pdb, to_pdb_string
    from ..io.sdf import parse_ligand_file, to_sdf_block
    from ..ops import cartesian as C
    from ..ops import vina
    from .export import full_protein_with_pocket, ligand_to_rawmol

    fn = jax.jit(lambda lp, a14, cl, vl, cr: C.cartesian_minimize(
        lp, a14, cl, vl, cr, steps=args.steps))
    n_done = 0
    for row in rows:
        lig_raw = parse_ligand_file(row["lig_sdf"])[0]
        lig = featurize_ligand(perceive(lig_raw), lig_raw.name)
        prot = parse_pdb(row["prot_pdb"])
        pocket = build_pocket_record(prot, lig.pos,
                                     cutoff=args.pocket_radius)
        na = lig.num_atoms
        pad_n = -(-na // 8) * 8
        pad_a = -(-int(pocket.atom14_mask.sum()) // 8) * 8
        cl = C.build_cartesian_ligand(lig, pad_n)
        vl = vina.build_ligand(lig, pad_n, max(lig.num_torsions, 1))
        cr = C.build_cartesian_receptor(pocket, pad_a)
        pos0 = jnp.asarray(
            np.pad(lig.pos - pocket.center, ((0, pad_n - na), (0, 0))),
            jnp.float32)
        pos, a14 = fn(pos0, jnp.asarray(pocket.atom14_pos, jnp.float32),
                      cl, vl, cr)
        world = np.asarray(pos)[:na] + pocket.center[None, :]
        with open(row["lig_sdf"], "w") as fh:
            fh.write(to_sdf_block(ligand_to_rawmol(lig, world, {})))
        pos37, mask37 = full_protein_with_pocket(
            prot, pocket, np.asarray(a14)[: pocket.num_res])
        relaxed = Protein(
            atom_positions=pos37, atom_mask=mask37,
            aatype=prot.aatype, residue_index=prot.residue_index,
            chain_index=prot.chain_index, b_factors=prot.b_factors,
            chain_ids=prot.chain_ids, resnames=prot.resnames,
            insertion_codes=prot.insertion_codes,
        )
        stem = os.path.splitext(row["lig_sdf"])[0]
        with open(stem + "_relaxed.pdb", "w") as fh:
            fh.write(to_pdb_string(relaxed))
        n_done += 1
    print(f"[relax] Cartesian fine-relaxed {n_done} poses in place")
    return 0


def cmd_relax(args):
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import csv

    import jax

    from ..utils import compile_cache

    compile_cache.enable()
    import jax.numpy as jnp
    import numpy as np

    from ..chem.ligand_feats import featurize_ligand
    from ..chem.mol import perceive
    from ..chem.protein_feats import build_pocket_record
    from ..io.pdb import parse_pdb
    from ..io.sdf import parse_ligand_file, to_sdf_block
    from ..ops import vina
    from .export import ligand_to_rawmol

    rows = list(csv.DictReader(open(args.results_csv)))
    if args.explicit_h and not args.angular_hb:
        print("[relax] --explicit-h implies --angular-hb")
        args.angular_hb = True
    if args.explicit_h and args.flex:
        sys.exit("--explicit-h is rigid-receptor only (the flex path "
                 "recomputes axes from the rebuilt atom14 in the jit)")
    if args.cartesian and (args.flex or args.explicit_h or args.angular_hb):
        sys.exit("--cartesian is its own mode (Cartesian DOFs; the "
                 "angular/explicit-H terms belong to the pose-space "
                 "minimizers)")
    if args.cartesian:
        return _relax_cartesian(args, rows)
    fn = jax.jit(
        lambda lp, l, r: vina.minimize(
            lp, l, r, steps=args.steps, angular_hb=args.angular_hb),
        static_argnames=(),
    )
    flex_fn = jax.jit(
        lambda lp, l, fr: vina.joint_minimize(
            lp, l, fr, steps=args.steps, w_chi=args.w_chi,
            angular_hb=args.angular_hb
        ),
    )
    n_done = 0
    for row in rows:
        lig_raw = parse_ligand_file(row["lig_sdf"])[0]
        lig = featurize_ligand(perceive(lig_raw), lig_raw.name)
        prot = parse_pdb(row["prot_pdb"])
        pocket = build_pocket_record(prot, lig.pos, cutoff=args.pocket_radius)
        na = lig.num_atoms
        pad_n = -(-na // 8) * 8
        vlig = vina.build_ligand(lig, pad_n, max(lig.num_torsions, 1))
        pos0 = jnp.asarray(
            np.pad(lig.pos - pocket.center, ((0, pad_n - na), (0, 0))),
            jnp.float32,
        )
        if args.flex:
            frec = vina.build_flex_receptor(
                pocket, -(-pocket.num_res // 8) * 8
            )
            pos, pos14, aff = flex_fn(pos0, vlig, frec)
            from .export import full_protein_with_pocket
            from ..io.pdb import Protein, to_pdb_string

            pos37, mask37 = full_protein_with_pocket(
                prot, pocket, np.asarray(pos14)[: pocket.num_res]
            )
            relaxed = Protein(
                atom_positions=pos37, atom_mask=mask37,
                aatype=prot.aatype, residue_index=prot.residue_index,
                chain_index=prot.chain_index, b_factors=prot.b_factors,
                chain_ids=prot.chain_ids, resnames=prot.resnames,
                insertion_codes=prot.insertion_codes,
            )
            stem = os.path.splitext(row["lig_sdf"])[0]
            with open(stem + "_relaxed.pdb", "w") as fh:
                fh.write(to_pdb_string(relaxed))
        else:
            opt_acc = None
            if args.explicit_h:
                na_ = lig.num_atoms
                lig_acc = np.asarray(vlig.acceptor)[:na_] > 0
                opt_acc = np.asarray(pos0)[:na_][lig_acc]
            vrec = vina.build_receptor(
                pocket, -(-int(pocket.atom14_mask.sum()) // 8) * 8,
                explicit_polar_h=args.explicit_h, opt_acceptors=opt_acc,
            )
            pos, aff = fn(pos0, vlig, vrec)
        world = np.asarray(pos)[:na] + pocket.center[None, :]
        with open(row["lig_sdf"], "w") as fh:
            fh.write(to_sdf_block(ligand_to_rawmol(
                lig, world, {"vina_score": f"{float(aff):.4f}"})))
        n_done += 1
    print(f"[relax] re-minimized {n_done} poses in place"
          + (" (flex)" if args.flex else ""))
    return 0


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cmd == "predict":
        return cmd_predict(args)
    if args.cmd == "relax":
        return cmd_relax(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
