"""Training driver: `python -m diffbindfr_tpu.app.train_cli ...`.

The reference ships its trainer framework but no training entry
(SURVEY 3.2: forward_train is gutted, scFlex.py:59-64). This driver trains
either model from crystal-complex job tables:

  * diffusion: denoising score matching on the 4 manifolds (train.py)
  * mdn: mixture-density NLL on crystal-contact distances (mdn_scorer.py)

Batches sample (with replacement) from the prepared pairs of one bucket
class per step; the train step is jitted once per bucket and the batch
axis shards over the device mesh when more than one device is visible.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def build_parser():
    ap = argparse.ArgumentParser(prog="diffbindfr_tpu-train")
    ap.add_argument("-i", "--input-csv", help="crystal complex job table")
    ap.add_argument("-l", "--ligands", nargs="+")
    ap.add_argument("-p", "--receptors", nargs="+")
    ap.add_argument("-o", "--outdir", required=True)
    ap.add_argument("--model", choices=["diffusion", "mdn"], default="diffusion")
    ap.add_argument(
        "--pose-dir",
        help="mdn only: pose-discrimination training from a generated pose "
             "set (tools/make_scorer_poses.py npz dir; mdn_train.py loss = "
             "crystal NLL + good-vs-decoy ranking hinge + cross-dock decoy "
             "floor). Replaces -i/-l for the train set.",
    )
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("-bs", "--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--ema", type=float, default=0.999)
    ap.add_argument("-dr", "--pocket-radius", type=float, default=12.0)
    ap.add_argument("-nw", "--num-workers", type=int, default=0)
    ap.add_argument(
        "--stream-cache",
        help="stream training batches from a prepared per-pair npz cache "
             "dir (data/stream.py: manifest + shuffle-buffer + grouped "
             "dynamic batching; host RSS stays O(buffer), the PDBbind-scale "
             "path). Replaces -i/-l for the TRAIN set; validation still "
             "comes from --val-csv. Populate the cache with "
             "`predict -j prep` or pipeline.prep(cache_dir=...).",
    )
    ap.add_argument("--stream-buffer", type=int, default=256,
                    help="shuffle-buffer capacity (decoded samples resident)")
    ap.add_argument("--prefetch", type=int, default=2,
                    help="stream mode: batches decoded ahead on the IO thread")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--resume", help="checkpoint to resume from")
    ap.add_argument("--val-csv", help="held-out validation job table")
    ap.add_argument(
        "--holdout", nargs="+",
        help="complex_name substrings moved from the train table to the "
             "validation set (alternative to --val-csv)",
    )
    ap.add_argument("--val-every", type=int, default=0,
                    help="validation interval in steps (0 = ckpt_every)")
    ap.add_argument("--val-batches", type=int, default=4)
    ap.add_argument(
        "--val-poses", type=int, default=0,
        help="diffusion only: additionally run the sampler with N poses per "
             "val pair and log best/mean L-RMSD (small-N sampling eval)",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--conv-mode", choices=["sep", "fc"], default="sep")
    ap.add_argument("--ns", type=int, default=48, help="scalar channels")
    ap.add_argument("--nv", type=int, default=12, help="vector channels")
    ap.add_argument("--layers", type=int, default=6, help="conv layers")
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="bfloat16")
    ap.add_argument("--pallas", action="store_true",
                    help="train through the fused pallas kernels (pallas "
                         "forward, XLA-twin backward via custom_vjp)")
    ap.add_argument("--pallas-bwd", action="store_true",
                    help="with --pallas: hand-written pallas backward "
                         "kernels (feature+param grads; positions get "
                         "zero cotangents — exact for DSM training)")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable per-layer gradient rematerialization "
                         "(flagship training at bs>=8 needs remat to fit HBM)")
    ap.add_argument("--cpu", action="store_true")
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.pallas:
        from ..utils.tpu_flags import enable_fused_layer_vmem

        enable_fused_layer_vmem()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from ..utils import compile_cache

    compile_cache.enable()

    from .. import train
    from ..data.sample import stack_samples
    from ..models import mdn_scorer as mdn
    from ..models import score_net as sn
    from ..sampler import SamplerConfig
    from ..utils import (load_checkpoint, load_train_state,
                         save_checkpoint, save_train_state)
    from . import jobs as J
    from . import pipeline as P

    if args.stream_cache or args.pose_dir:
        jobs = []
        if args.holdout:
            sys.exit("--holdout needs a job table; use --val-csv with "
                     "--stream-cache/--pose-dir")
    elif args.input_csv:
        jobs = J.load_jobs_csv(args.input_csv)
    elif args.ligands and args.receptors:
        jobs = J.make_jobs(args.ligands, args.receptors)
    else:
        sys.exit("need -i CSV, both -l and -p, --stream-cache, or --pose-dir")

    os.makedirs(args.outdir, exist_ok=True)
    if args.holdout:
        val_jobs = [
            j for j in jobs
            if any(h in j.complex_name for h in args.holdout)
        ]
        jobs = [j for j in jobs if j not in val_jobs]
        if not val_jobs:
            sys.exit(f"--holdout {args.holdout} matched no complex_name")
    elif args.val_csv:
        val_jobs = J.load_jobs_csv(args.val_csv)
    else:
        val_jobs = []

    prepared = []
    if jobs:
        prepared, failures = P.prep(jobs, pocket_radius=args.pocket_radius,
                                    num_workers=args.num_workers)
        P.write_failures(args.outdir, failures)
    if not prepared and not (args.stream_cache or args.pose_dir):
        sys.exit("no training pairs prepared")
    val_prepared = []
    if val_jobs:
        val_prepared, val_fail = P.prep(val_jobs, pocket_radius=args.pocket_radius)
        if val_fail:
            print(f"[val] {len(val_fail)} validation pairs failed prep")
        print(f"[val] {len(val_prepared)} held-out pairs "
              f"({', '.join(p.job.complex_name for p in val_prepared)})")

    # per-bucket batch size: the backward's pair-block temps scale with
    # n_lig * n_atm, so a fixed batch that fits the 64/512 bucket OOMs on
    # 128/1024 (4x the pair area). Keep the TOKEN budget constant instead:
    # bs_bucket = bs * (64*512) / (n_lig*n_atm), floor 1.
    from ..data.stream import bucket_batch_size

    def bucket_bs(b):
        return bucket_batch_size(b, args.batch_size)

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)

    log_path = os.path.join(args.outdir, "train_log.jsonl")
    logf = open(log_path, "a")

    def log(step, metrics, extra=None):
        rec = {"step": int(step), **{k: float(v) for k, v in metrics.items()}}
        if extra:
            rec.update(extra)
        logf.write(json.dumps(rec) + "\n")
        logf.flush()

    prefetcher = None
    if args.stream_cache:
        # PDBbind-scale path: manifest + shuffle-buffer + grouped dynamic
        # batching + IO-thread prefetch (data/stream.py); host RSS stays
        # O(stream_buffer) instead of O(dataset)
        from ..data import stream as DS

        entries = DS.build_manifest(args.stream_cache)
        if not entries:
            sys.exit(f"no sample npz files under {args.stream_cache}")
        sstream = DS.ShuffleStream(
            entries, buffer_size=args.stream_buffer, seed=args.seed,
            host_id=jax.process_index(), num_hosts=jax.process_count(),
        )
        batcher = DS.GroupedBatcher(sstream, base_bs=args.batch_size)
        prefetcher = DS.Prefetcher(batcher, depth=args.prefetch)
        print(f"[train] streaming {len(entries)} pairs from "
              f"{args.stream_cache} (buffer {sstream.buffer_size}, host "
              f"{jax.process_index()}/{jax.process_count()})")

        def draw_batch():
            _, batch, _ = prefetcher.next_batch()
            return jax.tree.map(jnp.asarray, batch)

        def stream_stats():
            return " | " + batcher.format_stats()

    elif prepared:
        # small-table path: group pairs by bucket in memory; each step
        # draws a batch (with replacement) within one bucket
        by_bucket: dict = {}
        for i, pr in enumerate(prepared):
            by_bucket.setdefault(pr.bucket, []).append(i)
        buckets = list(by_bucket)
        weights = np.array([len(by_bucket[b]) for b in buckets], np.float64)
        weights /= weights.sum()
        print(f"[train] {len(prepared)} pairs in {len(buckets)} buckets")

        def draw_batch():
            b = buckets[rng.choice(len(buckets), p=weights)]
            idxs = rng.choice(by_bucket[b], size=bucket_bs(b), replace=True)
            batch = stack_samples([prepared[i].sample for i in idxs])
            return jax.tree.map(jnp.asarray, batch)

        def stream_stats():
            return ""

    else:  # --pose-dir: batches come from draw_pose_batch below
        if args.model != "mdn" or not args.pose_dir:
            sys.exit("--pose-dir requires --model mdn")

        def stream_stats():
            return ""

    # ---- fixed validation batches: same pairs AND same noise keys at every
    # eval so the val curve is comparable step-to-step (EvalHook analogue)
    val_every = args.val_every or args.ckpt_every
    val_batches = []
    if val_prepared:
        vrng = np.random.default_rng(args.seed + 7919)
        vb_by_bucket: dict = {}
        for i, pr in enumerate(val_prepared):
            vb_by_bucket.setdefault(pr.bucket, []).append(i)
        vbuckets = list(vb_by_bucket)
        vkeys = jax.random.split(
            jax.random.PRNGKey(args.seed + 4242), args.val_batches
        )
        for bi in range(args.val_batches):
            b = vbuckets[bi % len(vbuckets)]
            idxs = vrng.choice(vb_by_bucket[b], size=bucket_bs(b), replace=True)
            batch = stack_samples([val_prepared[i].sample for i in idxs])
            val_batches.append((jax.tree.map(jnp.asarray, batch), vkeys[bi]))

    if args.model == "diffusion":
        net_cfg = sn.ScoreNetConfig(
            ns=args.ns, nv=args.nv, num_conv_layers=args.layers,
            conv_mode=args.conv_mode, compute_dtype=args.dtype, dropout=0.0,
            remat=not args.no_remat, use_pallas=args.pallas,
            pallas_bwd=args.pallas_bwd,
            # training pins the f32 depthwise chain: both backward paths
            # (twin and pallas) compute f32, and a bf16 forward against an
            # f32 backward is a gradient/forward mismatch we don't need in
            # training (the bf16 chain is an inference-throughput knob)
            pallas_dw_dtype="float32",
        )
        tcfg = train.TrainConfig(
            lr=args.lr, warmup_steps=args.warmup,
            total_steps=args.steps, ema_decay=args.ema,
        )
        scfg = SamplerConfig()
        state = train.init_state(jax.random.PRNGKey(args.seed), net_cfg, tcfg)
        start_step = 0
        if args.resume:
            if args.resume.endswith("state.npz"):
                state = load_train_state(args.resume, state)
                start_step = int(state.step)
                print(f"[train] resumed FULL state from {args.resume} "
                      f"(step {start_step})")
            else:
                params, step0 = load_checkpoint(args.resume)
                state = state._replace(params=params)
                # continue the global step count for params-only resumes
                # too, so checkpoints written to the same outdir never
                # overwrite the earlier run's files
                start_step = int(step0)
                print(f"[train] resumed params from {args.resume} "
                      f"(step {start_step}; optimizer state fresh)")
        step_fn = jax.jit(train.make_train_step(net_cfg, scfg, tcfg))
        eval_fn = (
            jax.jit(train.make_eval_step(net_cfg, scfg, tcfg))
            if val_batches else None
        )

        # checkpoint-selection policy (EvalHook model-selection analogue):
        # the validation-best EMA model is saved to ckpt_best.npz; eval_cli
        # prefers it when pointed at the run directory. Round-2 showed the
        # val EMA-DSM loss bottoming early and rising (overfit) while the
        # protocol silently used the LAST checkpoint.
        best_val = [float("inf")]

        def run_validation(step):
            rec = {}
            for tag, p in (("val", state.params), ("val_ema", state.ema_params)):
                ms = [eval_fn(p, b, k) for b, k in val_batches]
                for name in ms[0]:
                    rec[f"{tag}_{name}"] = float(
                        np.mean([float(m[name]) for m in ms])
                    )
            if args.val_poses:
                res = P.dock(
                    val_prepared, state.ema_params, net_cfg, scfg,
                    num_poses=args.val_poses, batch_size=args.batch_size,
                    seed=args.seed + step, verbose=False,
                )
                from .export import pose_metrics

                best: dict = {}
                for r in res:
                    pr = val_prepared[r.pair_idx]
                    if pr.crystal_pos is None:
                        continue
                    m = pose_metrics(
                        pr.lig, pr.pocket, r.lig_pos, r.atom14_pos,
                        crystal_lig_pos=pr.crystal_pos,
                    )
                    cur = best.setdefault(r.pair_idx, [])
                    cur.append(m.l_rmsd)
                if best:
                    bests = [min(v) for v in best.values()]
                    rec["val_best_lrmsd_mean"] = float(np.mean(bests))
                    rec["val_best_lrmsd_lt2"] = float(
                        np.mean([b < 2.0 for b in bests])
                    )
            print(
                "[val %d] " % step
                + " ".join(f"{k}={v:.4f}" for k, v in rec.items()),
                flush=True,
            )
            # selection signal: the sampling eval (mean best-of-N L-RMSD on
            # held-out pairs) when --val-poses is on, else val EMA-DSM.
            # Round-3 measured the DSM loss mis-selecting for pose quality
            # (diff_r2: DSM picks a snapshot whose held-out oracle is 3.95 A
            # vs 2.46 A for the last one) — DSM-val is a weak generation
            # proxy at small data scale, the sampling eval is the real one.
            key = ("val_best_lrmsd_mean"
                   if "val_best_lrmsd_mean" in rec else "val_ema_loss")
            v = rec.get(key)
            if v is not None and v < best_val[0]:
                best_val[0] = v
                bpath = os.path.join(args.outdir, "ckpt_best.npz")
                save_checkpoint(bpath, state.params, state.ema_params, step)
                print(f"[ckpt] new best {key}={v:.4f} "
                      f"(step {step}) -> {bpath}", flush=True)
                rec["best_val"] = 1.0
            log(step, {}, extra=rec)

        # resumed runs CONTINUE the global step count: checkpoint names,
        # logs, and the --steps target all refer to total steps trained
        t0 = time.time()
        n_samp = 0  # batches are sized per bucket — count actual samples
        last_t, last_n = t0, 0
        for step in range(start_step + 1, args.steps + 1):
            key, sub = jax.random.split(key)
            batch = draw_batch()
            n_samp += int(batch.lig_mask.shape[0])
            state, metrics = step_fn(state, batch, sub)
            if step % args.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                now = time.time()
                rate = n_samp / (now - t0)
                marg = (n_samp - last_n) / max(now - last_t, 1e-9)
                last_t, last_n = now, n_samp
                print(f"[{step}] loss={m['loss']:.4f} "
                      f"(tr {m['tr_loss']:.3f} rot {m['rot_loss']:.3f} "
                      f"tor {m['tor_loss']:.3f} sc {m['sc_loss']:.3f}) "
                      f"{rate:.1f} samp/s (marginal {marg:.1f})"
                      + stream_stats(),
                      flush=True)
                log(step, metrics)
            if eval_fn is not None and (
                step % val_every == 0 or step == args.steps
            ):
                run_validation(step)
            if step % args.ckpt_every == 0 or step == args.steps:
                path = os.path.join(args.outdir, f"ckpt_{step:07d}.npz")
                save_checkpoint(path, state.params, state.ema_params, step)
                save_train_state(
                    os.path.join(args.outdir, "train_state.npz"), state
                )
                print(f"[ckpt] {path}")
    else:  # mdn
        import optax

        mcfg = mdn.MDNConfig()
        params = mdn.init_params(jax.random.PRNGKey(args.seed), mcfg)
        if args.resume:
            params, _ = load_checkpoint(args.resume)
        warmup = min(args.warmup, max(args.steps // 2, 1))
        opt = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adam(optax.warmup_cosine_decay_schedule(
                0.0, args.lr, warmup, max(args.steps, warmup + 1))),
        )
        opt_state = opt.init(params)

        def loss_fn(p, batch):
            # crystal pose: lig_pos + rebuilt atom14 from the native chis
            from ..sampler import _rebuild_atom14

            pos14 = jax.vmap(
                lambda s: _rebuild_atom14(s, s.torsion_angle[:, 1:])
            )(batch)
            losses = jax.vmap(
                lambda s, p14: mdn.mdn_loss(p, mcfg, s, s.lig_pos, p14)
            )(batch, pos14)
            return jnp.mean(losses)

        if args.pose_dir:
            # pose-discrimination training (mdn_train.py): crystal NLL +
            # good-vs-decoy ranking hinge + cross-dock decoy floor, over
            # the sampler-generated pose set
            from .. import mdn_train as MT

            entries = MT.load_pose_entries(args.pose_dir)
            if not entries:
                sys.exit(f"no pose npz files under {args.pose_dir}")
            e_by_bucket: dict = {}
            for i, e in enumerate(entries):
                e_by_bucket.setdefault(e.bucket, []).append(i)
            ebuckets = list(e_by_bucket)
            eweights = np.array(
                [len(e_by_bucket[b]) for b in ebuckets], np.float64)
            eweights /= eweights.sum()
            n_self = sum(e.is_self for e in entries)
            print(f"[mdn] pose-aug training: {len(entries)} pairs "
                  f"({n_self} self-dock, {len(entries) - n_self} "
                  f"cross-dock) in {len(ebuckets)} buckets")

            pose_loss = MT.make_pose_loss(mcfg)

            # stratified draw: uniform sampling over a 4-self/12-cross
            # entry set makes most batches cross-only (zero-signal steps,
            # see mdn_train.py round-4 note) — every batch takes half its
            # slots from self-dock entries when the bucket has both kinds
            e_self = {b: [i for i in idxs_ if entries[i].is_self]
                      for b, idxs_ in e_by_bucket.items()}
            e_cross = {b: [i for i in idxs_ if not entries[i].is_self]
                       for b, idxs_ in e_by_bucket.items()}
            ref_ema = [2.0]  # host-side decoy-floor fallback (EMA)

            def draw_pose_batch():
                b = ebuckets[rng.choice(len(ebuckets), p=eweights)]
                bs_ = bucket_bs(b)
                if e_self[b] and e_cross[b]:
                    n_s = max(bs_ // 2, 1)
                    idxs = np.concatenate([
                        rng.choice(e_self[b], size=n_s, replace=True),
                        rng.choice(e_cross[b], size=bs_ - n_s,
                                   replace=True)])
                else:
                    idxs = rng.choice(e_by_bucket[b], size=bs_,
                                      replace=True)
                return jax.tree.map(
                    jnp.asarray,
                    MT.make_pose_batch(entries, idxs, rng,
                                       ref_ema=ref_ema[0]))

            @jax.jit
            def pose_step_fn(p, o, batch):
                (loss, metrics), g = jax.value_and_grad(
                    pose_loss, has_aux=True)(p, batch)
                upd, o = opt.update(g, o, p)
                return optax.apply_updates(p, upd), o, metrics

        @jax.jit
        def step_fn(p, o, batch):
            loss, g = jax.value_and_grad(loss_fn)(p, batch)
            upd, o = opt.update(g, o, p)
            return optax.apply_updates(p, upd), o, loss

        val_loss_fn = jax.jit(loss_fn) if val_batches else None

        t0 = time.time()
        for step in range(1, args.steps + 1):
            from .pipeline import _dispatch_with_retry

            if args.pose_dir:
                params, opt_state, metrics = _dispatch_with_retry(
                    pose_step_fn, params, opt_state, draw_pose_batch())
                loss = metrics["loss"]
                if float(metrics["n_self"]) > 0:  # decoy-floor EMA
                    ref_ema[0] = (0.95 * ref_ema[0]
                                  + 0.05 * float(metrics["ref_native"]))
            else:
                params, opt_state, loss = _dispatch_with_retry(
                    step_fn, params, opt_state, draw_batch())
            if step % args.log_every == 0:
                rate = step * args.batch_size / (time.time() - t0)
                if args.pose_dir:
                    print(f"[{step}] loss={float(loss):.4f} "
                          f"(cr {float(metrics['nll_crystal']):.3f} "
                          f"pair {float(metrics['pair_hinge']):.3f} "
                          f"abs {float(metrics['abs_hinge']):.3f} "
                          f"rank {float(metrics['rank_hinge']):.3f}) "
                          f"{rate:.1f} samp/s", flush=True)
                    log(step, metrics)
                else:
                    print(f"[{step}] mdn_nll={float(loss):.4f} "
                          f"{rate:.1f} samp/s" + stream_stats(), flush=True)
                    log(step, {"mdn_nll": loss})
            if val_loss_fn is not None and (
                step % val_every == 0 or step == args.steps
            ):
                v = float(np.mean([
                    float(val_loss_fn(params, b)) for b, _ in val_batches
                ]))
                print(f"[val {step}] val_mdn_nll={v:.4f}", flush=True)
                log(step, {}, extra={"val_mdn_nll": v})
            if step % args.ckpt_every == 0 or step == args.steps:
                path = os.path.join(args.outdir, f"mdn_ckpt_{step:07d}.npz")
                save_checkpoint(path, params, step=step)
                print(f"[ckpt] {path}")

    if prefetcher is not None:
        prefetcher.close()
    logf.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
