"""Bounded-RSS streaming probe at PDBbind scale (VERDICT r3 task 7).

Generates a synthetic per-pair npz cache of N (default 20,000) schema-valid
DockingSamples across the real BUCKET_LEVELS mix (weighted like a typical
PDBbind size distribution), then drains the full streaming pipeline
(manifest -> ShuffleStream -> GroupedBatcher -> Prefetcher) for M batches
while recording peak RSS and per-bucket batch statistics.

Usage:
    python tools/probe_stream20k.py [--pairs 20000] [--batches 300]
        [--buffer 256] [--dir /tmp/stream20k] [--keep]

The synthetic samples use the REAL bucket dims (so per-sample npz size and
stacking cost are production-like for the small bucket; big buckets are
capped to keep generation time sane on the 1-core box with --small).
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import time

import numpy as np

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffbindfr_tpu.data.sample import BUCKET_LEVELS, Buckets  # noqa: E402
from diffbindfr_tpu.data import stream as DS  # noqa: E402
from tests.test_stream import fake_sample  # noqa: E402


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=20000)
    ap.add_argument("--batches", type=int, default=300)
    ap.add_argument("--buffer", type=int, default=256)
    ap.add_argument("--base-bs", type=int, default=8)
    ap.add_argument("--dir", default="/tmp/stream20k")
    ap.add_argument("--small", action="store_true",
                    help="use tiny fake buckets (fast generation smoke)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    if args.small:
        levels = [Buckets(4, 6, 2, 3, 8), Buckets(8, 12, 3, 4, 16),
                  Buckets(16, 24, 4, 6, 32), Buckets(24, 36, 6, 8, 48)]
    else:
        levels = list(BUCKET_LEVELS)
    # PDBbind-like size mix: most pairs land in the two middle classes
    weights = np.array([0.25, 0.45, 0.22, 0.08])[: len(levels)]
    weights = weights / weights.sum()

    cache = args.dir
    os.makedirs(cache, exist_ok=True)
    existing = len([f for f in os.listdir(cache) if f.endswith(".npz")])
    rng = np.random.default_rng(0)
    t0 = time.time()
    if existing < args.pairs:
        # one prototype per level, written N times (content irrelevant to
        # the IO/stacking path; avoids 20k x fresh-random generation cost)
        protos = [fake_sample(b, seed=i)._asdict()
                  for i, b in enumerate(levels)]
        for i in range(existing, args.pairs):
            li = int(rng.choice(len(levels), p=weights))
            np.savez(os.path.join(cache, f"p{i:05d}_b{li}_r12.npz"),
                     **protos[li])
            if (i + 1) % 5000 == 0:
                print(f"[gen] {i + 1}/{args.pairs} "
                      f"({time.time() - t0:.0f}s)", flush=True)
    print(f"[gen] cache ready: {args.pairs} pairs in {cache} "
          f"({time.time() - t0:.0f}s), RSS {rss_mb():.0f} MB", flush=True)

    t0 = time.time()
    entries = DS.build_manifest(cache)
    print(f"[manifest] {len(entries)} entries in {time.time() - t0:.1f}s "
          f"(rebuild: cached)", flush=True)
    t0 = time.time()
    entries = DS.build_manifest(cache)
    print(f"[manifest] warm reload {time.time() - t0:.1f}s", flush=True)

    rss_before = rss_mb()
    s = DS.ShuffleStream(entries, buffer_size=args.buffer, seed=0)
    bb = DS.GroupedBatcher(s, base_bs=args.base_bs)
    pf = DS.Prefetcher(bb, depth=2)
    t0 = time.time()
    n_samples = 0
    try:
        for k in range(args.batches):
            bucket, batch, names = pf.next_batch()
            n_samples += len(names)
            if (k + 1) % 50 == 0:
                dt = time.time() - t0
                print(f"[drain] {k + 1}/{args.batches} batches, "
                      f"{n_samples} samples, {n_samples / dt:.0f} samp/s, "
                      f"RSS {rss_mb():.0f} MB | {bb.format_stats()}",
                      flush=True)
    finally:
        pf.close()
    dt = time.time() - t0
    out = {
        "pairs": args.pairs,
        "buffer": args.buffer,
        "batches": args.batches,
        "samples": n_samples,
        "samples_per_s": round(n_samples / dt, 1),
        "rss_mb_start": round(rss_before, 1),
        "rss_mb_peak": round(rss_mb(), 1),
        "epochs_touched": s.epoch,
        "per_bucket": {
            f"{b.n_lig}/{b.n_atm}": st for b, st in bb.stats.items()
        },
    }
    print(json.dumps(out))
    if not args.keep:
        shutil.rmtree(cache, ignore_errors=True)


if __name__ == "__main__":
    main()
