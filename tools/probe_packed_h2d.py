"""A/B the packed single-buffer H2D staging (_DeviceStager) at screen
scale: N distinct pairs (every batch misses the LRU slot cache, the
1,200-ligand-screen regime) through the EC and Cartesian-relax engines.

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_packed_h2d.py
"""
import copy
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = "runs/eval_r4_final"
DATA = "runs/pb_bench"
N_PAIRS = 128
BS = 32


def main():
    from diffbindfr_tpu.app import pipeline as P
    from diffbindfr_tpu.app.eval_cli import make_jobs
    from diffbindfr_tpu.utils import compile_cache

    compile_cache.enable()

    jobs = [j for j in make_jobs("pb", DATA,
                                 cache_dir=os.path.join(
                                     OUT, "contact_chains"))
            if j.complex_name == "3dbs"]
    prepared, failures = P.prep(
        jobs, pocket_radius=12.0,
        cache_dir=os.path.join(OUT, "prep_cache"), n_conformers=8,
        verbose=False)
    assert not failures, failures
    base = prepared[0]
    saved = P.load_poses(os.path.join(OUT, "poses.npz"), prepared)

    # N_PAIRS distinct pair objects (identity-keyed by the stager; same
    # arrays, so transfer cost is the real per-pair cost) with one pose
    # each — a pure cache-missing staging workload.
    pairs = [copy.copy(base) for _ in range(N_PAIRS)]
    poses = [saved[i % len(saved)] for i in range(N_PAIRS)]

    def fresh_results():
        out = []
        for i, src in enumerate(poses):
            r = copy.copy(src)
            r.pair_idx = i
            out.append(r)
        return out

    for eng_name, make_eng in [
        ("ec", lambda: P.ECEngine(steps=150, batch_size=BS,
                                  verbose=False)),
        ("cart", lambda: P.CartesianRelaxEngine(batch_size=BS,
                                                verbose=False)),
    ]:
        for mode in ("packed", "perleaf"):
            os.environ["DIFFBINDFR_PACKED_H2D"] = (
                "1" if mode == "packed" else "0")
            eng = make_eng()
            t0 = time.time()
            eng.run(pairs, fresh_results())  # compile + stage all
            t1 = time.time()
            eng.close()
            eng = make_eng()  # fresh stagers: every pair misses again
            t2 = time.time()
            eng.run(pairs, fresh_results())
            t3 = time.time()
            eng.close()
            print(f"{eng_name:5s} {mode:8s} pass1(compile) {t1-t0:6.1f}s"
                  f"  pass2(warm, all-miss) {t3-t2:6.2f}s"
                  f"  ({N_PAIRS/(t3-t2):.1f} poses/s)")


if __name__ == "__main__":
    main()
