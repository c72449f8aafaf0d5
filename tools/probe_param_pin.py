"""Measure per-dispatch cost of passing numpy checkpoint params into the
jitted MDN stage vs pinning them on device once (DockEngine/MDNEngine
__init__). Through the axon relay every numpy leaf is a separate H2D
transfer per batch; pinning makes the param pytree a committed device
tree that the dispatch reuses.

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_param_pin.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = "runs/eval_r4_final"
DATA = "runs/pb_bench"


def main():
    from diffbindfr_tpu.app import pipeline as P
    from diffbindfr_tpu.app.eval_cli import make_jobs
    from diffbindfr_tpu.models import mdn_scorer as mdn
    from diffbindfr_tpu.utils import compile_cache, load_checkpoint

    compile_cache.enable()

    jobs = make_jobs("pb", DATA, cache_dir=os.path.join(OUT, "contact_chains"))
    prepared, failures = P.prep(
        jobs, pocket_radius=12.0,
        cache_dir=os.path.join(OUT, "prep_cache"), n_conformers=8)
    assert not failures, failures
    results = P.load_poses(os.path.join(OUT, "poses.npz"), prepared)
    print(f"{len(results)} poses over {len(prepared)} pairs")

    mdn_params, _ = load_checkpoint("runs/mdn_r4b/ckpt_best.npz",
                                    use_ema=True)
    cfg = mdn.MDNConfig()
    n_leaves = len(
        [x for x in __import__("jax").tree_util.tree_leaves(mdn_params)])
    print(f"param leaves: {n_leaves}")

    import jax

    for mode in ("pinned", "numpy"):
        eng = P.MDNEngine(mdn_params, cfg, batch_size=32, verbose=False)
        if mode == "numpy":
            # defeat the __init__ pinning: numpy leaves -> per-batch H2D
            eng.mdn_params = jax.tree.map(np.asarray, eng.mdn_params)
        # pass 1: compile + stage
        t0 = time.time()
        eng.run(prepared, results)
        t1 = time.time()
        # pass 2-3: steady state (stagers warm, fns cached)
        eng.run(prepared, results)
        t2 = time.time()
        eng.run(prepared, results)
        t3 = time.time()
        print(f"{mode:7s} pass1 {t1-t0:6.1f}s  "
              f"pass2 {t2-t1:6.2f}s  pass3 {t3-t2:6.2f}s  "
              f"({len(results)/(t3-t2):.1f} poses/s steady)")
        eng.close()


if __name__ == "__main__":
    main()
