"""Attribute the staged engines' all-miss stage wall section by section.

probe_packed_h2d established the wall is not the per-leaf H2D *count*;
probe_builder_cost established it is not host system construction
(2-3 ms/pair); probe_h2d_bw measured ~37 MB/s relay bandwidth + ~24 ms
dispatch floor. This probe instruments one warm all-miss EC pass with
forced syncs at section boundaries: host load / stack, update H2D +
scatter dispatch, batch-fn dispatch, result harvest. The sync mode
serializes what is normally pipelined, so the section sums exceed the
true wall — the point is attribution, not totals.

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_stage_breakdown.py
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

T = {}


def add(k, dt):
    T[k] = T.get(k, 0.0) + dt


def main():
    import jax
    import jax.numpy as jnp

    from diffbindfr_tpu.app import pipeline as P
    from diffbindfr_tpu.app.eval_cli import make_jobs
    from diffbindfr_tpu.utils import compile_cache

    compile_cache.enable()

    jobs = [j for j in make_jobs("pb", DATA,
                                 cache_dir=os.path.join(
                                     OUT, "contact_chains"))
            if j.complex_name == "3dbs"]
    # own prep cache: an old run's cache pins its pickled (old) bucket;
    # poses are synthesized at the CURRENT bucket shape (perturbed
    # crystal), so the probe tracks the shipped ladder
    prepared, failures = P.prep(
        jobs, pocket_radius=12.0,
        cache_dir="runs/probe_dock_cache", n_conformers=8,
        verbose=False)
    assert not failures, failures
    base = prepared[0]
    print(f"[probe] bucket: {base.bucket}")
    rng = np.random.default_rng(5)
    na = base.lig.num_atoms
    poses = []
    for i in range(N_PAIRS):
        lp = np.zeros((base.bucket.n_lig, 3), np.float32)
        lp[:na] = base.lig.pos + rng.normal(scale=0.6, size=(na, 3))
        poses.append(P.PoseResult(
            pair_idx=0, pose_idx=i, lig_pos=lp,
            atom14_pos=np.zeros(
                (base.bucket.n_res, 14, 3), np.float32),
            chi=np.zeros(0, np.float32)))

    pairs = [copy.copy(base) for _ in range(N_PAIRS)]

    def fresh_results():
        out = []
        for i, src in enumerate(poses):
            r = copy.copy(src)
            r.pair_idx = i
            out.append(r)
        return out

    # --- instrument _DeviceStager.ensure with section syncs
    orig_ensure = P._DeviceStager.ensure

    def timed_ensure(self, pis):
        distinct = list(dict.fromkeys(pis))
        missing = [pi for pi in distinct if pi not in self.slot_of]
        if not missing:
            return orig_ensure(self, pis)
        t0 = time.perf_counter()
        host = [self.load_host(pi) for pi in missing]
        # re-register futures-free loads so orig_ensure doesn't redo them
        for pi, h in zip(missing, host):
            fut = type("F", (), {"result": staticmethod(lambda h=h: h)})()
            self._futures[pi] = fut
        t1 = time.perf_counter()
        add("host_load", t1 - t0)
        n_bytes = sum(
            x.nbytes for h in host for x in jax.tree.leaves(h))
        add("bytes_mb", n_bytes / 1e6)
        out = orig_ensure(self, pis)
        # the relay's block_until_ready can return before real
        # completion (CLAUDE.md); fetch a scalar to force it
        float(jax.tree.leaves(self.block)[0].ravel()[0])
        t2 = time.perf_counter()
        add("stack_h2d_scatter", t2 - t1)
        return out

    P._DeviceStager.ensure = timed_ensure

    eng = P.ECEngine(steps=150, batch_size=BS, verbose=False)
    eng.run(pairs, fresh_results())  # compile pass
    eng.close()
    T.clear()

    eng = P.ECEngine(steps=150, batch_size=BS, verbose=False)

    # time the dispatch+harvest by wrapping _dispatch_with_retry
    orig_dispatch = P._dispatch_with_retry

    def timed_dispatch(fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        # true sync: scalar fetch (relay block_until_ready returns early)
        float(jax.tree.leaves(out)[0].ravel()[0])
        add("fn_dispatch_sync", time.perf_counter() - t0)
        return out

    P._dispatch_with_retry = timed_dispatch
    t0 = time.time()
    eng.run(pairs, fresh_results())
    wall = time.time() - t0
    eng.close()
    P._DeviceStager.ensure = orig_ensure
    P._dispatch_with_retry = orig_dispatch

    mb = T.pop("bytes_mb", 0.0)
    print(f"warm all-miss EC pass, {N_PAIRS} pairs/poses, bs={BS}: "
          f"wall {wall:.2f}s (sections serialized by syncs)")
    print(f"  update group bytes: {mb:.1f} MB total "
          f"({mb / (N_PAIRS / BS):.1f} MB/batch)")
    for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
        print(f"  {k:22s} {v:7.2f} s")


if __name__ == "__main__":
    main()
