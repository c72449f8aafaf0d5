"""Attribute the dock stage's screen-scale gap (VERDICT r5 task 2).

bench.py at st=14 measures ~42 poses/s for the bare sampler kernel on one
repeated batch; the 1,200x2 screen's dock marginal was 12.7 poses/s
(ROUND4_NOTES section 9). This probe reproduces the screen's conditions —
batch_size=16, TWO poses per pair so every batch stages 16 NEW pairs
(all-miss LRU), depth-2 pipeline — and attributes the per-batch wall:

  pass A (uninstrumented): true pipelined wall at all-miss conditions,
      directly comparable to the bench kernel rate.
  pass B (forced syncs):   host npz load / stack+H2D+scatter / sampler
      dispatch+block / everything-else (refs build + harvest + python),
      serialized on purpose — attribution, not totals.
  pass C (uninstrumented, all-HIT: one pair repeated): the engine's
      staging-free ceiling, isolating staging cost from dispatch cost.

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_dock_stage.py
"""
import copy
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = "runs/eval_r4_final"
DATA = "runs/pb_bench"
N_PAIRS = int(os.environ.get("PROBE_PAIRS", "64"))
NP_PER = 2
BS = int(os.environ.get("PROBE_BS", "16"))
ST = int(os.environ.get("PROBE_ST", "14"))

T = {}


def add(k, dt):
    T[k] = T.get(k, 0.0) + dt


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401

    from diffbindfr_tpu.app import pipeline as P
    from diffbindfr_tpu.app.eval_cli import make_jobs
    from diffbindfr_tpu.models import score_net as sn
    from diffbindfr_tpu.sampler import SamplerConfig
    from diffbindfr_tpu.utils import compile_cache, load_checkpoint
    from diffbindfr_tpu.utils.checkpoint import resolve_checkpoint
    from diffbindfr_tpu.utils.tpu_flags import enable_fused_layer_vmem

    enable_fused_layer_vmem()
    compile_cache.enable()

    jobs = [j for j in make_jobs("pb", DATA,
                                 cache_dir=os.path.join(
                                     OUT, "contact_chains"))
            if j.complex_name == "3dbs"]
    # own cache dir: reusing an old run's cache would pin the OLD bucket
    # choice pickled at its prep time (the decoupled ligand/pocket ladder
    # only applies to freshly prepped pairs)
    prepared, failures = P.prep(
        jobs, pocket_radius=12.0,
        cache_dir="runs/probe_dock_cache", n_conformers=8,
        verbose=False)
    assert not failures, failures
    base = prepared[0]
    print(f"[probe] bucket: {base.bucket}")
    # distinct-object copies: the engine keys staging by id(), so every
    # copy stages like a distinct screen pair (same npz path = warm page
    # cache, matching a screen where the OS cache holds the library)
    pairs = [copy.copy(base) for _ in range(N_PAIRS)]

    net_cfg = sn.ScoreNetConfig(compute_dtype="bfloat16", use_pallas=True,
                                dropout=0.0)
    scfg = SamplerConfig(inference_steps=ST + 2, actual_steps=ST)
    params, step = load_checkpoint(
        resolve_checkpoint("runs/diff_r2/ckpt_0004000.npz"), use_ema=True)
    print(f"[probe] ckpt step {step}, st={ST}, bs={BS}, "
          f"{N_PAIRS} pairs x {NP_PER} poses")

    eng = P.DockEngine(params, net_cfg, scfg, batch_size=BS, verbose=False)

    # compile pass (2 batches worth)
    t0 = time.time()
    eng.run(pairs[:BS], num_poses=NP_PER, seed=0)
    print(f"[probe] compile pass {time.time() - t0:.1f}s")

    # ---- pass A: true pipelined wall, all-miss
    fresh = [copy.copy(base) for _ in range(N_PAIRS)]
    t0 = time.time()
    res = eng.run(fresh, num_poses=NP_PER, seed=1)
    wall_a = time.time() - t0
    n = len(res)
    print(f"[probe] A all-miss pipelined: {n} poses in {wall_a:.2f}s "
          f"({n / wall_a:.1f} poses/s)")

    # ---- pass C: all-hit ceiling (same 16 pairs every batch)
    hit_pairs = [copy.copy(base) for _ in range(BS)]
    eng.run(hit_pairs, num_poses=NP_PER, seed=2)  # stage them once
    t0 = time.time()
    res = eng.run(hit_pairs, num_poses=8, seed=3)  # 8 poses, slots hot
    wall_c = time.time() - t0
    n = len(res)
    print(f"[probe] C all-hit ceiling: {n} poses in {wall_c:.2f}s "
          f"({n / wall_c:.1f} poses/s)")

    # ---- pass B: forced syncs, section attribution
    orig_ensure = P._DeviceStager.ensure

    def timed_ensure(self, pis):
        distinct = list(dict.fromkeys(pis))
        missing = [pi for pi in distinct if pi not in self.slot_of]
        if not missing:
            return orig_ensure(self, pis)
        t0 = time.perf_counter()
        host = [self.load_host(pi) for pi in missing]
        for pi, h in zip(missing, host):
            fut = type("F", (), {"result": staticmethod(lambda h=h: h)})()
            self._futures[pi] = fut
        t1 = time.perf_counter()
        add("host_load", t1 - t0)
        add("bytes_mb", sum(
            x.nbytes for h in host for x in jax.tree.leaves(h)) / 1e6)
        out = orig_ensure(self, pis)
        # the relay's block_until_ready can return before real
        # completion (CLAUDE.md); fetch a scalar to force it
        float(jax.tree.leaves(self.block)[0].ravel()[0])
        add("stack_h2d_scatter", time.perf_counter() - t1)
        return out

    orig_dispatch = P._dispatch_with_retry

    def timed_dispatch(fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        # true sync: scalar fetch (relay block_until_ready returns early)
        float(jax.tree.leaves(out)[0].ravel()[0])
        add("sampler_dispatch_sync", time.perf_counter() - t0)
        return out

    P._DeviceStager.ensure = timed_ensure
    P._dispatch_with_retry = timed_dispatch
    fresh = [copy.copy(base) for _ in range(N_PAIRS)]
    t0 = time.time()
    res = eng.run(fresh, num_poses=NP_PER, seed=4)
    wall_b = time.time() - t0
    P._DeviceStager.ensure = orig_ensure
    P._dispatch_with_retry = orig_dispatch
    eng.close()

    mb = T.pop("bytes_mb", 0.0)
    accounted = sum(T.values())
    n = len(res)
    print(f"[probe] B all-miss SYNC sections: {n} poses in {wall_b:.2f}s "
          f"({n / wall_b:.1f} poses/s; serialization overhead expected)")
    print(f"  staged bytes: {mb:.1f} MB total "
          f"({mb / (N_PAIRS * NP_PER / BS):.1f} MB/batch)")
    for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v:7.2f} s "
              f"({v / (N_PAIRS * NP_PER / BS) * 1e3:6.0f} ms/batch)")
    print(f"  {'other (refs+harvest+py)':24s} {wall_b - accounted:7.2f} s")


if __name__ == "__main__":
    main()
