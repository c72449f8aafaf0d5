"""Benchmark: poses denoised per second per chip on the full sampler.

Runs the flagship score network (ns=48, 6 conv layers) inside the 20-step
reverse-SDE `lax.scan` on a realistic bucket (64 ligand atoms, 512 pocket
atoms, 64 residues — the PoseBusters median size class) and reports
poses/sec/chip.

`vs_baseline` divides by the reference's only MEASURED in-repo throughput:
the authors' AF2-demo notebook logs "Model inference is done which tasks
76.13553285598755s" for 40 poses at `-np 40 -bs 16` (the same 20-step
sampler stage this benchmark times) — 40/76.136 = 0.525 poses/s
(`/root/reference/notebooks/AF2_model_docking.ipynb`, cell 11 output,
run dated 2024-03-13 on the authors' CUDA-11.7-era GPU; the exact GPU
model is not recorded in the notebook). Caveats: (a) the GPU is
unidentified — on an A100 the reference would be faster, but its per-step
python ligand updates + host syncs (scFlex.py:150-230) bound it well below
linear GPU scaling; (b) the reference number includes its host-side
per-batch work, ours is pure device sampling — both are the "model
inference" stage wall-clock. The reference stack (PyTorch+PyG+e3nn CUDA
wheels) is not installable in this zero-egress environment, so a
same-hardware rerun is impossible here; this measured figure replaces the
round-1 estimate of 2.0 (see VERDICT.md weak #1).
"""
import json
import os
import sys
import time

import numpy as np

REF_POSES_PER_SEC = 40.0 / 76.13553285598755  # measured; see module docstring


def main():
    import jax

    from diffbindfr_tpu.utils import compile_cache

    compile_cache.enable()

    from diffbindfr_tpu.data.sample import Buckets
    from diffbindfr_tpu.data.synthetic import synthetic_batch
    from diffbindfr_tpu.models import score_net as sn
    from diffbindfr_tpu.sampler import SamplerConfig, sample

    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    net_cfg = sn.ScoreNetConfig(
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        use_pallas=os.environ.get("BENCH_PALLAS", "1") == "1",
        fused_layer=os.environ.get("BENCH_FUSED", "0") == "1",
        pallas_layout=os.environ.get("BENCH_LAYOUT", "cmt"),
        pallas_dw_dtype=os.environ.get("BENCH_DW", "auto"),
    )
    # 22 steps scheduled, 20 executed by default. BENCH_STEPS measures the
    # reduced-step frontier (eval_r3_st14: st=14 holds oracle quality on the
    # 5-complex protocol); the HEADLINE metric stays the 20-step number for
    # comparability with the reference's 20-step sampler stage.
    bench_steps = int(os.environ.get("BENCH_STEPS", "20"))
    # Match the production call sites (eval_cli/cli/serve pair
    # actual_steps=N with inference_steps=N+2) so the benchmarked schedule
    # is exactly the one eval measures; also keeps actual<=inference for
    # any BENCH_STEPS value.
    scfg = SamplerConfig(inference_steps=bench_steps + 2,
                         actual_steps=bench_steps)

    buckets = Buckets(n_lig=64, n_lig_edges=160, n_tor=16, n_res=64, n_atm=512)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, batch_size, buckets)
    params = sn.init_params(jax.random.PRNGKey(0), net_cfg)

    run = jax.jit(lambda k: sample(params, net_cfg, scfg, batch, k))
    # compile + warmup
    jax.block_until_ready(run(jax.random.PRNGKey(0)))

    n_iter = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = run(jax.random.PRNGKey(i + 1))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    poses_per_sec = batch_size * n_iter / dt

    # ---- model FLOPs + MFU. XLA's cost analysis sees through the pure-XLA
    # lowering of the same math (pallas custom calls would report 0), so
    # count one batched score-net forward on the XLA path and scale by the
    # executed sampler steps. MFU is quoted against the v5e bf16 MXU peak
    # (197 TFLOP/s); the pallas trunk computes in f32, so this is the
    # conservative (lower) utilization number.
    extra = {}
    if os.environ.get("BENCH_MFU", "1") == "1":
        try:
            import dataclasses

            import jax.numpy as jnp

            xcfg = dataclasses.replace(
                net_cfg, use_pallas=False, dropout=0.0)
            t_ = jnp.full((batch_size,), 0.5)
            sig = sn.Sigmas(*[jnp.full((batch_size,), v)
                              for v in (1.2, 0.5, 1.0, 1.0)])
            fwd = jax.jit(
                lambda b, tt, sg: sn.apply_batched(params, xcfg, b, tt, sg))
            ca = fwd.lower(batch, t_, sig).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            n_steps = bench_steps  # executed reverse-SDE steps
            fpp = float(ca["flops"]) / batch_size * n_steps
            peak = 197e12
            extra = {
                "model_flops_per_pose": round(fpp / 1e9, 2),  # GF
                "mfu_vs_bf16_peak": round(
                    poses_per_sec * fpp / peak, 4),
            }
        except Exception as e:  # cost analysis is best-effort
            extra = {"mfu_error": str(e)[:80]}

    result = {
        "metric": f"poses_per_sec_per_chip_{bench_steps}step",
        "value": round(poses_per_sec, 3),
        "unit": "poses/s",
        "vs_baseline": round(poses_per_sec / REF_POSES_PER_SEC, 3),
        **extra,
    }
    if bench_steps != 20:
        # The reference throughput is a 20-step measurement; make the step
        # mismatch explicit in the JSON itself (ADVICE r3): the normalized
        # ratio scales our N-step throughput to equal per-step work.
        result["vs_baseline_step_normalized"] = round(
            poses_per_sec * bench_steps / 20.0 / REF_POSES_PER_SEC, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
