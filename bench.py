"""Benchmark: poses denoised per second per chip on the full sampler.

Runs the flagship score network (ns=48, 6 conv layers) inside the 20-step
reverse-SDE `lax.scan` on a realistic bucket (64 ligand atoms, 512 pocket
atoms, 64 residues — the PoseBusters median size class) and reports
poses/sec/chip.

`vs_baseline` divides by an ESTIMATED PyTorch reference throughput of
2.0 poses/sec on A100 (batch 16, ~8 s per 20-step batch loop including the
per-step host sync and python ligand updates; the repo publishes no number
— BASELINE.md notes it must be measured). Re-baseline when a measured A100
figure exists.
"""
import json
import os
import sys
import time

import numpy as np

REF_POSES_PER_SEC = 2.0  # estimated A100 reference (see module docstring)


def main():
    import jax

    from diffbindfr_tpu.data.sample import Buckets
    from diffbindfr_tpu.data.synthetic import synthetic_batch
    from diffbindfr_tpu.models import score_net as sn
    from diffbindfr_tpu.sampler import SamplerConfig, sample

    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    net_cfg = sn.ScoreNetConfig(
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        use_pallas=os.environ.get("BENCH_PALLAS", "1") == "1",
    )
    scfg = SamplerConfig()  # 22 steps scheduled, 20 executed

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
    print(
        json.dumps(
            {
                "metric": "poses_per_sec_per_chip_20step",
                "value": round(poses_per_sec, 3),
                "unit": "poses/s",
                "vs_baseline": round(poses_per_sec / REF_POSES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
