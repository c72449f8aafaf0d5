"""Worker process for the 2-process `jax.distributed` integration test
(tests/test_dist_2proc.py). Run as:

    python tests/dist_worker.py <coordinator> <pid> <nprocs> <out.json>

Drives the real multi-host code path (parallel/dist.py +
parallel.make_mesh) under an actual 2-process CPU rendezvous — the thing
the virtual 8-device single-process mesh can never exercise. Reference
analogue: the launchers in druglib/core/runner/dist_utils.py:31-122.
"""
import json
import os
import sys


def main():
    coord, pid, nprocs, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    flags = os.environ.get("XLA_FLAGS", "")
    # 2 local CPU devices per process -> nprocs*2 global devices
    if "host_platform_device_count" in flags:
        import re

        flags = re.sub(r"--xla_force_host_platform_device_count=\d+",
                       "--xla_force_host_platform_device_count=2", flags)
    else:
        flags = (flags + " --xla_force_host_platform_device_count=2").strip()
    os.environ["XLA_FLAGS"] = flags

    import jax

    # never let a test worker attach to the axon TPU (CLAUDE.md: the env
    # var alone is ignored once the plugin registers)
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffbindfr_tpu import parallel as PX
    from diffbindfr_tpu.parallel import dist as D

    pi, pc = D.init_distributed(
        coordinator_address=coord, num_processes=nprocs, process_id=pid)
    assert (pi, pc) == (pid, nprocs), (pi, pc)
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 2 * nprocs

    # data-plane: per-host contiguous job shard (SLURM-array analogue)
    jobs = [f"job{i}" for i in range(10)]
    mine = D.shard_jobs_for_host(jobs, pi, pc)

    # model-plane: tiny sharded train step over the GLOBAL mesh — params
    # replicated, batch sharded dp, gradient allreduce inserted by pjit
    import jax.numpy as jnp

    mesh = PX.make_mesh()
    rows = 2 * len(jax.local_devices())  # 4 rows per host, 8 global
    local = (np.arange(rows * 3, dtype=np.float32).reshape(rows, 3)
             + 100.0 * pi)
    gbatch = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), local)
    w = jax.device_put(jnp.ones((3,), jnp.float32), PX.replicated(mesh))

    @jax.jit
    def train_step(w, x):
        def loss_fn(w):
            return jnp.mean((x @ w) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(w)
        return loss, g, w - 0.1 * g

    loss, g, w2 = train_step(w, gbatch)

    # expected values on the FULL global batch, recomputed host-locally
    full = np.concatenate([
        np.arange(rows * 3, dtype=np.float32).reshape(rows, 3) + 100.0 * p
        for p in range(nprocs)
    ])
    y = full @ np.ones(3, np.float32)
    exp_loss = float(np.mean(y**2))
    exp_grad = 2.0 * full.T @ y / len(y)

    # ---- sharded SAMPLER under the real rendezvous (VERDICT r4 task 8):
    # the full jitted reverse-SDE over the global 2-host mesh, replica
    # batch split dp; per-host merged pose results must equal a
    # single-process run of the same global batch (the reference's
    # multi_gpu_inference result-collection contract,
    # druglib/core/runner/engine/test_utils.py:45).
    from diffbindfr_tpu.data.sample import Buckets
    from diffbindfr_tpu.data.synthetic import synthetic_batch
    from diffbindfr_tpu.models import score_net as sn
    from diffbindfr_tpu.sampler import SamplerConfig, sample

    net_cfg = sn.ScoreNetConfig(ns=8, nv=4, num_conv_layers=2, dropout=0.0)
    scfg = SamplerConfig(inference_steps=4, actual_steps=2)
    buckets = Buckets(n_lig=12, n_lig_edges=28, n_tor=4, n_res=6, n_atm=32)
    nrep = 2 * len(jax.devices())  # 2 replicas per global device
    gbatch_np = synthetic_batch(np.random.default_rng(7), nrep, buckets)
    rows_per = nrep // pc
    sharding = NamedSharding(mesh, P("dp"))
    gbatch2 = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x[pi * rows_per:(pi + 1) * rows_per])),
        gbatch_np,
    )
    params = sn.init_params(jax.random.PRNGKey(3), net_cfg)
    params = jax.device_put(params, PX.replicated(mesh))
    sample_fn = jax.jit(
        lambda p, b, k: sample(p, net_cfg, scfg, b, k),
        in_shardings=(NamedSharding(mesh, P()), sharding,
                      NamedSharding(mesh, P())),
        out_shardings=sharding,
    )
    res = sample_fn(params, gbatch2, jax.random.PRNGKey(11))
    # merge this host's addressable shards, recording global row ranges
    shard_rows, shard_vals = [], []
    for s in res.lig_pos.addressable_shards:
        shard_rows.append(int(s.index[0].start or 0))
        shard_vals.append(np.asarray(s.data))
    order = np.argsort(shard_rows)
    local_rows = [shard_rows[i] for i in order]
    local_lig = np.concatenate([shard_vals[i] for i in order])

    with open(out_path, "w") as fh:
        json.dump({
            "pid": pi,
            "nprocs": pc,
            "jobs": mine,
            "is_main": bool(D.is_main_process()),
            "loss": float(loss),
            "grad": np.asarray(g).tolist(),
            "w2": np.asarray(w2).tolist(),
            "exp_loss": exp_loss,
            "exp_grad": exp_grad.tolist(),
            "n_global_devices": len(jax.devices()),
            "sampler_rows": local_rows,
            "sampler_lig_pos": local_lig.tolist(),
            "sampler_nrep": nrep,
        }, fh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
