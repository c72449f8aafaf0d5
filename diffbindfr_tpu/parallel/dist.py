"""Multi-host runtime helpers.

Replaces the reference's launcher zoo (druglib/core/runner/dist_utils.py:
31-122: pytorch env / MPI / SLURM rendezvous + NCCL process groups) with
the JAX runtime: `jax.distributed.initialize` discovers peers from the
standard env (or explicit args), after which every host sees the global
device set and pjit/NamedSharding handle all communication.

The reference's out-of-band SLURM job arrays (README.md:130-150) map to
`shard_jobs_for_host`: each host takes a contiguous slice of the job
table and keeps its own featurization cache; the mesh is only needed for
the model, not the data plumbing.
"""
from __future__ import annotations

import os


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple:
    """Initialize multi-host JAX (no-op for single process). Returns
    (process_index, process_count)."""
    import jax

    explicit = coordinator_address is not None
    env = any(
        k in os.environ
        for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                  "SLURM_JOB_NUM_NODES", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if explicit or (env and _env_world_size() > 1):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def _env_world_size() -> int:
    for k in ("SLURM_JOB_NUM_NODES", "NUM_PROCESSES", "WORLD_SIZE"):
        if k in os.environ:
            try:
                return int(os.environ[k])
            except ValueError:
                pass
    return 1


def shard_jobs_for_host(jobs: list, process_index: int | None = None,
                        process_count: int | None = None) -> list:
    """Contiguous per-host slice of the job table (the data-plane analogue
    of the reference's SLURM array pattern)."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    n = len(jobs)
    per = (n + pc - 1) // pc
    return jobs[pi * per : (pi + 1) * per]


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0
