"""XLA flag helpers that must run BEFORE backend initialization."""
from __future__ import annotations

import os


def enable_fused_layer_vmem(kib: int = 65536) -> None:
    """Raise the scoped-VMEM compiler limit for the whole-layer fused
    kernel (nn/pallas_layer.py): its per-layer working set peaks above the
    16 MiB default (one-hot gather plane + pair transients + la scratch),
    well within the chip's 128 MiB VMEM. No-op if the flag is already
    set. Must be called before any jax backend init."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "scoped_vmem_limit" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_tpu_scoped_vmem_limit_kib={kib}"
        ).strip()
