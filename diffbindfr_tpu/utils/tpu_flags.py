"""XLA flag helpers that must run BEFORE backend initialization."""
from __future__ import annotations

import os


def enable_fused_layer_vmem(kib: int = 65536) -> None:
    """Raise the scoped-VMEM compiler limit for the whole-layer fused
    kernel (nn/pallas_layer.py): its per-layer working set peaks above the
    16 MiB default (one-hot gather plane + pair transients + la scratch),
    well within the chip's 128 MiB VMEM. No-op if the flag is already
    set. Must be called before any jax backend init."""
    # NOTE: kept as a no-op shim — the local jax build rejects the
    # backend flag in XLA_FLAGS; the fused layer kernel instead raises its
    # own limit per-kernel via pltpu.CompilerParams(vmem_limit_bytes=...)
    # in nn/pallas_layer.py. Left in place so CLI call sites stay stable
    # if a future build accepts the flag form.
    return None
