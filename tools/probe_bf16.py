"""Measure VPU elementwise throughput: f32 vs bf16 on the real chip.

Decides whether bf16-packing the cmT depthwise-TP chain (the dominant
VPU work in the fused convs — ROUND3_NOTES roofline) is worth kernel
surgery: if packed bf16 madds are ~2x f32 on this chip, the chain's
[mul_p, 1024] blocks can run bf16 with 16-row padding; if Mosaic
promotes bf16 to f32 internally, the rewrite buys nothing.

Method per CLAUDE.md relay rules: one jit per config (never re-jit per
iteration), a fori_loop with input perturbation inside the kernel to
defeat CSE, scalar fetch per call; report per-madd time from the
difference between REPS=2R and REPS=R runs (cancels the relay floor and
load/store overhead).

Usage: python tools/probe_bf16.py [rows] [iters]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffbindfr_tpu.utils import compile_cache

compile_cache.enable()


def make_probe(dtype, rows, lanes, reps):
    def kernel(x_ref, w_ref, o_ref):
        def body(i, acc):
            # madd chain: acc = acc * w + x, perturbed by i to defeat CSE.
            # Scalar perturbation math stays f32 (Mosaic on this toolchain
            # fails to legalize SCALAR bf16 mulf) with one convert — only
            # the vector madd chain runs in `dtype`.
            pert = (i.astype(jnp.float32) * jnp.float32(1e-6)).astype(dtype)
            return acc * w_ref[:] + x_ref[:] + pert

        o_ref[:] = jax.lax.fori_loop(
            0, reps, body, jnp.zeros_like(x_ref))

    interp = jax.default_backend() == "cpu"

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, lanes), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp,
        )(x, w)

    return run


def time_config(dtype, rows, lanes, reps, iters):
    run = make_probe(dtype, rows, lanes, reps)
    x = jnp.asarray(np.random.RandomState(0).rand(rows, lanes), dtype)
    w = jnp.asarray(1.0 + np.random.RandomState(1).rand(rows, lanes) * 1e-3,
                    dtype)
    float(jnp.sum(run(x, w).astype(jnp.float32)))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(run(x, w).astype(jnp.float32)))  # scalar fetch
    return (time.perf_counter() - t0) / iters


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    lanes = 1024
    r1, r2 = 2000, 4000
    print(f"backend={jax.default_backend()} rows={rows} lanes={lanes}")
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        ta = time_config(dtype, rows, lanes, r1, iters)
        tb = time_config(dtype, rows, lanes, r2, iters)
        per_madd = (tb - ta) / (r2 - r1)
        elems = rows * lanes
        gops = elems * 2 / per_madd / 1e9 if per_madd > 0 else float("inf")
        print(f"{tag}: {ta*1e3:.2f} ms @ {r1} reps, {tb*1e3:.2f} ms @ {r2}"
              f" -> {per_madd*1e6:.2f} us/madd-sweep = {gops:.0f} GFLOP/s")


if __name__ == "__main__":
    main()
