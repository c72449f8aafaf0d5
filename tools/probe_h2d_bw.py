"""Measure raw H2D characteristics through the axon relay: per-transfer
floor and effective bandwidth, to attribute the staged engines' all-miss
stage walls (bytes vs dispatch count).

Run on the chip: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_h2d_bw.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}")

    # warm up the relay path
    jax.block_until_ready(jnp.asarray(np.ones(1024, np.float32)))

    for mb in (0.01, 0.1, 1.0, 6.4, 25.6, 102.4):
        n = int(mb * 1e6 / 4)
        x = np.random.default_rng(0).random(n).astype(np.float32)
        # fresh buffer each rep so no caching; fetch a scalar to force
        # completion (block_until_ready can return early via the relay)
        reps = 5 if mb < 10 else 3
        t0 = time.perf_counter()
        for r in range(reps):
            y = jnp.asarray(x + np.float32(r))
            float(y[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"  {mb:7.2f} MB  {dt * 1e3:8.1f} ms  "
              f"{mb / dt:8.1f} MB/s")

    # dispatch floor: tiny jitted op, scalar fetch
    f = jax.jit(lambda a: a.sum())
    xs = jnp.asarray(np.ones(8, np.float32))
    float(f(xs))
    t0 = time.perf_counter()
    for _ in range(20):
        float(f(xs))
    print(f"  dispatch+fetch floor: {(time.perf_counter() - t0) / 20 * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
