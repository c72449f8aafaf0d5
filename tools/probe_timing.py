"""Careful per-iteration timing of the cmT MLP-probe kernel."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32
h, wn_p, R = 144, 480, 1024


def kernel(e, w1, b1, w2, b2, out):
    hh = jnp.maximum(
        jnp.dot(w1[:], e[:], preferred_element_type=f32) + b1[:], 0.0)
    out[:] = jnp.dot(w2[:], hh, preferred_element_type=f32)


@jax.jit
def fn(e, w1, b1, w2, b2):
    return pl.pallas_call(
        kernel,
        grid=(8,),
        in_specs=[pl.BlockSpec((h, R), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((h, h), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((h, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((wn_p, h), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((wn_p, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((wn_p, R), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((wn_p, R), f32),
    )(e, w1, b1, w2, b2)


rng = np.random.default_rng(0)
args = [jnp.asarray(rng.normal(size=s), f32)
        for s in [(h, R), (h, h), (h, 1), (wn_p, h), (wn_p, 1)]]
for it in range(8):
    t0 = time.time()
    out = fn(*args)
    s = float(jnp.asarray(out).ravel()[0])
    print(f"iter {it}: {time.time()-t0:.3f}s (s={s:.3f})", flush=True)
