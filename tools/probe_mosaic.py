"""Micro-probes for Mosaic constructs used by the cmT kernels."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32


def run(name, fn, want, *args):
    t0 = time.time()
    got = jax.block_until_ready(jax.jit(fn)(*args))
    t1 = time.time()
    for _ in range(5):
        got = jax.block_until_ready(jax.jit(fn)(*args))
    dt = (time.time() - t1) / 5
    err = np.max(np.abs(np.asarray(got) - np.asarray(want)))
    print(f"{name}: compile {t0 and t1-t0:.1f}s run {dt*1e3:.2f}ms "
          f"maxerr {err:.2e} {'OK' if err < 1e-4 else 'FAIL'}")


def probe_3d_accum():
    # out block (1, R, 8), accumulate row slices across inner grid dim
    R, NT = 64, 16

    def kernel(x, out):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out[0] = jnp.zeros_like(out[0])

        out[0, 8:24, :] += x[:, 0:8] * (j + 1)

    def fn(x):
        return pl.pallas_call(
            kernel,
            grid=(NT // 8, 2),
            in_specs=[pl.BlockSpec((16, 128), lambda i, j: (0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R, 8), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NT // 8, R, 8), f32),
        )(x)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 256)), f32)
    want = np.zeros((2, 64, 8), np.float32)
    for j in range(2):
        want[:, 8:24, :] += np.asarray(x[:, j * 128 : j * 128 + 8]) * (j + 1)
    run("3d_accum", fn, want, x)


def probe_onehot_matmul():
    NT, R = 64, 1024

    def kernel(a, out):
        i = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (NT, R), 0)
        pc = jax.lax.broadcasted_iota(jnp.int32, (NT, R), 1)
        tf = (rows == i * 8 + pc // 128).astype(f32)
        out[:] = jnp.dot(a[:], tf, preferred_element_type=f32)

    def fn(a):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((56, NT), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((56, R), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((56, R), f32),
        )(a)

    a = jnp.asarray(np.random.default_rng(0).normal(size=(56, NT)), f32)
    want = np.zeros((56, 1024), np.float32)
    an = np.asarray(a)
    for p in range(1024):
        want[:, p] = an[:, p // 128]
    run("onehot_matmul", fn, want, a)


def probe_tile_lanes():
    def kernel(a, out):
        out[:] = jnp.concatenate([a[:]] * 8, axis=1)

    def fn(a):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((48, 1024), f32),
        )(a)

    a = jnp.asarray(np.random.default_rng(0).normal(size=(48, 128)), f32)
    want = np.tile(np.asarray(a), (1, 8))
    run("tile_lanes", fn, want, a)


def probe_bcast2d():
    # [1, R] op [C, 1] -> [C, R]
    def kernel(d, offs, out):
        out[:] = jnp.exp(-0.5 * (d[:] - offs[:]) ** 2)

    def fn(d, offs):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((32, 1024), f32),
        )(d, offs)

    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=(1, 1024)), f32)
    offs = jnp.asarray(rng.normal(size=(32, 1)), f32)
    want = np.exp(-0.5 * (np.asarray(d) - np.asarray(offs)) ** 2)
    run("bcast2d", fn, want, d, offs)


def probe_4d_block():
    def kernel(b, out):
        out[:] = b[0, 0] * 2.0

    def fn(b):
        return pl.pallas_call(
            kernel,
            grid=(2, 2),
            in_specs=[pl.BlockSpec((1, 1, 16, 1024),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((16, 1024), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, 1024), f32),
        )(b)

    b = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 16, 1024)),
                    f32)
    want = np.asarray(b[1, 1]) * 2.0  # last grid step wins
    run("4d_block", fn, want, b)


def probe_msel():
    # [rows, 1024] @ [1024, 8] one-hot aggregation
    rows = 240

    def kernel(z, m, out):
        out[:] = jnp.dot(z[:], m[:], preferred_element_type=f32)

    def fn(z, m):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 8), f32),
        )(z, m)

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(rows, 1024)), f32)
    m = np.zeros((1024, 8), np.float32)
    m[np.arange(1024), np.arange(1024) // 128] = 1
    want = np.asarray(z) @ m
    run("msel", fn, want, z, jnp.asarray(m))


if __name__ == "__main__":
    which = sys.argv[1:] or ["3d", "onehot", "tile", "bcast", "4d", "msel"]
    if "3d" in which:
        probe_3d_accum()
    if "onehot" in which:
        probe_onehot_matmul()
    if "tile" in which:
        probe_tile_lanes()
    if "bcast" in which:
        probe_bcast2d()
    if "4d" in which:
        probe_4d_block()
    if "msel" in which:
        probe_msel()


def probe_precision():
    # HIGHEST-precision one-hot movement matmul: must be (near) exact
    NT, R = 64, 1024

    def kernel(a, out):
        i = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (NT, R), 0)
        pc = jax.lax.broadcasted_iota(jnp.int32, (NT, R), 1)
        tf = (rows == i * 8 + pc // 128).astype(f32)
        out[:] = jnp.dot(a[:], tf, preferred_element_type=f32,
                         precision=jax.lax.Precision.HIGHEST)

    def fn(a):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((56, NT), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((56, R), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((56, R), f32),
        )(a)

    a = jnp.asarray(np.random.default_rng(0).normal(size=(56, NT)), f32)
    want = np.zeros((56, 1024), np.float32)
    an = np.asarray(a)
    for p in range(1024):
        want[:, p] = an[:, p // 128]
    run("precision_onehot", fn, want, a)


def probe_dwloop():
    # the full depthwise path loop at flagship scale, iterated like the
    # real kernel (8 blocks), to isolate its cost
    from diffbindfr_tpu.nn import layers as L
    from diffbindfr_tpu.nn import pallas_conv_t as pt

    NS, NV = 48, 12
    cs = L.make_conv_spec(f"{NS}x0e+{NV}x1o+{NV}x1e+{NS}x0o",
                          "1x0e+1x1o+1x2e",
                          f"{NS}x0e+{NV}x1o+{NV}x1e+{NS}x0o", "sep")
    tmetas, ck_np, wn_p, din_p, dout_p = pt._tmetas(cs.dw)
    kdim = ck_np.shape[1]
    R = 1024

    def kernel(src, w, cb, mask, msel, out):
        out[0] = jnp.zeros_like(out[0])

        def agg(m, z):
            n_rows = m["d3"] * m["mul_p"]
            out[0, m["out_row"] : m["out_row"] + n_rows, :] += jnp.dot(
                z, msel[:], preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)

        pt._dw_paths_t(tmetas, src[:], w[:], cb[:], mask[:], agg)

    def fn(src, w, cb, mask, msel):
        return pl.pallas_call(
            kernel,
            grid=(8,),
            in_specs=[
                pl.BlockSpec((din_p, R), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((wn_p, R), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kdim, R), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, dout_p, 8), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, dout_p, 8), f32),
        )(src, w, cb, mask, msel)

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(din_p, R)), f32)
    w = jnp.asarray(rng.normal(size=(wn_p, R)), f32)
    cb = jnp.asarray(rng.normal(size=(kdim, R)), f32)
    mask = jnp.asarray((rng.random((1, R)) > 0.3).astype(np.float32))
    msel = np.zeros((R, 8), np.float32)
    msel[np.arange(R), np.arange(R) // 128] = 1
    t0 = time.time()
    got = jax.block_until_ready(jax.jit(fn)(src, w, cb, mask,
                                            jnp.asarray(msel)))
    t1 = time.time()
    for _ in range(5):
        got = jax.jit(fn)(src, w, cb, mask, jnp.asarray(msel))
        _ = float(jnp.asarray(got).ravel()[0])
    dt = (time.time() - t1) / 5
    print(f"dwloop (8 blocks): compile {t1-t0:.1f}s run {dt*1e3:.2f}ms")


def probe_mlps():
    # the two fc MLPs at flagship scale, 8 blocks
    h, wn_p, R = 144, 480, 1024

    def kernel(e, w1, b1, w2, b2, out):
        hh = jnp.maximum(
            jnp.dot(w1[:], e[:], preferred_element_type=f32) + b1[:], 0.0)
        out[:] = jnp.dot(w2[:], hh, preferred_element_type=f32)

    def fn(e, w1, b1, w2, b2):
        return pl.pallas_call(
            kernel,
            grid=(8,),
            in_specs=[pl.BlockSpec((h, R), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)] +
                     [pl.BlockSpec((h, h), lambda i: (0, 0),
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
    t0 = time.time()
    got = jax.block_until_ready(jax.jit(fn)(*args))
    t1 = time.time()
    for _ in range(5):
        got = jax.jit(fn)(*args)
        _ = float(jnp.asarray(got).ravel()[0])
    dt = (time.time() - t1) / 5
    print(f"mlps (8 blocks): compile {t1-t0:.1f}s run {dt*1e3:.2f}ms")


import sys as _sys
if __name__ == "__main__" and _sys.argv[1:] and _sys.argv[1] in (
        "prec", "dw", "mlp"):
    if _sys.argv[1] == "prec":
        probe_precision()
    elif _sys.argv[1] == "dw":
        probe_dwloop()
    else:
        probe_mlps()


def probe_abt():
    # weight-grad contraction: A [M, r] x B [N, r] over lanes -> [M, N]
    M, N, R = 480, 144, 1024

    def kernel(a, b, out):
        out[:] = jax.lax.dot_general(
            a[:], b[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    def fn(a, b):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), f32),
        )(a, b)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(M, R)), f32)
    b = jnp.asarray(rng.normal(size=(N, R)), f32)
    want = np.asarray(a) @ np.asarray(b).T
    run("abt", fn, want, a, b)
