"""Mosaic feasibility + rate probe for the MXU depthwise-chain rewrite
(VERDICT r3 task 3).

Three questions, answered on the real chip:
  1. legality: do static single-lane value slices ([128, 8][:, k:k+1]),
     small lane concats ([128,1] x 9 -> [128, 9]), and small lane
     reductions lower on this Mosaic toolchain? (They are the building
     blocks of the transposed sh/CG construction.)
  2. rate A: the current VPU depthwise chain at real ladder shapes
     (bf16 packed madds over [mul_p, 128] blocks) + per-path aggregation.
  3. rate B: the proposed per-path MXU contraction
     [mul_p, d1*128] @ [d1*128, d3*tplp] (bf16 in, f32 accumulate),
     including the [128, *] RHS build and a one-hot pad matmul standing
     in for output placement.

Timing: the axon relay floor is ~25 ms/dispatch, so the kernels run a
large grid (REPS steps) over NBLK cyclic input blocks inside ONE call,
and _time fetches a scalar to host per call.

Usage:  python tools/probe_mxu_ops.py [legality|chain|both]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from diffbindfr_tpu.nn import irreps as IR  # noqa: E402
from diffbindfr_tpu.nn.pallas_conv_t import _tmetas  # noqa: E402

REPS = 4096  # grid steps per call
NBLK = 64    # distinct input blocks (cycled via index map)


def _time(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(out[0]).ravel()[0])  # force a real host fetch
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        float(np.asarray(out[0]).ravel()[0])
    return (time.time() - t0) / n


def real_spec():
    """The score net's dw TP spec at flagship widths (ns=48, nv=12)."""
    node = "48x0e+12x1o+12x1e+12x0o"
    return IR.compile_dw_tensor_product(node, "1x0e+1x1o+1x2e", 2)


# ---------------------------------------------------------------------------
# legality kernel
# ---------------------------------------------------------------------------


def legality():
    def kernel(a_ref, out_ref):
        a = a_ref[:]  # [128, 8]
        cols = [a[:, k : k + 1] for k in range(3)]
        x, y, z = cols
        sh = jnp.concatenate(
            [jnp.ones_like(x), x, y, z, x * y, y * z, z * z, x * z,
             x * x - y * y],
            axis=1,
        )  # [128, 9]
        s = jnp.sum(a * a, axis=1, keepdims=True)  # [128, 1]
        out_ref[:] = jnp.concatenate(
            [sh, s, jnp.zeros_like(a[:, 0:6])], axis=1)

    a = jnp.asarray(np.random.default_rng(0).normal(size=(128, 8)),
                    jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 16), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
    got = np.asarray(out)
    an = np.asarray(a)
    x, y, z = an[:, 0], an[:, 1], an[:, 2]
    exp = np.stack([np.ones_like(x), x, y, z, x * y, y * z, z * z, x * z,
                    x * x - y * y], axis=1)
    err = np.abs(got[:, 0:9] - exp).max()
    err2 = np.abs(got[:, 9] - (an * an).sum(1)).max()
    print(f"[legality] OK — sh err {err:.2e}, lane-reduce err {err2:.2e}",
          flush=True)


# ---------------------------------------------------------------------------
# chain rate kernels (A: current VPU form, B: MXU contraction)
# ---------------------------------------------------------------------------


def make_chain_kernels(tpl=4):
    spec = real_spec()
    tmetas, ck_np, wn_p, din_p, dout_p = _tmetas(spec)
    kdim = int(ck_np.shape[1])
    r = 128
    bf16 = jnp.bfloat16

    msel = np.zeros((r, max(tpl, 8)), np.float32)
    msel[np.arange(r), (np.arange(r) * tpl) // r] = 1.0
    tplp = msel.shape[1]
    d3max = max(m["d3"] for m in tmetas)
    max_cols = d3max * tplp
    # per-d3 one-hot pad: [d3*tplp, max_cols] (output placement stand-in);
    # passed as kernel INPUTS (Mosaic rejects captured non-scalar consts)
    pad_d3s = sorted({m["d3"] for m in tmetas if m["d3"] < d3max})
    pad_np = [np.eye(d3 * tplp, max_cols, dtype=np.float32)
              for d3 in pad_d3s]
    pad_slot = {d3: i for i, d3 in enumerate(pad_d3s)}

    def kern_vpu(src_ref, w_ref, cb_ref, m8_ref, out_ref):
        f32 = jnp.float32
        src = src_ref[0].astype(bf16)
        w = w_ref[0].astype(bf16)
        cb = cb_ref[0].astype(bf16)
        m8 = m8_ref[:].astype(bf16)
        out_ref[0] = jnp.zeros_like(out_ref[0])
        for m in tmetas:
            mp, d1, d3 = m["mul_p"], m["d1"], m["d3"]
            wp = w[m["w_row"] : m["w_row"] + mp, :]
            bs = [src[r0 : r0 + mp, :] * wp for r0 in m["src_rows"]]
            zs = []
            for k in range(d3):
                zk = None
                for i2 in range(d1):
                    c = cb[m["cb_off"] + i2 * d3 + k
                           : m["cb_off"] + i2 * d3 + k + 1, :]
                    t = bs[i2] * c
                    zk = t if zk is None else zk + t
                zs.append(zk)
            z = jnp.concatenate(zs, axis=0) if d3 > 1 else zs[0]
            mk = jnp.dot(z, m8, preferred_element_type=f32)
            n_rows = d3 * mp
            out_ref[0, m["out_row"] : m["out_row"] + n_rows, :] += mk

    def kern_mxu(src_ref, w_ref, cbT_ref, m8_ref, *rest):
        pad_refs, out_ref = rest[:-1], rest[-1]
        f32 = jnp.float32
        src = src_ref[0].astype(bf16)
        w = w_ref[0].astype(bf16)
        cbT = cbT_ref[0].astype(bf16)  # [128, kdim]
        m8 = m8_ref[:].astype(bf16)   # [128, tplp]
        out_ref[0] = jnp.zeros_like(out_ref[0])
        for m in tmetas:
            mp, d1, d3 = m["mul_p"], m["d1"], m["d3"]
            wp = w[m["w_row"] : m["w_row"] + mp, :]
            lhs = jnp.concatenate(
                [src[r0 : r0 + mp, :] * wp for r0 in m["src_rows"]], axis=1
            )  # [mp, d1*128]
            rows = []
            for i2 in range(d1):
                cols = [
                    cbT[:, m["cb_off"] + i2 * d3 + k
                        : m["cb_off"] + i2 * d3 + k + 1] * m8
                    for k in range(d3)
                ]
                rows.append(jnp.concatenate(cols, axis=1)
                            if d3 > 1 else cols[0])
            rhs = (jnp.concatenate(rows, axis=0)
                   if d1 > 1 else rows[0])  # [d1*128, d3*tplp]
            mk = jnp.dot(lhs, rhs, preferred_element_type=f32)
            if d3 < d3max:  # pad columns via one-hot (placement stand-in)
                mk = jnp.dot(mk.astype(bf16),
                             pad_refs[pad_slot[d3]][:].astype(bf16),
                             preferred_element_type=f32)
            out_ref[0, m["w_row"] : m["w_row"] + mp, :] += mk

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(NBLK, din_p, r)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(NBLK, wn_p, r)), jnp.float32)
    cb = jnp.asarray(rng.normal(size=(NBLK, kdim, r)), jnp.float32)
    cbT = jnp.swapaxes(cb, -1, -2)
    m8j = jnp.asarray(msel)

    cyc = lambda shp: pl.BlockSpec((1,) + shp, lambda i: (i % NBLK, 0, 0),
                                   memory_space=pltpu.VMEM)
    outm = lambda shp: pl.BlockSpec((1,) + shp, lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    vm2 = lambda shp: pl.BlockSpec(shp, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)

    @jax.jit
    def run_vpu(src, w, cb):
        return pl.pallas_call(
            kern_vpu, grid=(REPS,),
            in_specs=[cyc((din_p, r)), cyc((wn_p, r)), cyc((kdim, r)),
                      vm2((r, tplp))],
            out_specs=outm((dout_p, tplp)),
            out_shape=jax.ShapeDtypeStruct((REPS, dout_p, tplp),
                                           jnp.float32),
        )(src, w, cb, m8j)

    pad_j = [jnp.asarray(p) for p in pad_np]

    @jax.jit
    def run_mxu(src, w, cbT):
        return pl.pallas_call(
            kern_mxu, grid=(REPS,),
            in_specs=[cyc((din_p, r)), cyc((wn_p, r)), cyc((r, kdim)),
                      vm2((r, tplp))]
            + [vm2(p.shape) for p in pad_np],
            out_specs=outm((wn_p, max_cols)),
            out_shape=jax.ShapeDtypeStruct((REPS, wn_p, max_cols),
                                           jnp.float32),
        )(src, w, cbT, m8j, *pad_j)

    return (run_vpu, (src, w, cb)), (run_mxu, (src, w, cbT)), tmetas, tplp


def chain():
    (fa, aa), (fb, ab), tmetas, tplp = make_chain_kernels()
    ta = _time(fa, *aa)
    tb = _time(fb, *ab)
    chain_madds = sum(
        m["mul_p"] * 128 * m["d1"] * (1 + 2 * m["d3"]) for m in tmetas)
    mxu_flops = sum(
        2 * m["mul_p"] * m["d1"] * 128 * m["d3"] * tplp for m in tmetas)
    print(f"[chain] paths={len(tmetas)} REPS={REPS}")
    print(f"[chain] VPU-form {ta*1e3:.2f} ms "
          f"({chain_madds * REPS / ta / 1e12:.2f} Tmadd/s)", flush=True)
    print(f"[chain] MXU-form {tb*1e3:.2f} ms "
          f"({mxu_flops * REPS / tb / 1e12:.2f} TF/s eff) "
          f"-> speedup x{ta / tb:.2f}", flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    if what in ("legality", "both"):
        legality()
    if what in ("chain", "both"):
        chain()
