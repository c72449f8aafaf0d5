"""Per-kernel timing at flagship bucket shapes (B=16, 64/512).

Times each pair-conv kernel (vmapped over the batch) and the full batched
score-net forward for the chosen pallas layout, printing a ms table.
Usage: python tools/layer_prof.py [cmt|rowmajor|xla] [batch]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from diffbindfr_tpu.utils import compile_cache

compile_cache.enable()

from diffbindfr_tpu.nn import layers as L  # noqa: E402
from diffbindfr_tpu.nn import pallas_conv as pc  # noqa: E402
from diffbindfr_tpu.models import score_net as sn  # noqa: E402
from diffbindfr_tpu.data.sample import Buckets  # noqa: E402
from diffbindfr_tpu.data.synthetic import synthetic_batch  # noqa: E402

NS, NV = 48, 12
LADDER = f"{NS}x0e+{NV}x1o+{NV}x1e+{NS}x0o"
SED = GSN = 32
NL, NA, K = 64, 512, 16


def fence(x):
    return float(jnp.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def bench(fn, *args, n=10):
    for _ in range(2):
        fence(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        fence(out)
    return (time.time() - t0) / n * 1e3  # ms (includes ~25-30ms relay floor)


def kernel_table(layout: str, B: int):
    if layout == "cmt":
        from diffbindfr_tpu.nn import pallas_conv_t as PT

        mk_pair = PT.make_pair_conv_t
        mk_cross = PT.make_cross_conv_t
        mk_knn = PT.make_knn_conv_t
    else:
        mk_pair = pc.make_pair_conv
        mk_cross = pc.make_cross_conv
        mk_knn = pc.make_knn_conv

    cs = L.make_conv_spec(LADDER, "1x0e+1x1o+1x2e", LADDER, "sep")
    din = cs.dw.in1.dim
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    lig_pos = jnp.asarray(rng.normal(size=(B, NL, 3)) * 4, f32)
    atm_pos = jnp.asarray(rng.normal(size=(B, NA, 3)) * 10, f32)
    lig_cm = jnp.asarray(rng.normal(size=(B, NL, din)), f32)
    atm_cm = jnp.asarray(rng.normal(size=(B, NA, din)), f32)
    lmask = jnp.ones((B, NL), f32)
    amask = jnp.ones((B, NA), f32)
    cab = jnp.asarray((rng.random((B, NA)) > 0.9).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(B, SED)), f32)
    zt = jnp.zeros((B, NL), f32)
    bondf = jnp.asarray(rng.normal(size=(B, NL, NL, 10)), f32)
    bondm = jnp.asarray((rng.random((B, NL, NL)) > 0.9).astype(np.float32))
    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 8)
    wn = cs.dw.weight_numel
    h = 3 * NS
    params = {
        "emb_w1": jax.random.normal(ks[0], (10 + SED + GSN, NS)) * 0.2,
        "emb_b1": jax.random.normal(ks[1], (NS,)) * 0.1,
        "emb_w2": jax.random.normal(ks[2], (NS, NS)) * 0.2,
        "emb_b2": jax.random.normal(ks[3], (NS,)) * 0.1,
        "fc_w1": jax.random.normal(ks[4], (h, h)) * 0.2,
        "fc_b1": jax.random.normal(ks[5], (h,)) * 0.1,
        "fc_w2": jax.random.normal(ks[6], (h, wn)) * 0.2,
        "fc_b2": jax.random.normal(ks[7], (wn,)) * 0.1,
    }
    emb = {"l1": {"w": params["emb_w1"][10:], "b": params["emb_b1"]},
           "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
    fc = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
          "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}

    pair = mk_pair(cs.dw, din=din, ns=NS, sed=SED, gs_stop=5.0, gs_n=GSN,
                   edge_extra=10, exclude_self=True, cab_on_src=True,
                   interpret=False)
    cut = jnp.float32(5.0)
    pair_b = jax.jit(jax.vmap(
        lambda lp, lc, m, te, bf, bm: pair(
            lp, lp, lc, lc, m, m, m * 0, m * 0, te, cut, params, bf, bm)))
    ms = bench(pair_b, lig_pos, lig_cm, lmask, temb, bondf, bondm)
    print(f"  lig pair conv (64x64, B={B}): {ms:7.2f} ms")

    cross = mk_cross(cs.dw, din=din, ns=NS, sed=SED, gs_stop=32.0,
                     gs_n=GSN, interpret=False)
    cutc = jnp.float32(12.0)
    cross_b = jax.jit(jax.vmap(
        lambda lp, ap, lc, ac, lm, am, cb, te: cross(
            lp, ap, lc, ac, lm, am, cb, te, cutc, emb, fc, fc)))
    ms = bench(cross_b, lig_pos, atm_pos, lig_cm, atm_cm, lmask, amask,
               cab, temb)
    print(f"  dual cross conv (64x512, B={B}): {ms:7.2f} ms")

    knn = mk_knn(cs.dw, din=din, ns=NS, sed=SED, gs_stop=4.0, gs_n=GSN,
                 k=K, interpret=False)
    idx, valid = L.knn_edges(atm_pos[0], atm_pos[0], amask[0], amask[0],
                             K, 4.0, exclude_self=True)
    idxb = jnp.broadcast_to(idx, (B,) + idx.shape)
    validb = jnp.broadcast_to(valid, (B,) + valid.shape)
    knn_b = jax.jit(jax.vmap(
        lambda ap, ac, am, ix, va, te: knn(
            ap, ac, am, ix, va, te, {"emb": emb, "fc": fc})))
    ms = bench(knn_b, atm_pos, atm_cm, amask, idxb, validb, temb)
    print(f"  knn conv (512xk16, B={B}): {ms:7.2f} ms")


def forward_time(layout: str, B: int):
    cfg = sn.ScoreNetConfig(
        dropout=0.0, use_pallas=layout != "xla", pallas_layout=layout
        if layout != "xla" else "cmt")
    buckets = Buckets(n_lig=NL, n_lig_edges=160, n_tor=16, n_res=64,
                      n_atm=NA)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, B, buckets)
    batch = jax.tree.map(jnp.asarray, batch)
    params = sn.init_params(jax.random.PRNGKey(0), cfg)
    t = jnp.full((B,), 0.5)
    sig = sn.Sigmas(*[jnp.full((B,), v) for v in (1.2, 0.5, 1.0, 1.0)])
    fwd = jax.jit(lambda b, tt, sg: sn.apply_batched(params, cfg, b, tt, sg))
    ms = bench(fwd, batch, t, sig)
    print(f"  full score-net forward (6 layers, B={B}): {ms:7.2f} ms "
          f"(~{ms/6:.1f} ms/layer incl. heads amortized)")


if __name__ == "__main__":
    layout = sys.argv[1] if len(sys.argv) > 1 else "cmt"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    print(f"layout={layout} (times include the ~25-30 ms axon relay floor)")
    if layout != "xla":
        kernel_table(layout, B)
    forward_time(layout, B)
