"""On-chip Mosaic smoke test for the transposed (cmT) kernels.

Runs each cmT kernel at flagship size (ns=48, nv=12, full ladder,
64/512 bucket) on the real TPU, checks values against the XLA twin, and
prints rough per-call timings. Usage:
    python tools/smoke_cmt.py [pair|cross|knn|all]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from diffbindfr_tpu.nn import layers as L
from diffbindfr_tpu.nn import pallas_conv as pc
from diffbindfr_tpu.nn import pallas_conv_t as pt

NS, NV = 48, 12
LADDER = f"{NS}x0e+{NV}x1o+{NV}x1e+{NS}x0o"
SH = "1x0e+1x1o+1x2e"
SED = GSN = 32
NL, NA = 64, 512
K = 16


def build():
    rng = np.random.default_rng(0)
    cs = L.make_conv_spec(LADDER, SH, LADDER, "sep")
    din = cs.dw.in1.dim
    lig_pos = jnp.asarray(rng.normal(size=(NL, 3)) * 4, jnp.float32)
    atm_pos = jnp.asarray(rng.normal(size=(NA, 3)) * 10, jnp.float32)
    lig_x = jnp.asarray(rng.normal(size=(NL, din)), jnp.float32)
    atm_x = jnp.asarray(rng.normal(size=(NA, din)), jnp.float32)
    lig_mask = jnp.asarray((rng.random(NL) > 0.1).astype(np.float32))
    atm_mask = jnp.asarray((rng.random(NA) > 0.1).astype(np.float32))
    cab = jnp.asarray((rng.random(NA) > 0.9).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(SED,)), jnp.float32)
    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 8)
    wn = cs.dw.weight_numel
    h = 3 * NS
    params = {
        "emb_w1": jax.random.normal(ks[0], (SED + GSN, NS)) * 0.2,
        "emb_b1": jax.random.normal(ks[1], (NS,)) * 0.1,
        "emb_w2": jax.random.normal(ks[2], (NS, NS)) * 0.2,
        "emb_b2": jax.random.normal(ks[3], (NS,)) * 0.1,
        "fc_w1": jax.random.normal(ks[4], (h, h)) * 0.2,
        "fc_b1": jax.random.normal(ks[5], (h,)) * 0.1,
        "fc_w2": jax.random.normal(ks[6], (h, wn)) * 0.2,
        "fc_b2": jax.random.normal(ks[7], (wn,)) * 0.1,
    }
    return cs, lig_pos, atm_pos, lig_x, atm_x, lig_mask, atm_mask, cab, \
        temb, params


def timeit(fn, *args, n=20):
    # block_until_ready can return before real completion through the axon
    # relay; a scalar host fetch is the only reliable fence. Warm up with
    # fetches (absorbs the remote Mosaic compile), then time.
    for _ in range(3):
        out = fn(*args)
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        s = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.time() - t0) / n
    return out, dt


def check(tag, got, want, tol=6e-3):
    # default MXU precision rounds f32 matmul inputs to bf16 (~4e-3
    # relative); kernel and twin round differently, so expect bf16-level
    # divergence here. Structural exactness is verified separately by
    # running with JAX_DEFAULT_MATMUL_PRECISION=highest (rel_err ~2e-7,
    # see ROUND3_NOTES).
    got, want = np.asarray(got), np.asarray(want)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    print(f"  {tag}: rel_err={err:.2e} {'OK' if err < tol else 'FAIL'}")
    return err < tol


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    (cs, lig_pos, atm_pos, lig_x, atm_x, lig_mask, atm_mask, cab,
     temb, params) = build()
    cutoff = jnp.float32(12.0)
    tcm = pc.cm_from_irreps(cs.dw.in1, lig_x)
    acm = pc.cm_from_irreps(cs.dw.in1, atm_x)
    zt = jnp.zeros_like(lig_mask)
    ok = True

    if which in ("pair", "all"):
        kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0,
                  gs_n=GSN, edge_extra=10, exclude_self=True,
                  cab_on_src=True)
        rng = np.random.default_rng(5)
        bondf = jnp.asarray(rng.normal(size=(NL, NL, 10)), jnp.float32)
        bondm = jnp.asarray((rng.random((NL, NL)) > 0.9).astype(np.float32))
        p = dict(params)
        p["emb_w1"] = jnp.asarray(
            rng.normal(size=(10 + SED + GSN, NS)) * 0.2, jnp.float32)
        conv = jax.jit(pt.make_pair_conv_t(cs.dw, interpret=False, **kw))
        twin = jax.jit(pc.make_pair_twin(cs.dw, **kw))
        t0 = time.time()
        got, dt = timeit(conv, lig_pos, lig_pos, tcm, tcm, lig_mask,
                         lig_mask, zt, zt, temb, cutoff, p, bondf, bondm)
        print(f"pair_t: compile+first {time.time()-t0-dt*20:.1f}s, "
              f"{dt*1e3:.2f} ms/call")
        want = twin(lig_pos, lig_pos, tcm, tcm, lig_mask, lig_mask,
                    zt, zt, temb, cutoff, p, bondf, bondm)
        ok &= check("pair", got, want)

    if which in ("cross", "all"):
        kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=32.0, gs_n=GSN)
        emb = {"l1": {"w": params["emb_w1"], "b": params["emb_b1"]},
               "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
        fc_al = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
                 "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}
        fc_la = jax.tree.map(lambda x: x * 0.7 + 0.01, fc_al)
        conv = jax.jit(pt.make_cross_conv_t(cs.dw, interpret=False, **kw))
        twin = jax.jit(pc.make_cross_twin(cs.dw, **kw))
        t0 = time.time()
        got, dt = timeit(conv, lig_pos, atm_pos, tcm, acm, lig_mask,
                         atm_mask, cab, temb, cutoff, emb, fc_al, fc_la)
        print(f"cross_t: compile+first {time.time()-t0-dt*20:.1f}s, "
              f"{dt*1e3:.2f} ms/call")
        want = twin(lig_pos, atm_pos, tcm, acm, lig_mask, atm_mask,
                    cab, temb, cutoff, emb, fc_al, fc_la)
        ok &= check("cross al", got[0], want[0])
        ok &= check("cross la", got[1], want[1])

    if which in ("knn", "all"):
        idx, valid = L.knn_edges(atm_pos, atm_pos, atm_mask, atm_mask,
                                 K, 4.0, exclude_self=True)
        emb = {"l1": {"w": params["emb_w1"], "b": params["emb_b1"]},
               "l2": {"w": params["emb_w2"], "b": params["emb_b2"]}}
        fc = {"l1": {"w": params["fc_w1"], "b": params["fc_b1"]},
              "l2": {"w": params["fc_w2"], "b": params["fc_b2"]}}
        kw = dict(din=cs.dw.in1.dim, ns=NS, sed=SED, gs_stop=4.0,
                  gs_n=GSN, k=K)
        conv = jax.jit(pt.make_knn_conv_t(cs.dw, interpret=False, **kw))
        twin = jax.jit(pc.make_knn_twin(cs.dw, **kw))
        t0 = time.time()
        got, dt = timeit(conv, atm_pos, acm, atm_mask, idx, valid, temb,
                         {"emb": emb, "fc": fc})
        print(f"knn_t: compile+first {time.time()-t0-dt*20:.1f}s, "
              f"{dt*1e3:.2f} ms/call")
        want = twin(atm_pos, acm, atm_mask, idx, valid, temb,
                    {"emb": emb, "fc": fc})
        ok &= check("knn", got, want)

    print("ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
