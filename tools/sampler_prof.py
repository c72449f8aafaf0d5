"""Decompose the sampler step: network forward vs pose-update machinery.

Relay-safe methodology (CLAUDE.md): jit once, repeat the region inside a
single jit via lax.scan with input perturbation, fetch a scalar.

    python tools/sampler_prof.py [B]

Reports ms/step for (a) the full reverse-SDE step, (b) the score-net
forward alone, and isolated update pieces: modify_conformer (torsion
scan + Kabsch disentangle + rigid update), chi rebuild (alg-24 frames),
kabsch_align, apply_torsions.
"""
import sys
import time

import numpy as np

from diffbindfr_tpu.utils import compile_cache

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffbindfr_tpu.data.sample import Buckets  # noqa: E402
from diffbindfr_tpu.data.synthetic import synthetic_batch  # noqa: E402
from diffbindfr_tpu.geometry.kabsch import kabsch_align  # noqa: E402
from diffbindfr_tpu.geometry.torsion import (  # noqa: E402
    apply_torsion_updates, modify_conformer)
from diffbindfr_tpu.models import score_net as sn  # noqa: E402
from diffbindfr_tpu.sampler import (  # noqa: E402
    SamplerConfig, _pack_atoms, _rebuild_atom14, sample)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_STEPS = 20


def timed(label, fn, *args):
    jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = fn(*args)
    # scalar fetch defeats the relay's early block_until_ready return
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    dt = time.perf_counter() - t0
    print(f"{label:28s}: {dt / N_STEPS * 1000:8.2f} ms/step "
          f"({dt:.3f} s / {N_STEPS})", flush=True)
    return dt


def main():
    cfg = sn.ScoreNetConfig(
        compute_dtype="bfloat16", use_pallas=True, pallas_layout="cmt",
        pallas_dw_dtype="auto")
    scfg = SamplerConfig()
    buckets = Buckets(n_lig=64, n_lig_edges=160, n_tor=16, n_res=64,
                      n_atm=512)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, B, buckets)
    params = sn.init_params(jax.random.PRNGKey(0), cfg)

    # (a) full sampler (reference point, == bench.py)
    full = jax.jit(lambda k: sample(params, cfg, scfg, batch, k))
    timed("full sampler", full, jax.random.PRNGKey(1))

    # (b) forward only: scan N_STEPS score-net evals, perturbing t so the
    # loop cannot CSE-collapse
    sig = sn.Sigmas(*[jnp.full((B,), v) for v in (1.2, 0.5, 1.0, 1.0)])

    def fwd_scan(c0):
        def body(c, i):
            t = jnp.full((B,), 0.5) + c * 1e-6
            out = sn.apply_batched(params, cfg, batch, t, sig)
            return c + out.tr[0, 0], None

        c, _ = jax.lax.scan(body, c0, jnp.arange(N_STEPS))
        return c

    timed("score-net forward", jax.jit(fwd_scan), jnp.float32(0.0))

    tr = jnp.full((B, 3), 0.01)
    rot = jnp.full((B, 3), 0.01)
    tor = jnp.full((B, buckets.n_tor), 0.01)

    def mc_scan(p0):
        def body(p, i):
            out = jax.vmap(
                lambda s, pp, trp: modify_conformer(
                    pp, s.lig_mask.astype(bool),
                    trp, rot[0], jnp.stack([s.tor_src, s.tor_dst], -1),
                    s.rot_node_mask.astype(bool), tor[0],
                    s.tor_mask.astype(bool))
            )(batch, p, tr + p[:, :1, 0] * 1e-8)
            return out, None

        p, _ = jax.lax.scan(body, p0, jnp.arange(N_STEPS))
        return p

    timed("modify_conformer", jax.jit(mc_scan), batch.lig_ref_pos)

    chi = jnp.zeros((B, buckets.n_res, 4))

    def chi_scan(c0):
        def body(c, i):
            a14 = jax.vmap(_rebuild_atom14)(batch, c)
            atm = jax.vmap(_pack_atoms)(batch, a14)
            return c + atm[:, :1, :1] * 1e-8, None

        c, _ = jax.lax.scan(body, c0, jnp.arange(N_STEPS))
        return c

    timed("chi rebuild + pack", jax.jit(chi_scan), chi)

    def kab_scan(p0):
        def body(p, i):
            R, t = jax.vmap(kabsch_align)(
                p, batch.lig_ref_pos, batch.lig_mask)
            return p + R[:, :1, 0] * 1e-8, None

        p, _ = jax.lax.scan(body, p0, jnp.arange(N_STEPS))
        return p

    timed("kabsch_align", jax.jit(kab_scan), batch.lig_ref_pos)

    def tor_scan(p0):
        def body(p, i):
            out = jax.vmap(
                lambda s, pp: apply_torsion_updates(
                    pp, jnp.stack([s.tor_src, s.tor_dst], -1),
                    s.rot_node_mask.astype(bool), tor[0],
                    s.tor_mask.astype(bool))
            )(batch, p)
            return out, None

        p, _ = jax.lax.scan(body, p0, jnp.arange(N_STEPS))
        return p

    timed("apply_torsion_updates", jax.jit(tor_scan), batch.lig_ref_pos)


if __name__ == "__main__":
    main()
