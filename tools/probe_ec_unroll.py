"""On-chip probe: EC minimize throughput vs (tor_unroll, step_unroll).

The EC stage (vina.minimize_batch, 150 steps) was measured
serialization-bound in its inner loop — per-torsion [NL, 3] micro-ops
sequenced T times per energy eval, doubled by grad, x150 steps — so
bigger batches did not help (ROUND3_NOTES screen table). This probe
times the jitted 150-step minimize on the real chip for the 64/512
bucket at B=16 across unroll settings.

Relay-safe methodology (CLAUDE.md): one jit per config, warm-up call
fetches a scalar, then timed calls each fetch a scalar to host.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
from diffbindfr_tpu.chem.mol import perceive
from diffbindfr_tpu.chem.protein_feats import build_pocket_record
from diffbindfr_tpu.data.sample import choose_bucket
from diffbindfr_tpu.io.pdb import parse_pdb
from diffbindfr_tpu.io.sdf import parse_sdf
from diffbindfr_tpu.ops import vina

FWD = "/root/reference/examples/forward"


def main():
    B = int(os.environ.get("PROBE_B", "16"))
    steps = int(os.environ.get("PROBE_STEPS", "150"))
    prot = parse_pdb(f"{FWD}/3dbs_protein.pdb")
    lig = featurize_ligand(
        perceive(parse_sdf(f"{FWD}/3dbs_protein_crystal.sdf")[0]), "3dbs")
    pocket = build_pocket_record(prot, lig.pos, cutoff=12.0)
    lig.pos = lig.pos - pocket.center
    b = choose_bucket(lig.num_atoms, lig.bonds.shape[0] * 2,
                      lig.num_torsions, pocket.num_res,
                      int(pocket.atom14_mask.sum()))
    print(f"bucket: n_lig={b.n_lig} n_tor={b.n_tor} n_atm={b.n_atm} B={B} "
          f"steps={steps}")
    vl = vina.build_ligand(lig, b.n_lig, b.n_tor)
    vr = vina.build_receptor(pocket, b.n_atm)
    bl = jax.tree.map(lambda x: jnp.asarray(np.stack([x] * B)), vl)
    br = jax.tree.map(lambda x: jnp.asarray(np.stack([x] * B)), vr)
    rng = np.random.default_rng(0)
    lp = jnp.asarray(
        np.stack([lig.pos + rng.normal(size=lig.pos.shape) * 0.5
                  for _ in range(B)]).astype(np.float32))
    lp = jnp.pad(lp, ((0, 0), (0, b.n_lig - lig.num_atoms), (0, 0)))

    configs = [
        ("baseline (tor=1, step=1)", dict(tor_unroll=1, step_unroll=1)),
        ("tor=full", dict(tor_unroll=True, step_unroll=1)),
        ("tor=full step=5", dict(tor_unroll=True, step_unroll=5)),
        ("tor=full step=10", dict(tor_unroll=True, step_unroll=10)),
    ]
    results = {}
    for name, kw in configs:
        fn = jax.jit(lambda x, kw=kw: vina.minimize_batch(
            x, bl, br, steps=steps, **kw))
        t0 = time.time()
        pos, aff = fn(lp)
        a0 = float(aff[0])  # scalar fetch = real completion
        t_compile = time.time() - t0
        ts = []
        for _ in range(4):
            t0 = time.time()
            pos, aff = fn(lp)
            float(aff.sum())
            ts.append(time.time() - t0)
        t = min(ts)
        results[name] = (t, a0)
        print(f"{name:28s} compile {t_compile:6.1f}s  "
              f"run {t * 1e3:8.1f} ms  ({B / t:6.1f} poses/s)  aff0 {a0:.3f}")
    affs = [v[1] for v in results.values()]
    print("affinity agreement across configs:",
          "OK" if max(affs) - min(affs) < 1e-3 else f"MISMATCH {affs}")


if __name__ == "__main__":
    main()
