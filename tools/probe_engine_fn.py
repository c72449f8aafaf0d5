"""Isolate the 12x EC engine-vs-isolated-kernel gap (probe_stage_breakdown
measured ~3.1 s per 32-pose engine batch where probe_ec_unroll measures
250 ms for the same minimize at the same bucket/batch).

Candidate differences, each A/B'd on the chip with scalar-fetch timing:
  A. direct: jit(minimize_batch) with batch trees as closed-over device
     constants (probe_ec_unroll form)
  B. args:   same but ligand/receptor batch trees passed as jit ARGUMENTS
  C. gather: ECEngine form — leaves [cap, ...] block + in-jit row gather
     from a slot index vector

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_engine_fn.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FWD = "/root/reference/examples/forward"
B = int(os.environ.get("PROBE_B", "32"))
CAP = int(os.environ.get("PROBE_CAP", "64"))
STEPS = 150


def main():
    import jax
    import jax.numpy as jnp

    from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
    from diffbindfr_tpu.chem.mol import perceive
    from diffbindfr_tpu.chem.protein_feats import build_pocket_record
    from diffbindfr_tpu.data.sample import choose_bucket
    from diffbindfr_tpu.io.pdb import parse_pdb
    from diffbindfr_tpu.io.sdf import parse_sdf
    from diffbindfr_tpu.ops import vina
    from diffbindfr_tpu.utils import compile_cache

    compile_cache.enable()

    prot = parse_pdb(f"{FWD}/3dbs_protein.pdb")
    lig = featurize_ligand(
        perceive(parse_sdf(f"{FWD}/3dbs_protein_crystal.sdf")[0]), "3dbs")
    pocket = build_pocket_record(prot, lig.pos, cutoff=12.0)
    lig.pos = lig.pos - pocket.center
    b = choose_bucket(lig.num_atoms, lig.bonds.shape[0] * 2,
                      lig.num_torsions, pocket.num_res,
                      int(pocket.atom14_mask.sum()))
    print(f"bucket: n_lig={b.n_lig} n_tor={b.n_tor} n_atm={b.n_atm} "
          f"B={B} cap={CAP} steps={STEPS}")
    vl = vina.build_ligand(lig, b.n_lig, b.n_tor)
    vr = vina.build_receptor(pocket, b.n_atm)

    bl = jax.tree.map(lambda x: jnp.asarray(np.stack([x] * B)), vl)
    br = jax.tree.map(lambda x: jnp.asarray(np.stack([x] * B)), vr)
    block = jax.tree.map(
        lambda x: jnp.asarray(np.stack([x] * CAP)), (vl, vr))
    idx = jnp.asarray(np.arange(B, dtype=np.int32))

    rng = np.random.default_rng(0)
    lp = jnp.asarray(
        np.stack([lig.pos + rng.normal(size=lig.pos.shape) * 0.5
                  for _ in range(B)]).astype(np.float32))
    lp = jnp.pad(lp, ((0, 0), (0, b.n_lig - lig.num_atoms), (0, 0)))

    def timed(name, fn, *args):
        t0 = time.time()
        pos, aff = fn(*args)
        a0 = float(aff[0])
        t_compile = time.time() - t0
        ts = []
        for _ in range(4):
            t0 = time.time()
            pos, aff = fn(*args)
            float(aff.sum())
            ts.append(time.time() - t0)
        t = min(ts)
        print(f"{name:10s} compile {t_compile:6.1f}s  run {t * 1e3:8.1f} ms"
              f"  ({B / t:6.1f} poses/s)  aff0 {a0:.3f}")

    timed("direct",
          jax.jit(lambda x: vina.minimize_batch(x, bl, br, steps=STEPS)), lp)
    timed("args",
          jax.jit(lambda x, l, r: vina.minimize_batch(x, l, r, steps=STEPS)),
          lp, bl, br)

    def engine_form(blk, ix, x):
        l, r = jax.tree.map(lambda a: a[ix], blk)
        return vina.minimize_batch(x, l, r, steps=STEPS)

    timed("gather", jax.jit(engine_form), block, idx, lp)


if __name__ == "__main__":
    main()
