"""A/B the Cartesian relax minimizer in the three jit forms (same harness
as tools/probe_engine_fn.py, which measured the EC minimizer 6.8x slower
with runtime-arg trees before the one-hot/gather fixes):
  A. direct: system trees closed over as jit constants
  B. args:   trees passed as jit arguments
  C. gather: CartesianRelaxEngine form — [cap, ...] block + in-jit row
     gather from a slot index vector

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_cart_fn.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FWD = "/root/reference/examples/forward"
B = int(os.environ.get("PROBE_B", "32"))
CAP = int(os.environ.get("PROBE_CAP", "64"))
STEPS = 300


def main():
    import jax
    import jax.numpy as jnp

    from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
    from diffbindfr_tpu.chem.mol import perceive
    from diffbindfr_tpu.chem.protein_feats import build_pocket_record
    from diffbindfr_tpu.data.sample import choose_bucket
    from diffbindfr_tpu.io.pdb import parse_pdb
    from diffbindfr_tpu.io.sdf import parse_sdf
    from diffbindfr_tpu.ops import cartesian, vina
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
    print(f"bucket: n_lig={b.n_lig} n_atm={b.n_atm} B={B} cap={CAP} "
          f"steps={STEPS}")
    cl = cartesian.build_cartesian_ligand(lig, b.n_lig)
    vl = vina.build_ligand(lig, b.n_lig, b.n_tor)
    cr = cartesian.build_cartesian_receptor(pocket, b.n_atm)

    bcl = jax.tree.map(lambda x: jnp.asarray(np.stack([x] * B)), cl)
    bvl = jax.tree.map(lambda x: jnp.asarray(np.stack([x] * B)), vl)
    bcr = jax.tree.map(lambda x: jnp.asarray(np.stack([x] * B)), cr)
    block = jax.tree.map(
        lambda x: jnp.asarray(np.stack([x] * CAP)), (cl, vl, cr))
    idx = jnp.asarray(np.arange(B, dtype=np.int32))

    rng = np.random.default_rng(0)
    lp = jnp.asarray(
        np.stack([lig.pos + rng.normal(size=lig.pos.shape) * 0.3
                  for _ in range(B)]).astype(np.float32))
    lp = jnp.pad(lp, ((0, 0), (0, b.n_lig - lig.num_atoms), (0, 0)))
    nres = pocket.aatype.shape[0]
    a14 = np.zeros((B, nres, 14, 3), np.float32)
    a14[:] = pocket.atom14_pos
    a14 = jnp.asarray(a14)

    def timed(name, fn, *args):
        t0 = time.time()
        x, r = fn(*args)
        s0 = float(x.sum())
        t_compile = time.time() - t0
        ts = []
        for _ in range(4):
            t0 = time.time()
            x, r = fn(*args)
            float(x.sum())
            ts.append(time.time() - t0)
        t = min(ts)
        print(f"{name:10s} compile {t_compile:6.1f}s  run {t * 1e3:8.1f} ms"
              f"  ({B / t:6.1f} poses/s)  xsum {s0:.3f}")

    timed("direct",
          jax.jit(lambda x, a: cartesian.cartesian_minimize_batch(
              x, a, bcl, bvl, bcr, steps=STEPS)), lp, a14)
    timed("args",
          jax.jit(lambda x, a, c, v, r: cartesian.cartesian_minimize_batch(
              x, a, c, v, r, steps=STEPS)), lp, a14, bcl, bvl, bcr)

    def engine_form(blk, ix, x, a):
        c, v, r = jax.tree.map(lambda t: t[ix], blk)
        return cartesian.cartesian_minimize_batch(x, a, c, v, r,
                                                  steps=STEPS)

    timed("gather", jax.jit(engine_form), block, idx, lp, a14)


if __name__ == "__main__":
    main()
