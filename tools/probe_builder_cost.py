"""Profile the host-side per-pair system builders that feed the staged
engines (EC / Cartesian relax / MDN) at screen scale.

Context: at 1,200 distinct pairs the slot caches never hit, so every
batch pays `_load_pair` for each missing pair on the one-core host. The
packed-H2D probe (tools/probe_packed_h2d.py) showed the transfer count
is NOT the bottleneck; this probe breaks down the remaining host cost:
per-builder wall time on real screen prep-cache records.

Usage:
  python tools/probe_builder_cost.py [prep_cache_dir] [n_pairs]
CPU-only (never touches the axon backend).
"""
import glob
import os
import pickle
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    cache = sys.argv[1] if len(sys.argv) > 1 else "/tmp/screen1k_r4/out/prep_cache"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from diffbindfr_tpu.ops import cartesian, vina

    pkls = sorted(glob.glob(os.path.join(cache, "*.rec.pkl")))[:n]
    if not pkls:
        print(f"no rec.pkl under {cache}")
        return 1
    recs = []
    t0 = time.perf_counter()
    for p in pkls:
        with open(p, "rb") as fh:
            recs.append(pickle.load(fh))
    t_pkl = time.perf_counter() - t0
    b = recs[0]["bucket"]
    print(f"{len(recs)} pairs, bucket n_lig={b.n_lig} n_atm={b.n_atm} "
          f"n_tor={b.n_tor}; rec.pkl read {1e3 * t_pkl / len(recs):.1f} ms/pair")

    def bench(name, fn):
        t0 = time.perf_counter()
        for r in recs:
            fn(r)
        dt = time.perf_counter() - t0
        print(f"  {name:34s} {1e3 * dt / len(recs):7.2f} ms/pair "
              f"({dt:.2f} s / {len(recs)})")
        return dt

    print("[EC engine _load_pair pieces]")
    t_bl = bench("vina.build_ligand",
                 lambda r: vina.build_ligand(r["lig"], b.n_lig, b.n_tor))
    t_br = bench("vina.build_receptor",
                 lambda r: vina.build_receptor(r["pocket"], b.n_atm))
    print("[Cartesian engine _load_pair pieces]")
    t_cl = bench("cartesian.build_cartesian_ligand",
                 lambda r: cartesian.build_cartesian_ligand(r["lig"], b.n_lig))
    t_cr = bench("cartesian.build_cartesian_receptor",
                 lambda r: cartesian.build_cartesian_receptor(
                     r["pocket"], b.n_atm))
    print("[npz sample read (MDN engine path)]")
    npzs = [p.replace(".rec.pkl", ".npz") for p in pkls]
    t0 = time.perf_counter()
    for p in npzs:
        d = np.load(p)
        _ = {k: d[k] for k in d.files}
    t_npz = time.perf_counter() - t0
    print(f"  np.load full sample               {1e3 * t_npz / len(recs):7.2f} ms/pair")

    per_pair_ec = (t_bl + t_br) / len(recs)
    per_pair_cart = (t_bl + t_cl + t_cr) / len(recs)
    print(f"\nEC host build total  {1e3 * per_pair_ec:.1f} ms/pair -> "
          f"{per_pair_ec * 1200:.0f} s over 1200 pairs")
    print(f"cart host build total {1e3 * per_pair_cart:.1f} ms/pair -> "
          f"{per_pair_cart * 1200:.0f} s over 1200 pairs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
