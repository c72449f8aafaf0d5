"""End-to-end docking pipeline: prep -> dock -> score -> export -> rank.

The TPU-native predict.py (reference DiffBindFR/app/predict.py:98-236 +
common/engines.py): featurization runs on host CPU into fixed-shape
DockingSamples bucketed by size class; docking batches (pair x pose)
replicas of one bucket into dense arrays and runs the jitted 20-step
sampler (one compilation per (bucket, batch) class); the MDN scorer ranks
poses on-device; exporters and the results table are host-side.

Failure handling mirrors the reference's quarantine funnel
(inference_dataset.py:289-369): featurization errors never kill the run —
failed pairs are recorded and reported in failed.csv.
"""
from __future__ import annotations

import csv
import dataclasses
import os
import time

import numpy as np

from ..chem.ligand_feats import LigandRecord, featurize_ligand
from ..chem.mol import perceive
from ..chem.protein_feats import PocketRecord, build_pocket_record
from ..data.sample import Buckets, DockingSample, choose_bucket, make_sample, stack_samples
from ..io.pdb import Protein, parse_pdb
from ..io.sdf import parse_ligand_file
from .export import export_pose, pose_metrics
from .jobs import Job


@dataclasses.dataclass
class PreparedPair:
    job: Job
    lig: LigandRecord
    pocket: PocketRecord
    protein: Protein
    sample: DockingSample
    bucket: Buckets
    crystal_pos: np.ndarray | None = None  # world-frame reference ligand


@dataclasses.dataclass
class Failure:
    complex_name: str
    stage: str
    error: str


def prep(jobs: list, pocket_radius: float = 12.0, verbose: bool = True,
         cache_dir: str | None = None):
    """Featurize all pairs; returns (prepared list, failures list).

    Proteins and ligands are deduplicated across the job table
    (inference_dataset.py:261-393) so each file is parsed once. With
    `cache_dir`, each pair's padded DockingSample is persisted to an npz
    keyed by (complex, pocket radius) and reloaded on the next run — the
    prep/dock two-phase handoff the reference implements with LMDB
    (inference_dataset.py:507-562). Records and the full Protein are
    re-derived from the source files (cheap relative to featurization).
    """
    prepared, failures = [], []
    lig_cache: dict = {}
    prot_cache: dict = {}
    pocket_cache: dict = {}

    for job in jobs:
        try:
            if job.ligand not in lig_cache:
                raw = parse_ligand_file(job.ligand)[0]
                lig_cache[job.ligand] = featurize_ligand(
                    perceive(raw), job.ligand_name
                )
            lig0 = lig_cache[job.ligand]
        except Exception as e:  # quarantine, don't kill the run
            failures.append(Failure(job.complex_name, "ligand", repr(e)))
            continue

        try:
            if job.protein not in prot_cache:
                prot_cache[job.protein] = parse_pdb(job.protein)
            prot = prot_cache[job.protein]

            kind, ref = job.pocket_ref()
            if kind == "center":
                ref_points = np.asarray(ref, dtype=np.float32).reshape(1, 3)
            else:
                ref_points = parse_ligand_file(ref)[0].coords
            pkey = (job.protein, kind, tuple(np.round(ref_points.mean(0), 3)))
            if pkey not in pocket_cache:
                pocket_cache[pkey] = build_pocket_record(
                    prot, ref_points, cutoff=pocket_radius
                )
            pocket = pocket_cache[pkey]
        except Exception as e:
            failures.append(Failure(job.complex_name, "pocket", repr(e)))
            continue

        try:
            lig = dataclasses.replace(lig0)
            crystal_pos = lig0.pos.copy()
            lig.pos = lig0.pos - pocket.center
            sample = None
            cpath = None
            if cache_dir:
                os.makedirs(cache_dir, exist_ok=True)
                cpath = os.path.join(
                    cache_dir,
                    f"{job.complex_name}_r{pocket_radius:g}.npz",
                )
                if os.path.exists(cpath):
                    data = np.load(cpath)
                    sample = DockingSample(
                        **{k: data[k] for k in DockingSample._fields}
                    )
            if sample is None:
                sample = make_sample(lig, pocket)
                if cpath:
                    tmp = cpath + f".{os.getpid()}.tmp.npz"
                    np.savez(tmp, **sample._asdict())
                    os.replace(tmp, cpath)
            bucket = choose_bucket(
                lig.num_atoms,
                lig.edge_index.shape[1],
                lig.num_torsions,
                pocket.num_res,
                int(pocket.atom14_mask.sum()),
            )
            prepared.append(
                PreparedPair(job, lig, pocket, prot, sample, bucket, crystal_pos)
            )
        except Exception as e:
            failures.append(Failure(job.complex_name, "sample", repr(e)))

    if verbose:
        print(
            f"[prep] {len(prepared)} pairs prepared, {len(failures)} failed"
        )
    return prepared, failures


@dataclasses.dataclass
class PoseResult:
    pair_idx: int
    pose_idx: int
    lig_pos: np.ndarray  # [NL_pad, 3] pocket frame
    atom14_pos: np.ndarray  # [R_pad, 14, 3] pocket frame
    chi: np.ndarray
    mdn_score: float | None = None
    vina_score: float | None = None  # smina_score analog (lower = better)
    lig_traj: np.ndarray | None = None  # [S, NL_pad, 3]
    atom14_traj: np.ndarray | None = None  # [S, R_pad, 14, 3]


def dock(
    prepared: list,
    params,
    net_cfg,
    sampler_cfg,
    num_poses: int = 40,
    batch_size: int = 16,
    seed: int = 0,
    keep_trajectory: bool = False,
    verbose: bool = True,
) -> list:
    """Run the reverse diffusion for every (pair, pose) replica.

    Replicas are grouped by bucket so each (bucket, batch) shape compiles
    once; the final partial batch is padded by repetition and the padding
    results are dropped.
    """
    import jax
    import jax.numpy as jnp

    from .. import parallel, sampler as sp

    nd = jax.device_count()
    mesh = parallel.make_mesh() if nd > 1 and batch_size % nd == 0 else None
    if mesh is not None and verbose:
        print(f"[dock] sharding replica batches over {nd} devices")

    entries = [
        (i, p) for i in range(len(prepared)) for p in range(num_poses)
    ]
    groups: dict = {}
    for ent in entries:
        groups.setdefault(prepared[ent[0]].bucket, []).append(ent)

    fns: dict = {}
    results: list = []
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    done = 0
    for bucket, ents in groups.items():
        if bucket not in fns:
            fns[bucket] = jax.jit(
                lambda pr, b, k: sp.sample(
                    pr, net_cfg, sampler_cfg, b, k,
                    keep_trajectory=keep_trajectory,
                )
            )
        fn = fns[bucket]
        for lo in range(0, len(ents), batch_size):
            chunk = ents[lo : lo + batch_size]
            pad = batch_size - len(chunk)
            idxs = [e[0] for e in chunk] + [chunk[0][0]] * pad
            batch = stack_samples([prepared[i].sample for i in idxs])
            batch = jax.tree.map(jnp.asarray, batch)
            if mesh is not None:
                batch = parallel.shard_batch(mesh, batch)
            key, sub = jax.random.split(key)
            res = fn(params, batch, sub)
            lig_pos = np.asarray(res.lig_pos)
            a14 = np.asarray(res.atom14_pos)
            chi = np.asarray(res.chi)
            lt = np.asarray(res.lig_traj) if keep_trajectory else None
            at = np.asarray(res.atom14_traj) if keep_trajectory else None
            for j, (pi, po) in enumerate(chunk):
                results.append(
                    PoseResult(
                        pi, po, lig_pos[j], a14[j], chi[j],
                        lig_traj=lt[:, j] if lt is not None else None,
                        atom14_traj=at[:, j] if at is not None else None,
                    )
                )
            done += len(chunk)
            if verbose:
                rate = done / max(time.time() - t0, 1e-9)
                print(
                    f"[dock] {done}/{len(entries)} poses ({rate:.2f}/s)",
                    flush=True,
                )
    return results


def error_correct(
    prepared: list,
    results: list,
    steps: int = 150,
    batch_size: int = 16,
    verbose: bool = True,
) -> None:
    """Vina-style on-device re-minimization of every pose ("error
    correction", reference predict.py:158-191 via smina subprocesses —
    here a batched jitted gradient minimizer, ops/vina.py). Updates
    lig_pos in place and attaches vina_score."""
    import jax
    import jax.numpy as jnp

    from ..ops import vina

    systems: dict = {}

    def get_system(pi):
        if pi not in systems:
            pair = prepared[pi]
            b = pair.bucket
            systems[pi] = (
                vina.build_ligand(pair.lig, b.n_lig, b.n_tor),
                vina.build_receptor(pair.pocket, b.n_atm),
            )
        return systems[pi]

    groups: dict = {}
    for k, r in enumerate(results):
        groups.setdefault(prepared[r.pair_idx].bucket, []).append(k)

    fns: dict = {}
    for bucket, ridxs in groups.items():
        if bucket not in fns:
            fns[bucket] = jax.jit(
                lambda lp, l, rec: vina.minimize_batch(lp, l, rec, steps=steps)
            )
        fn = fns[bucket]
        for lo in range(0, len(ridxs), batch_size):
            chunk = ridxs[lo : lo + batch_size]
            pad = batch_size - len(chunk)
            idxs = chunk + [chunk[0]] * pad
            ligs, recs = zip(*(get_system(results[k].pair_idx) for k in idxs))
            bl = jax.tree.map(lambda *xs: jnp.stack(xs), *ligs)
            br = jax.tree.map(lambda *xs: jnp.stack(xs), *recs)
            lp = jnp.asarray(np.stack([results[k].lig_pos for k in idxs]))
            pos, aff = fn(lp, bl, br)
            pos = np.asarray(pos)
            aff = np.asarray(aff)
            for j, k in enumerate(chunk):
                results[k].lig_pos = pos[j]
                results[k].vina_score = float(aff[j])
    if verbose:
        print(f"[ec] re-minimized {len(results)} poses on device")


def score_mdn(
    prepared: list,
    results: list,
    mdn_params,
    mdn_cfg,
    batch_size: int = 16,
    verbose: bool = True,
) -> None:
    """Attach MDN scores to PoseResults in place (higher = better)."""
    import jax
    import jax.numpy as jnp

    from ..models import mdn_scorer as mdn

    groups: dict = {}
    for k, r in enumerate(results):
        groups.setdefault(prepared[r.pair_idx].bucket, []).append(k)

    fns: dict = {}
    for bucket, ridxs in groups.items():
        if bucket not in fns:
            fns[bucket] = jax.jit(
                lambda p, b, lp, a14: mdn.score_batch(p, mdn_cfg, b, lp, a14)
            )
        fn = fns[bucket]
        for lo in range(0, len(ridxs), batch_size):
            chunk = ridxs[lo : lo + batch_size]
            pad = batch_size - len(chunk)
            idxs = chunk + [chunk[0]] * pad
            batch = stack_samples(
                [prepared[results[k].pair_idx].sample for k in idxs]
            )
            batch = jax.tree.map(jnp.asarray, batch)
            lp = jnp.asarray(np.stack([results[k].lig_pos for k in idxs]))
            a14 = jnp.asarray(np.stack([results[k].atom14_pos for k in idxs]))
            scores = np.asarray(fn(mdn_params, batch, lp, a14))
            for j, k in enumerate(chunk):
                results[k].mdn_score = float(scores[j])
    if verbose:
        print(f"[score] MDN scores attached to {len(results)} poses")


def export_and_rank(
    prepared: list,
    results: list,
    outdir: str,
    export_structures: bool = True,
    export_pocket: bool = False,
    compute_metrics: bool = True,
    verbose: bool = True,
) -> str:
    """Write per-pose structures + results.csv + mdn top-1 table.

    Returns the results.csv path."""
    os.makedirs(outdir, exist_ok=True)
    rows = []
    for r in results:
        pair = prepared[r.pair_idx]
        pose_dir = os.path.join(
            outdir, pair.job.complex_name, f"pose_{r.pose_idx}"
        )
        props = {}
        if r.mdn_score is not None:
            props["mdn_score"] = f"{r.mdn_score:.6f}"
        if export_structures:
            export_pose(
                pose_dir, pair.lig, pair.pocket, pair.protein,
                r.lig_pos, r.atom14_pos,
                export_pocket=export_pocket, props=props,
            )
            if r.lig_traj is not None:
                from .export import export_trajectory

                export_trajectory(
                    pose_dir, pair.lig, pair.pocket,
                    r.lig_traj, r.atom14_traj,
                )
        row = {
            "complex_name": pair.job.complex_name,
            "pose": r.pose_idx,
            "lig_sdf": os.path.join(pose_dir, "lig_final.sdf"),
            "prot_pdb": os.path.join(pose_dir, "prot_final.pdb"),
            "mdn_score": r.mdn_score,
            "vina_score": r.vina_score,
        }
        if compute_metrics and pair.crystal_pos is not None:
            m = pose_metrics(
                pair.lig, pair.pocket, r.lig_pos, r.atom14_pos,
                crystal_lig_pos=pair.crystal_pos,
            )
            row.update(m.as_dict())
        rows.append(row)

    fields = sorted({k for row in rows for k in row})
    res_csv = os.path.join(outdir, "results.csv")
    with open(res_csv, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)

    # MDN top-1 per complex (reference *_mdn_top1.csv, predict.py:215-225)
    if any(row["mdn_score"] is not None for row in rows):
        best: dict = {}
        for row in rows:
            c = row["complex_name"]
            if c not in best or (row["mdn_score"] or -1e30) > (
                best[c]["mdn_score"] or -1e30
            ):
                best[c] = row
        top_csv = os.path.join(outdir, "results_mdn_top1.csv")
        with open(top_csv, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=fields)
            w.writeheader()
            w.writerows(best.values())

    # vina top-1 per complex (reference *_smina_top1.csv; lower = better)
    if any(row["vina_score"] is not None for row in rows):
        best = {}
        for row in rows:
            c = row["complex_name"]
            if c not in best or (row["vina_score"] or 1e30) < (
                best[c]["vina_score"] or 1e30
            ):
                best[c] = row
        with open(
            os.path.join(outdir, "results_vina_top1.csv"), "w", newline=""
        ) as fh:
            w = csv.DictWriter(fh, fieldnames=fields)
            w.writeheader()
            w.writerows(best.values())
    if verbose:
        print(f"[export] {len(rows)} rows -> {res_csv}")
    return res_csv


def write_failures(outdir: str, failures: list) -> None:
    if not failures:
        return
    with open(os.path.join(outdir, "failed.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["complex_name", "stage", "error"])
        for f in failures:
            w.writerow([f.complex_name, f.stage, f.error])
