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
import pickle
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

# full-Protein parse cache for lazy PreparedPair.protein (dedup across pairs)
_PROT_CACHE: dict = {}


@dataclasses.dataclass
class PreparedPair:
    """One featurized (pocket, ligand) pair.

    `sample` and `protein` load lazily when backed by a cache path — a 10k
    virtual screen must not hold every padded DockingSample in host RAM
    (the reference streams from LMDB, inference_dataset.py:507-562).
    `retain` keeps the decoded sample in memory after first access
    (training-sized tables); screens leave it False and re-read per batch.
    """

    job: Job
    lig: LigandRecord
    pocket: PocketRecord
    bucket: Buckets
    crystal_pos: np.ndarray | None = None  # world-frame reference ligand
    sample_path: str | None = None
    retain: bool = True
    # [C, A, 3] DG-embedded starting conformers (ETKDG analogue,
    # loading.py:64-117); pose replica p starts from conformer p % C so
    # docking never reuses the input 3D geometry. None = use input.
    conformers: np.ndarray | None = None
    _sample: DockingSample | None = None
    _protein: Protein | None = None

    @property
    def sample(self) -> DockingSample:
        if self._sample is not None:
            return self._sample
        if self.sample_path is None:
            raise RuntimeError(
                f"{self.job.complex_name}: no sample in memory or on disk"
            )
        s = _load_sample_npz(self.sample_path)
        if self.retain:
            self._sample = s
        return s

    @property
    def protein(self) -> Protein:
        if self._protein is None:
            if self.job.protein not in _PROT_CACHE:
                _PROT_CACHE[self.job.protein] = parse_pdb(self.job.protein)
            self._protein = _PROT_CACHE[self.job.protein]
        return self._protein


@dataclasses.dataclass
class Failure:
    complex_name: str
    stage: str
    error: str


def _load_sample_npz(path: str) -> DockingSample:
    data = np.load(path)
    return DockingSample(**{k: data[k] for k in DockingSample._fields})


def _cache_paths(cache_dir: str, job: Job, pocket_radius: float):
    stem = os.path.join(cache_dir, f"{job.complex_name}_r{pocket_radius:g}")
    return stem + ".npz", stem + ".rec.pkl"


def _prep_one(job: Job, pocket_radius: float, cache_dir: str | None,
              lig_cache: dict, prot_cache: dict, pocket_cache: dict,
              n_conformers: int = 0, conf_cache: dict | None = None):
    """Featurize one pair. Returns ('ok', PreparedPair-kwargs-dict) or
    ('fail', Failure). Caches: per-pair sample npz + records pkl (resume),
    in-memory dicts dedup ligand/protein/pocket work within a process."""
    spath = rpath = None
    if cache_dir:
        spath, rpath = _cache_paths(cache_dir, job, pocket_radius)
        if os.path.exists(spath) and os.path.exists(rpath):
            try:
                with open(rpath, "rb") as fh:
                    rec = pickle.load(fh)
                cached_confs = rec.get("conformers")
                if n_conformers == 0 or (
                    cached_confs is not None
                    and cached_confs.shape[0] >= n_conformers
                ):
                    # slice over-provisioned caches so replica-to-conformer
                    # assignment matches a fresh -nc run exactly
                    if cached_confs is not None and n_conformers:
                        cached_confs = cached_confs[:n_conformers]
                    return "ok", dict(
                        job=job, lig=rec["lig"], pocket=rec["pocket"],
                        bucket=rec["bucket"], crystal_pos=rec["crystal_pos"],
                        sample_path=spath, conformers=cached_confs,
                    )
            except Exception:
                pass  # stale/corrupt cache: fall through and recompute

    try:
        if job.ligand not in lig_cache:
            raw = parse_ligand_file(job.ligand)[0]
            lig_cache[job.ligand] = featurize_ligand(
                perceive(raw), job.ligand_name
            )
        lig0 = lig_cache[job.ligand]
    except Exception as e:  # quarantine, don't kill the run
        return "fail", Failure(job.complex_name, "ligand", repr(e))

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
        return "fail", Failure(job.complex_name, "pocket", repr(e))

    confs = None
    if n_conformers > 0:
        try:
            if conf_cache is None:
                conf_cache = {}
            if job.ligand not in conf_cache:
                from ..chem.embed import embed_conformers

                conf_cache[job.ligand] = embed_conformers(
                    lig0, n_conformers, seed=0
                )
            confs = conf_cache[job.ligand]
        except Exception as e:
            return "fail", Failure(job.complex_name, "embed", repr(e))

    try:
        lig = dataclasses.replace(lig0)
        crystal_pos = lig0.pos.copy()
        lig.pos = lig0.pos - pocket.center
        sample = make_sample(lig, pocket)
        bucket = choose_bucket(
            lig.num_atoms,
            lig.edge_index.shape[1],
            lig.num_torsions,
            pocket.num_res,
            int(pocket.atom14_mask.sum()),
        )
        if spath:
            tmp = spath + f".{os.getpid()}.tmp"
            np.savez(tmp, **sample._asdict())
            os.replace(tmp + ".npz", spath)
            tmp = rpath + f".{os.getpid()}.tmp"
            with open(tmp, "wb") as fh:
                pickle.dump(
                    {"lig": lig, "pocket": pocket, "bucket": bucket,
                     "crystal_pos": crystal_pos, "conformers": confs}, fh,
                )
            os.replace(tmp, rpath)
        return "ok", dict(
            job=job, lig=lig, pocket=pocket, bucket=bucket,
            crystal_pos=crystal_pos, sample_path=spath, _sample=sample,
            conformers=confs,
        )
    except Exception as e:
        return "fail", Failure(job.complex_name, "sample", repr(e))


def _worker_init():
    # workers must never grab the TPU (the parent may hold it); force the
    # CPU backend before any jax backend initialization
    import jax

    jax.config.update("jax_platforms", "cpu")


def _worker_prep(args):
    chunk, pocket_radius, cache_dir, n_conformers = args
    lig_cache: dict = {}
    prot_cache: dict = {}
    pocket_cache: dict = {}
    conf_cache: dict = {}
    out = []
    for job in chunk:
        status, payload = _prep_one(
            job, pocket_radius, cache_dir, lig_cache, prot_cache,
            pocket_cache, n_conformers=n_conformers, conf_cache=conf_cache,
        )
        if status == "ok":
            # IPC stays light: the padded sample lives in the npz cache
            payload.pop("_sample", None)
            out.append((status, payload))
        else:
            out.append((status, payload))
    return out


def prep(jobs: list, pocket_radius: float = 12.0, verbose: bool = True,
         cache_dir: str | None = None, num_workers: int = 0,
         chunk_size: int = 32, n_conformers: int = 0):
    """Featurize all pairs; returns (prepared list, failures list).

    Proteins/ligands/pockets are deduplicated (inference_dataset.py:261-393)
    so each file is parsed once per process. With `cache_dir`, each pair
    persists a DockingSample npz + records pkl keyed by (complex, radius):
    a killed run resumes pair-by-pair, and the prep/dock two-phase handoff
    works across processes — the reference's pandarallel + chunked temp
    files + LMDB (inference_dataset.py:344-478,507-545) collapsed to one
    idempotent per-pair cache.

    `num_workers > 1` fans featurization out over a spawn-based process
    pool (chunks grouped by protein so each receptor parses once); results
    come back via the cache, so `cache_dir` is required (a temp dir is
    used when not given). Samples load lazily; tables larger than 1024
    pairs are not retained in RAM after use.
    """
    retain = len(jobs) <= 1024
    prepared, failures = [], []

    if num_workers and num_workers > 1 and len(jobs) > 1:
        import multiprocessing as mp
        import tempfile

        if cache_dir is None:
            cache_dir = tempfile.mkdtemp(prefix="diffbindfr_prep_")
        os.makedirs(cache_dir, exist_ok=True)
        order = {
            (j.complex_name, j.protein, j.ligand): i
            for i, j in enumerate(jobs)
        }
        # resume fast-path: satisfy already-cached pairs in the parent (no
        # pool spawn cost); only the misses go to the workers
        results = []
        todo = []
        for job in jobs:
            spath, rpath = _cache_paths(cache_dir, job, pocket_radius)
            hit = None
            if os.path.exists(spath) and os.path.exists(rpath):
                try:
                    with open(rpath, "rb") as fh:
                        rec = pickle.load(fh)
                    confs = rec.get("conformers")
                    if n_conformers and (
                        confs is None or confs.shape[0] < n_conformers
                    ):
                        raise KeyError("conformers missing from cache")
                    if confs is not None and n_conformers:
                        confs = confs[:n_conformers]
                    hit = ("ok", dict(
                        job=job, lig=rec["lig"], pocket=rec["pocket"],
                        bucket=rec["bucket"], crystal_pos=rec["crystal_pos"],
                        sample_path=spath, conformers=confs,
                    ))
                except Exception:
                    hit = None
            if hit is not None:
                results.append(hit)
            else:
                todo.append(job)
        if verbose and results:
            print(f"[prep] {len(results)}/{len(jobs)} pairs from cache")
        if todo:
            grouped = sorted(todo, key=lambda j: (j.protein, j.ligand))
            chunks = [
                grouped[i : i + chunk_size]
                for i in range(0, len(grouped), chunk_size)
            ]
            ctx = mp.get_context("spawn")
            with ctx.Pool(num_workers, initializer=_worker_init) as pool:
                for out in pool.imap_unordered(
                    _worker_prep,
                    [(c, pocket_radius, cache_dir, n_conformers)
                     for c in chunks],
                ):
                    results.extend(out)
                    if verbose:
                        print(
                            f"[prep] {len(results)}/{len(jobs)} pairs featurized",
                            flush=True,
                        )
        for status, payload in results:
            if status == "ok":
                prepared.append(PreparedPair(retain=retain, **payload))
            else:
                failures.append(payload)
        prepared.sort(
            key=lambda p: order.get(
                (p.job.complex_name, p.job.protein, p.job.ligand), 0
            )
        )
    else:
        lig_cache: dict = {}
        prot_cache: dict = {}
        pocket_cache: dict = {}
        conf_cache: dict = {}
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
        for job in jobs:
            status, payload = _prep_one(
                job, pocket_radius, cache_dir,
                lig_cache, prot_cache, pocket_cache,
                n_conformers=n_conformers, conf_cache=conf_cache,
            )
            if status == "ok":
                if not retain and payload.get("sample_path"):
                    payload.pop("_sample", None)
                prepared.append(PreparedPair(retain=retain, **payload))
            else:
                failures.append(payload)

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
    mdn_nll: float | None = None  # mean per-contact NLL (lower = better)
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

    # ---- device-resident sample staging (single-device fast path).
    # Replicas of one pair are identical except lig_ref_pos, yet the old
    # loop re-built and re-transferred the full stacked batch every step —
    # at -np 16 that is 16 copies of the same arrays through the host->
    # device link per batch (the measured screen bottleneck, ROUND2_NOTES:
    # 0.7 poses/s through the axon relay vs 4.2 pre-staged). Here each
    # distinct pair's DockingSample is put on device ONCE (LRU-capped),
    # the batch is stacked ON DEVICE inside the same jit dispatch as the
    # sampler, and the only per-batch H2D is the [B, NL, 3] conformer
    # reference block (~25 KB vs ~10 MB). Matches the role of the
    # reference's LMDB-backed streaming loader (inference_dataset.py:
    # 507-562) with the device as the hot tier.
    from collections import OrderedDict

    staged: OrderedDict = OrderedDict()
    stage_cap = max(2 * batch_size, 32)

    def stage(pi):
        if pi in staged:
            staged.move_to_end(pi)
            return staged[pi]
        s_np = prepared[pi].sample  # one (lazy) npz read per pair total
        entry = (jax.tree.map(jnp.asarray, s_np),
                 np.asarray(s_np.lig_ref_pos))
        staged[pi] = entry
        while len(staged) > stage_cap:
            staged.popitem(last=False)
        return entry

    for bucket, ents in groups.items():
        if bucket not in fns:
            if mesh is None:
                def staged_fn(pr, ss, refs, k):
                    b = jax.tree.map(lambda *xs: jnp.stack(xs), *ss)
                    b = b._replace(
                        lig_ref_pos=refs * b.lig_mask[..., None]
                    )
                    return sp.sample(
                        pr, net_cfg, sampler_cfg, b, k,
                        keep_trajectory=keep_trajectory,
                    )

                fns[bucket] = jax.jit(staged_fn)
            else:
                fns[bucket] = jax.jit(
                    lambda pr, b, k: sp.sample(
                        pr, net_cfg, sampler_cfg, b, k,
                        keep_trajectory=keep_trajectory,
                    )
                )
        fn = fns[bucket]

        def harvest(pending):
            chunk, res = pending
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
            return len(chunk)

        pending = None
        for lo in range(0, len(ents), batch_size):
            chunk = ents[lo : lo + batch_size]
            pad = batch_size - len(chunk)
            reps = chunk + [chunk[0]] * pad
            key, sub = jax.random.split(key)
            if mesh is None:
                devs, refs = [], []
                for pi, po in reps:
                    dev, ref_np = stage(pi)
                    confs = prepared[pi].conformers
                    if confs is not None:
                        # pose replica po starts from embedded conformer
                        # po % C (init_pose randomizes torsions/rotation/
                        # translation about lig_ref_pos, so only internal
                        # geometry matters)
                        c = confs[po % confs.shape[0]]
                        r = np.zeros_like(ref_np)
                        r[: c.shape[0]] = c
                    else:
                        r = ref_np
                    devs.append(dev)
                    refs.append(r)
                res = fn(params, tuple(devs),
                         jnp.asarray(np.stack(refs)), sub)
            else:
                cache: dict = {}
                samples = []
                for pi, po in reps:
                    if pi not in cache:
                        cache[pi] = prepared[pi].sample
                    s = cache[pi]
                    confs = prepared[pi].conformers
                    if confs is not None:
                        c = confs[po % confs.shape[0]]
                        ref = np.zeros_like(s.lig_ref_pos)
                        ref[: c.shape[0]] = c
                        s = s._replace(
                            lig_ref_pos=ref * s.lig_mask[:, None]
                        )
                    samples.append(s)
                batch = stack_samples(samples)
                batch = jax.tree.map(jnp.asarray, batch)
                batch = parallel.shard_batch(mesh, batch)
                res = fn(params, batch, sub)
            # 1-deep software pipeline: harvest the PREVIOUS batch while
            # this one computes on device — host-side npz loads / stacking
            # / H2D of batch i+1 overlap device time of batch i
            if pending is not None:
                done += harvest(pending)
                if verbose:
                    rate = done / max(time.time() - t0, 1e-9)
                    print(
                        f"[dock] {done}/{len(entries)} poses ({rate:.2f}/s)",
                        flush=True,
                    )
            pending = (chunk, res)
        if pending is not None:
            done += harvest(pending)
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

    t0 = time.time()

    # Device-resident system staging (same design as dock): the per-pair
    # vina ligand/receptor systems are identical across the pair's poses,
    # so each is transferred ONCE (LRU-capped) and batches are stacked on
    # device inside the jit; the only per-batch H2D is the [B, NL, 3]
    # pose block. A 1-deep software pipeline overlaps the harvest/D2H of
    # batch i with the device minimization of batch i+1.
    from collections import OrderedDict

    staged: OrderedDict = OrderedDict()
    stage_cap = max(2 * batch_size, 32)

    def get_system(pi):
        if pi in staged:
            staged.move_to_end(pi)
            return staged[pi]
        pair = prepared[pi]
        b = pair.bucket
        entry = jax.tree.map(
            jnp.asarray,
            (vina.build_ligand(pair.lig, b.n_lig, b.n_tor),
             vina.build_receptor(pair.pocket, b.n_atm)),
        )
        staged[pi] = entry
        while len(staged) > stage_cap:
            staged.popitem(last=False)
        return entry

    groups: dict = {}
    for k, r in enumerate(results):
        groups.setdefault(prepared[r.pair_idx].bucket, []).append(k)

    fns: dict = {}
    for bucket, ridxs in groups.items():
        if bucket not in fns:
            def staged_fn(lp, systems_):
                bl = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *[s[0] for s in systems_])
                br = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *[s[1] for s in systems_])
                return vina.minimize_batch(lp, bl, br, steps=steps)

            fns[bucket] = jax.jit(staged_fn)
        fn = fns[bucket]

        def harvest(pending):
            chunk, (pos, aff) = pending
            pos, aff = np.asarray(pos), np.asarray(aff)
            for j, k in enumerate(chunk):
                results[k].lig_pos = pos[j]
                results[k].vina_score = float(aff[j])

        pending = None
        for lo in range(0, len(ridxs), batch_size):
            chunk = ridxs[lo : lo + batch_size]
            pad = batch_size - len(chunk)
            idxs = chunk + [chunk[0]] * pad
            systems_ = tuple(get_system(results[k].pair_idx) for k in idxs)
            lp = jnp.asarray(np.stack([results[k].lig_pos for k in idxs]))
            out = fn(lp, systems_)
            if pending is not None:
                harvest(pending)
            pending = (chunk, out)
        if pending is not None:
            harvest(pending)
    if verbose:
        print(f"[ec] re-minimized {len(results)} poses on device "
              f"in {time.time() - t0:.1f}s")


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

    t0 = time.time()

    # Device-resident sample staging + 1-deep pipeline (same design as
    # dock/error_correct): each pair's DockingSample goes to the device
    # ONCE; per-batch H2D is only the pose block (lig_pos + atom14_pos).
    from collections import OrderedDict

    staged: OrderedDict = OrderedDict()
    stage_cap = max(2 * batch_size, 32)

    def stage(pi):
        if pi in staged:
            staged.move_to_end(pi)
            return staged[pi]
        entry = jax.tree.map(jnp.asarray, prepared[pi].sample)
        staged[pi] = entry
        while len(staged) > stage_cap:
            staged.popitem(last=False)
        return entry

    groups: dict = {}
    for k, r in enumerate(results):
        groups.setdefault(prepared[r.pair_idx].bucket, []).append(k)

    fns: dict = {}
    for bucket, ridxs in groups.items():
        if bucket not in fns:
            def staged_fn(p, ss, lp, a14):
                b = jax.tree.map(lambda *xs: jnp.stack(xs), *ss)
                return mdn.score_batch_both(p, mdn_cfg, b, lp, a14)

            fns[bucket] = jax.jit(staged_fn)
        fn = fns[bucket]

        def harvest(pending):
            chunk, (sp_, nll_) = pending
            sp_, nll_ = np.asarray(sp_), np.asarray(nll_)
            for j, k in enumerate(chunk):
                results[k].mdn_score = float(sp_[j])
                results[k].mdn_nll = float(nll_[j])

        pending = None
        for lo in range(0, len(ridxs), batch_size):
            chunk = ridxs[lo : lo + batch_size]
            pad = batch_size - len(chunk)
            idxs = chunk + [chunk[0]] * pad
            ss = tuple(stage(results[k].pair_idx) for k in idxs)
            lp = jnp.asarray(np.stack([results[k].lig_pos for k in idxs]))
            a14 = jnp.asarray(np.stack([results[k].atom14_pos for k in idxs]))
            out = fn(mdn_params, ss, lp, a14)
            if pending is not None:
                harvest(pending)
            pending = (chunk, out)
        if pending is not None:
            harvest(pending)
    if verbose:
        print(f"[score] MDN scores attached to {len(results)} poses "
              f"in {time.time() - t0:.1f}s")


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
    t0 = time.time()
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
            "mdn_nll": r.mdn_nll,
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
        print(f"[export] {len(rows)} rows -> {res_csv} "
              f"in {time.time() - t0:.1f}s")
    return res_csv


def write_failures(outdir: str, failures: list) -> None:
    if not failures:
        return
    with open(os.path.join(outdir, "failed.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["complex_name", "stage", "error"])
        for f in failures:
            w.writerow([f.complex_name, f.stage, f.error])
