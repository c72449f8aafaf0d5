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
from .export import PoseStructWriter, export_pose, pose_metrics
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
    # apo->holo side-chain reference (analysis.HoloRef), built at prep when
    # job.holo_protein is set; None = grade against the input pocket itself
    # (redock semantics, the reference default)
    holo_ref: object | None = None
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


def _cache_hit(rec: dict, job: Job, spath: str, n_conformers: int):
    """Validate a pickled prep record against THIS job's requirements;
    returns PreparedPair kwargs, or None to recompute. Shared by the
    in-worker and parent resume paths so every schema check lives once
    (conformers and holo_ref were each once validated in only one of the
    two copies)."""
    confs = rec.get("conformers")
    if n_conformers and (confs is None or confs.shape[0] < n_conformers):
        return None
    if confs is not None and n_conformers:
        # slice over-provisioned caches so replica-to-conformer
        # assignment matches a fresh -nc run exactly
        confs = confs[:n_conformers]
    holo_ref = None
    if job.holo_protein:
        # the cached reference must have been built from THIS holo
        # structure: a record written by another workflow (or an older
        # holo path) must not silently change what chi1/sc-RMSD are
        # graded against
        if (rec.get("holo_src") != job.holo_protein
                or rec.get("holo_ref") is None):
            return None
        holo_ref = rec["holo_ref"]
    # conversely, a record carrying a holo_ref (e.g. written by an
    # apo->holo run) must NOT attach it to a plain redock job — redock
    # grades recovery against the input pocket itself
    return dict(job=job, lig=rec["lig"], pocket=rec["pocket"],
                bucket=rec["bucket"], crystal_pos=rec["crystal_pos"],
                sample_path=spath, conformers=confs, holo_ref=holo_ref)


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
                hit = _cache_hit(rec, job, spath, n_conformers)
                if hit is not None:
                    return "ok", hit
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

    holo_ref = None
    if job.holo_protein:
        try:
            from .analysis import build_holo_ref

            if job.holo_protein not in prot_cache:
                prot_cache[job.holo_protein] = parse_pdb(job.holo_protein)
            holo_ref = build_holo_ref(pocket, prot_cache[job.holo_protein])
        except Exception as e:
            return "fail", Failure(job.complex_name, "holo", repr(e))

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
                     "crystal_pos": crystal_pos, "conformers": confs,
                     "holo_ref": holo_ref,
                     "holo_src": job.holo_protein or None}, fh,
                )
            os.replace(tmp, rpath)
        return "ok", dict(
            job=job, lig=lig, pocket=pocket, bucket=bucket,
            crystal_pos=crystal_pos, sample_path=spath, _sample=sample,
            conformers=confs, holo_ref=holo_ref,
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
                    h = _cache_hit(rec, job, spath, n_conformers)
                    hit = ("ok", h) if h is not None else None
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


def _dispatch_with_retry(fn, *args, _attempts: int = 2):
    """Dispatch a jitted call, retrying ONCE on transient remote-compile
    infrastructure failures (the axon relay's compile helper occasionally
    drops a response mid-body: "remote_compile ... response body closed",
    observed once in a 2,400-pose screen). Anything else re-raises
    immediately — a blanket retry would mask real errors."""
    for attempt in range(_attempts):
        try:
            return fn(*args)
        except Exception as e:  # noqa: BLE001 — filtered below
            msg = str(e)
            transient = "remote_compile" in msg or (
                "INTERNAL" in msg and "response body" in msg)
            if not transient or attempt == _attempts - 1:
                raise
            print(f"[dispatch] transient compile failure, retrying: "
                  f"{msg[:120]}", flush=True)


class _DeviceStager:
    """Device-resident slot cache of per-pair host pytrees (LRU).

    Replaces per-pair staging (one `jnp.asarray` per LEAF per pair — 256
    relay H2D round-trips per 16-pose screen batch, measured ~0.4 s/batch
    at -np 2 where pairs never repeat) with a slot-buffer design:

      * one stacked device tree of capacity `cap`, leaves `[cap, ...]`
      * all missing pairs of a batch are stacked on host and sent with ONE
        H2D per leaf, then scattered into their slots in ONE jitted
        dispatch (the group is padded to a power of two so at most
        log2(cap) scatter variants ever compile)
      * batch functions gather rows INSIDE their jit from the slot index
        vector, so batch composition costs no re-transfer
      * a small thread pool prefetches host pytrees (lazy npz reads /
        vina system builds) for upcoming batches while the device computes

    Mirrors the hot/cold tiering of the reference's LMDB-backed streaming
    loader (inference_dataset.py:507-562) with device HBM as the hot tier.
    All leaves must share the capacity-row layout, so use one stager per
    bucket (shape class).
    """

    def __init__(self, capacity: int, load, prefetch_workers: int = 2,
                 on_evict=None):
        import concurrent.futures as cf

        from collections import OrderedDict

        self.cap = capacity
        self._load = load  # pi -> host pytree (numpy leaves)
        self.slot_of: OrderedDict = OrderedDict()  # pi -> slot, LRU order
        self.block = None  # device tree, leaves [cap, ...]
        self._free = list(range(capacity))
        self._scatter = None
        self._on_evict = on_evict  # key -> None, called when a key drops
        self._pool = (
            cf.ThreadPoolExecutor(max_workers=prefetch_workers)
            if prefetch_workers > 0 else None
        )
        self._futures: dict = {}

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None
        self._futures.clear()

    def load_host(self, pi):
        fut = self._futures.pop(pi, None)
        if fut is not None:
            return fut.result()
        return self._load(pi)

    def prefetch(self, pis):
        """Schedule host loads for pairs likely needed soon."""
        if self._pool is None:
            return
        for pi in dict.fromkeys(pis):
            if pi not in self.slot_of and pi not in self._futures:
                self._futures[pi] = self._pool.submit(self._load, pi)

    def ensure(self, pis) -> list:
        """Stage every unstaged pair in `pis` (grouped); return their
        slots aligned with `pis`."""
        import jax
        import jax.numpy as jnp

        distinct = list(dict.fromkeys(pis))
        if len(distinct) > self.cap:
            raise ValueError(
                f"batch needs {len(distinct)} distinct pairs > "
                f"stager capacity {self.cap}"
            )
        keep = set(distinct)
        for pi in distinct:
            if pi in self.slot_of:
                self.slot_of.move_to_end(pi)
        missing = [pi for pi in distinct if pi not in self.slot_of]
        if missing:
            slots = []
            for pi in missing:
                if self._free:
                    s = self._free.pop()
                else:
                    evict = None
                    for old in self.slot_of:  # evict LRU outside the batch
                        if old not in keep:
                            evict = old
                            break
                    s = self.slot_of.pop(evict)
                    if self._on_evict is not None:
                        self._on_evict(evict)
                slots.append(s)
                self.slot_of[pi] = s
                self.slot_of.move_to_end(pi)
            host = [self.load_host(pi) for pi in missing]
            # pad the group to a power of two (duplicate rows carry
            # identical data, so scatter order doesn't matter)
            k = 1
            while k < len(host):
                k *= 2
            while len(host) < k:
                host.append(host[-1])
                slots.append(slots[-1])
            upd = jax.tree.map(lambda *xs: np.stack(xs), *host)
            if self.block is None:
                self.block = jax.tree.map(
                    lambda x: jnp.zeros(
                        (self.cap,) + x.shape[1:], x.dtype), upd)
            if self._scatter is None:
                self._scatter = jax.jit(
                    lambda blk, u, sl: jax.tree.map(
                        lambda b, uu: b.at[sl].set(uu), blk, u))
            self.block = self._scatter(
                self.block,
                jax.tree.map(jnp.asarray, upd),
                jnp.asarray(np.asarray(slots, np.int32)),
            )
        return [self.slot_of[pi] for pi in pis]


class DockEngine:
    """Persistent docking engine: per-bucket jitted sampler executables and
    device-resident sample slots survive across `run()` calls.

    A long-lived process (app/serve.py) pays trace+compile once per
    (bucket, batch) class, not once per request — jax.jit caches on the
    function OBJECT, so the transient closures the old dock() built meant
    a full retrace (~25 s host-side even with the persistent compile
    cache) for every call. Staged pairs are keyed by object identity; the
    engine retains a reference to each staged PreparedPair (ids cannot be
    recycled while staged) and drops it on slot eviction.
    """

    def __init__(self, params, net_cfg, sampler_cfg, batch_size: int = 16,
                 keep_trajectory: bool = False, verbose: bool = True,
                 pipeline_depth: int = 2):
        import jax
        import jax.numpy as jnp

        from .. import parallel

        # pin checkpoint params on device ONCE: load_checkpoint returns
        # numpy leaves, and passing those into the jitted dispatch
        # re-transfers every leaf H2D per batch through the relay
        # (hundreds of small transfers per dispatch — measured seconds
        # per batch on the MDN engine)
        self.params = jax.tree.map(jnp.asarray, params)
        self.net_cfg = net_cfg
        self.sampler_cfg = sampler_cfg
        self.batch_size = batch_size
        self.keep_trajectory = keep_trajectory
        self.verbose = verbose
        # in-flight dispatch depth: with depth d, batch k+d-1 is staged and
        # dispatched before batch k's results are pulled D2H, hiding the
        # relay dispatch+harvest round-trips behind device compute (JAX
        # dispatch is async; the stager's scatter is functional, so blocks
        # referenced by in-flight work stay valid across re-staging)
        self.pipeline_depth = max(int(pipeline_depth), 1)
        nd = jax.device_count()
        self.mesh = (parallel.make_mesh()
                     if nd > 1 and batch_size % nd == 0 else None)
        if self.mesh is not None and verbose:
            print(f"[dock] sharding replica batches over {nd} devices")
        self._fns: dict = {}
        self._stagers: dict = {}
        self._registry: dict = {}  # key -> PreparedPair (staged only)
        self._ref_host: dict = {}  # key -> host lig_ref_pos
        self._stage_cap = max(2 * batch_size, 32)

    def _load(self, key):
        s_np = self._registry[key].sample  # one (lazy) npz read per pair
        self._ref_host[key] = np.asarray(s_np.lig_ref_pos)
        return s_np

    def _drop(self, key):
        self._registry.pop(key, None)
        self._ref_host.pop(key, None)

    def close(self):
        for st in self._stagers.values():
            st.close()
        self._stagers.clear()
        self._registry.clear()
        self._ref_host.clear()

    def _fn(self, bucket):
        fn = self._fns.get(bucket)
        if fn is None:
            import jax
            import jax.numpy as jnp

            from .. import sampler as sp

            if self.mesh is None:
                def staged_fn(pr, block, idx, refs, k):
                    b = jax.tree.map(lambda x: x[idx], block)
                    b = b._replace(
                        lig_ref_pos=refs * b.lig_mask[..., None]
                    )
                    return sp.sample(
                        pr, self.net_cfg, self.sampler_cfg, b, k,
                        keep_trajectory=self.keep_trajectory,
                    )

                fn = jax.jit(staged_fn)
            else:
                fn = jax.jit(
                    lambda pr, b, k: sp.sample(
                        pr, self.net_cfg, self.sampler_cfg, b, k,
                        keep_trajectory=self.keep_trajectory,
                    )
                )
            self._fns[bucket] = fn
        return fn

    def run(self, prepared: list, num_poses=40, seed: int = 0) -> list:
        """Dock every (pair, pose) replica; returns PoseResults whose
        pair_idx indexes into `prepared`. `num_poses` is an int or a
        per-pair list (serving requests batch with unequal counts)."""
        import jax
        import jax.numpy as jnp

        from .. import parallel

        batch_size = self.batch_size
        counts = ([num_poses] * len(prepared)
                  if isinstance(num_poses, int) else list(num_poses))
        entries = [
            (i, p) for i in range(len(prepared)) for p in range(counts[i])
        ]
        groups: dict = {}
        for ent in entries:
            groups.setdefault(prepared[ent[0]].bucket, []).append(ent)

        keys_of = [id(p) for p in prepared]
        results: list = []
        key = jax.random.PRNGKey(seed)
        t0 = time.time()
        done = 0
        verbose = self.verbose
        keep_trajectory = self.keep_trajectory

        for bucket, ents in groups.items():
            fn = self._fn(bucket)

            def harvest(pending):
                chunk, res = pending
                lig_pos = np.asarray(res.lig_pos)
                a14 = np.asarray(res.atom14_pos)
                chi = np.asarray(res.chi)
                lt = np.asarray(res.lig_traj) if keep_trajectory else None
                at = (np.asarray(res.atom14_traj)
                      if keep_trajectory else None)
                for j, (pi, po) in enumerate(chunk):
                    results.append(
                        PoseResult(
                            pi, po, lig_pos[j], a14[j], chi[j],
                            lig_traj=lt[:, j] if lt is not None else None,
                            atom14_traj=(at[:, j]
                                         if at is not None else None),
                        )
                    )
                return len(chunk)

            stager = None
            if self.mesh is None:
                stager = self._stagers.get(bucket)
                if stager is None:
                    stager = self._stagers[bucket] = _DeviceStager(
                        self._stage_cap, self._load, on_evict=self._drop)
                # register this call's pairs so the loader can see them
                for i, _ in ents:
                    self._registry[keys_of[i]] = prepared[i]

            from collections import deque

            depth = self.pipeline_depth
            pending: deque = deque()
            for lo in range(0, len(ents), batch_size):
                chunk = ents[lo : lo + batch_size]
                pad = batch_size - len(chunk)
                reps = chunk + [chunk[0]] * pad
                key, sub = jax.random.split(key)
                if self.mesh is None:
                    slots = stager.ensure([keys_of[pi] for pi, _ in reps])
                    # overlap the NEXT batch's host npz reads with this
                    # batch's device time
                    stager.prefetch(
                        [keys_of[pi] for pi, _ in
                         ents[lo + batch_size : lo + 2 * batch_size]])
                    refs = []
                    for pi, po in reps:
                        ref_np = self._ref_host[keys_of[pi]]
                        confs = prepared[pi].conformers
                        if confs is not None:
                            # pose replica po starts from embedded
                            # conformer po % C (init_pose randomizes
                            # torsions/rotation/translation about
                            # lig_ref_pos, so only internal geometry
                            # matters)
                            c = confs[po % confs.shape[0]]
                            r = np.zeros_like(ref_np)
                            r[: c.shape[0]] = c
                        else:
                            r = ref_np
                        refs.append(r)
                    res = _dispatch_with_retry(
                        fn, self.params, stager.block,
                        jnp.asarray(np.asarray(slots, np.int32)),
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
                    batch = parallel.shard_batch(self.mesh, batch)
                    res = fn(self.params, batch, sub)
                # depth-d software pipeline: keep d batches in flight and
                # harvest the oldest only once the queue is full — host
                # staging/H2D/D2H of neighbors overlap device compute
                pending.append((chunk, res))
                if len(pending) >= depth:
                    done += harvest(pending.popleft())
                    if verbose:
                        rate = done / max(time.time() - t0, 1e-9)
                        print(
                            f"[dock] {done}/{len(entries)} poses "
                            f"({rate:.2f}/s)",
                            flush=True,
                        )
            while pending:
                done += harvest(pending.popleft())
                if verbose:
                    rate = done / max(time.time() - t0, 1e-9)
                    print(
                        f"[dock] {done}/{len(entries)} poses "
                        f"({rate:.2f}/s)",
                        flush=True,
                    )
        # keep references only for pairs still holding a device slot
        staged_keys = set()
        for st in self._stagers.values():
            staged_keys.update(st.slot_of)
        for k in list(self._registry):
            if k not in staged_keys:
                self._drop(k)
        return results


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
    results are dropped. One-shot wrapper around DockEngine — long-lived
    processes should hold a DockEngine instead.
    """
    eng = DockEngine(params, net_cfg, sampler_cfg, batch_size=batch_size,
                     keep_trajectory=keep_trajectory, verbose=verbose)
    try:
        return eng.run(prepared, num_poses=num_poses, seed=seed)
    finally:
        eng.close()


class _StagedPoseEngine:
    """Shared machinery for the pose-consuming stages (EC minimize, MDN
    scoring): persistent per-bucket jitted fns + device slot caches (see
    DockEngine for why persistence matters for serving), a 1-deep
    harvest pipeline, and per-batch H2D limited to the pose block plus
    any missing-pair staging group."""

    def __init__(self, batch_size: int = 16, verbose: bool = True,
                 pipeline_depth: int = 2):
        self.batch_size = batch_size
        self.verbose = verbose
        self.pipeline_depth = max(int(pipeline_depth), 1)
        self._fns: dict = {}
        self._stagers: dict = {}
        self._registry: dict = {}  # key -> PreparedPair (staged only)

    # subclasses: _make_fn(bucket), _load_pair(pair), _batch_args(results,
    # idxs), _store(chunk, out, results)

    def _load(self, key):
        return self._load_pair(self._registry[key])

    def _drop(self, key):
        self._registry.pop(key, None)

    def close(self):
        for st in self._stagers.values():
            st.close()
        self._stagers.clear()
        self._registry.clear()

    def run(self, prepared: list, results: list) -> None:
        import jax
        import jax.numpy as jnp

        batch_size = self.batch_size
        keys_of = [id(p) for p in prepared]
        groups: dict = {}
        for k, r in enumerate(results):
            groups.setdefault(prepared[r.pair_idx].bucket, []).append(k)

        for bucket, ridxs in groups.items():
            fn = self._fns.get(bucket)
            if fn is None:
                fn = self._fns[bucket] = jax.jit(self._make_fn())
            stager = self._stagers.get(bucket)
            if stager is None:
                stager = self._stagers[bucket] = _DeviceStager(
                    max(2 * batch_size, 32), self._load,
                    on_evict=self._drop)
            for k in ridxs:
                pi = results[k].pair_idx
                self._registry[keys_of[pi]] = prepared[pi]

            import concurrent.futures as cf
            from collections import deque

            # stage-ahead: batch k+1's host loads AND its H2D+scatter run
            # on one dedicated thread while batch k's dispatch is in
            # flight (the scatter is functional — in-flight batches keep
            # their captured block value; H2D RPCs release the GIL on the
            # one-core box, so this overlaps for real). Single thread =
            # ensure() is never re-entered.
            def stage(lo):
                chunk = ridxs[lo : lo + batch_size]
                pad = batch_size - len(chunk)
                idxs = chunk + [chunk[0]] * pad
                slots = stager.ensure(
                    [keys_of[results[k].pair_idx] for k in idxs])
                stager.prefetch(
                    [keys_of[results[k].pair_idx] for k in
                     ridxs[lo + batch_size : lo + 2 * batch_size]])
                return chunk, idxs, slots, stager.block

            pending: deque = deque()
            with cf.ThreadPoolExecutor(max_workers=1) as stage_pool:
                los = list(range(0, len(ridxs), batch_size))
                fut = stage_pool.submit(stage, los[0])
                for j, lo in enumerate(los):
                    chunk, idxs, slots, blk = fut.result()
                    if j + 1 < len(los):
                        fut = stage_pool.submit(stage, los[j + 1])
                    out = _dispatch_with_retry(
                        fn, blk,
                        jnp.asarray(np.asarray(slots, np.int32)),
                        *self._batch_args(results, idxs))
                    pending.append((chunk, out))
                    if len(pending) >= self.pipeline_depth:
                        self._store(*pending.popleft(), results)
                while pending:
                    self._store(*pending.popleft(), results)
        staged_keys = set()
        for st in self._stagers.values():
            staged_keys.update(st.slot_of)
        for k in list(self._registry):
            if k not in staged_keys:
                self._drop(k)


class ECEngine(_StagedPoseEngine):
    """Persistent vina error-correction engine (see error_correct)."""

    def __init__(self, steps: int = 150, batch_size: int = 16,
                 verbose: bool = True):
        super().__init__(batch_size, verbose)
        self.steps = steps

    def _make_fn(self):
        import jax

        from ..ops import vina

        steps = self.steps

        def staged_fn(block, idx, lp):
            bl, br = jax.tree.map(lambda x: x[idx], block)
            return vina.minimize_batch(lp, bl, br, steps=steps)

        return staged_fn

    def _load_pair(self, pair):
        from ..ops import vina

        b = pair.bucket
        return (vina.build_ligand(pair.lig, b.n_lig, b.n_tor),
                vina.build_receptor(pair.pocket, b.n_atm))

    def _batch_args(self, results, idxs):
        import jax.numpy as jnp

        return (jnp.asarray(np.stack([results[k].lig_pos for k in idxs])),)

    def _store(self, chunk, out, results):
        pos, aff = out
        pos, aff = np.asarray(pos), np.asarray(aff)
        for j, k in enumerate(chunk):
            results[k].lig_pos = pos[j]
            results[k].vina_score = float(aff[j])


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
    lig_pos in place and attaches vina_score. One-shot wrapper around
    ECEngine."""
    t0 = time.time()
    eng = ECEngine(steps=steps, batch_size=batch_size, verbose=verbose)
    try:
        eng.run(prepared, results)
    finally:
        eng.close()
    if verbose:
        print(f"[ec] re-minimized {len(results)} poses on device "
              f"in {time.time() - t0:.1f}s")


class CartesianRelaxEngine(_StagedPoseEngine):
    """Persistent all-atom Cartesian fine-relax engine (see
    cartesian_relax)."""

    def __init__(self, steps: int = 300, lr: float = 0.02,
                 batch_size: int = 16, verbose: bool = True,
                 weights=None):
        super().__init__(batch_size, verbose)
        self.steps = steps
        self.lr = lr
        from ..ops import cartesian

        self.weights = weights or cartesian.RelaxWeights()

    def _make_fn(self):
        import jax

        from ..ops import cartesian

        steps, lr, w = self.steps, self.lr, self.weights

        def staged_fn(block, idx, lp, a14):
            cl, vl, cr = jax.tree.map(lambda x: x[idx], block)
            return cartesian.cartesian_minimize_batch(
                lp, a14, cl, vl, cr, steps=steps, lr=lr, weights=w)

        return staged_fn

    def _load_pair(self, pair):
        from ..ops import cartesian, vina

        b = pair.bucket
        return (cartesian.build_cartesian_ligand(pair.lig, b.n_lig),
                vina.build_ligand(pair.lig, b.n_lig, b.n_tor),
                cartesian.build_cartesian_receptor(pair.pocket, b.n_atm))

    def _batch_args(self, results, idxs):
        import jax.numpy as jnp

        return (
            jnp.asarray(np.stack([results[k].lig_pos for k in idxs])),
            jnp.asarray(np.stack([results[k].atom14_pos for k in idxs])),
        )

    def _store(self, chunk, out, results):
        pos, a14 = out
        pos, a14 = np.asarray(pos), np.asarray(a14)
        for j, k in enumerate(chunk):
            results[k].lig_pos = pos[j]
            results[k].atom14_pos = a14[j]


def cartesian_relax(
    prepared: list,
    results: list,
    steps: int = 300,
    lr: float = 0.02,
    batch_size: int = 16,
    verbose: bool = True,
) -> None:
    """All-atom Cartesian fine-relax of every pose (the OpenMM relax role,
    reference DiffBindFR/relax/pl.py:38-766 — here a batched jitted
    minimizer over ligand Cartesian coordinates + restrained receptor
    heavy-atom displacements, ops/cartesian.py). Repairs the local strain
    and steric clashes pose-space EC cannot reach; updates lig_pos AND
    atom14_pos in place (vina/mdn scores are not touched — ranking
    semantics stay those of the EC/MDN stages). One-shot wrapper around
    CartesianRelaxEngine."""
    t0 = time.time()
    eng = CartesianRelaxEngine(steps=steps, lr=lr, batch_size=batch_size,
                               verbose=verbose)
    try:
        eng.run(prepared, results)
    finally:
        eng.close()
    if verbose:
        print(f"[relax] Cartesian fine-relax of {len(results)} poses "
              f"on device in {time.time() - t0:.1f}s")


class MDNEngine(_StagedPoseEngine):
    """Persistent MDN scoring engine (see score_mdn)."""

    def __init__(self, mdn_params, mdn_cfg, batch_size: int = 16,
                 verbose: bool = True):
        import jax
        import jax.numpy as jnp

        super().__init__(batch_size, verbose)
        # device-pinned once — numpy params would re-transfer every
        # leaf H2D per batch (see DockEngine.__init__)
        self.mdn_params = jax.tree.map(jnp.asarray, mdn_params)
        self.mdn_cfg = mdn_cfg

    def _make_fn(self):
        import jax

        from ..models import mdn_scorer as mdn

        cfg = self.mdn_cfg

        def staged_fn(block, idx, p, lp, a14):
            b = jax.tree.map(lambda x: x[idx], block)
            return mdn.score_batch_both(p, cfg, b, lp, a14)

        return staged_fn

    def _load_pair(self, pair):
        return pair.sample

    def _batch_args(self, results, idxs):
        import jax.numpy as jnp

        return (
            self.mdn_params,
            jnp.asarray(np.stack([results[k].lig_pos for k in idxs])),
            jnp.asarray(np.stack([results[k].atom14_pos for k in idxs])),
        )

    def _store(self, chunk, out, results):
        sp_, nll_ = out
        sp_, nll_ = np.asarray(sp_), np.asarray(nll_)
        for j, k in enumerate(chunk):
            results[k].mdn_score = float(sp_[j])
            results[k].mdn_nll = float(nll_[j])


def score_mdn(
    prepared: list,
    results: list,
    mdn_params,
    mdn_cfg,
    batch_size: int = 16,
    verbose: bool = True,
) -> None:
    """Attach MDN scores to PoseResults in place (higher = better).
    One-shot wrapper around MDNEngine."""
    t0 = time.time()
    eng = MDNEngine(mdn_params, mdn_cfg, batch_size=batch_size,
                    verbose=verbose)
    try:
        eng.run(prepared, results)
    finally:
        eng.close()
    if verbose:
        print(f"[score] MDN scores attached to {len(results)} poses "
              f"in {time.time() - t0:.1f}s")


def _top_results(results, k: int) -> set:
    """Indices of the k best poses per pair (mdn desc, else vina asc,
    else pose order) — the structure-export budget for screens."""
    by_pair: dict = {}
    for i, r in enumerate(results):
        by_pair.setdefault(r.pair_idx, []).append(i)
    keep: set = set()
    for idxs in by_pair.values():
        def key(i):
            r = results[i]
            if r.mdn_score is not None:
                return (-r.mdn_score,)
            if r.vina_score is not None:
                return (r.vina_score,)
            return (r.pose_idx,)
        keep.update(sorted(idxs, key=key)[:k])
    return keep


def _num(v, default: float) -> float:
    """Score-or-default without truthiness: a legitimate 0.0 score must
    not be treated as missing (ADVICE r4)."""
    return default if v is None else v


def export_and_rank(
    prepared: list,
    results: list,
    outdir: str,
    export_structures: bool = True,
    export_pocket: bool = False,
    compute_metrics: bool = True,
    export_top: int = -1,
    verbose: bool = True,
    sidechain_metrics: bool = True,
    cluster_rank: float = 0.0,
    cluster_mode: str = "mean",
) -> str:
    """Write per-pose structures + results.csv + mdn top-1 table.

    `sidechain_metrics` grades the rebuilt pocket side chains per pose
    (chi1<15deg rate + sc-RMSD columns) against `pair.holo_ref` when the
    job named a holo structure (apo->holo workflow), else against the
    input pocket itself — the reference computes both side-chain metrics
    against the prep-time pocket in every eval (evaluation/
    export.py:165-195); redocking randomizes chi at init, so this measures
    side-chain RECOVERY.

    `export_top >= 0` writes structure files only for the top-k poses
    per complex (best mdn, else best vina); other rows keep their scores
    and metrics but leave the file columns empty — at screen scale the
    full-protein PDB per pose dominates wall time (measured 262 s for
    2,400 poses). Returns the results.csv path."""
    t0 = time.time()
    os.makedirs(outdir, exist_ok=True)
    keep = (None if export_top < 0
            else _top_results(results, export_top))
    struct_writer = PoseStructWriter()
    rows = []
    for ri, r in enumerate(results):
        pair = prepared[r.pair_idx]
        pose_dir = os.path.join(
            outdir, pair.job.complex_name, f"pose_{r.pose_idx}"
        )
        props = {}
        if r.mdn_score is not None:
            props["mdn_score"] = f"{r.mdn_score:.6f}"
        write_structs = export_structures and (
            keep is None or ri in keep)
        if write_structs:
            export_pose(
                pose_dir, pair.lig, pair.pocket, pair.protein,
                r.lig_pos, r.atom14_pos,
                export_pocket=export_pocket, props=props,
                struct_writer=struct_writer,
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
            "lig_sdf": (os.path.join(pose_dir, "lig_final.sdf")
                        if write_structs else ""),
            "prot_pdb": (os.path.join(pose_dir, "prot_final.pdb")
                         if write_structs else ""),
            "mdn_score": r.mdn_score,
            "mdn_nll": r.mdn_nll,
            "vina_score": r.vina_score,
        }
        if compute_metrics:
            holo = getattr(pair, "holo_ref", None)
            if holo is None:
                holo = pair.pocket
            if pair.crystal_pos is not None or sidechain_metrics:
                m = pose_metrics(
                    pair.lig, pair.pocket, r.lig_pos, r.atom14_pos,
                    crystal_lig_pos=pair.crystal_pos,
                    holo_pocket=holo if sidechain_metrics else None,
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
            if c not in best or _num(row["mdn_score"], -1e30) > _num(
                best[c]["mdn_score"], -1e30
            ):
                best[c] = row
        top_csv = os.path.join(outdir, "results_mdn_top1.csv")
        with open(top_csv, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=fields)
            w.writeheader()
            w.writerows(best.values())

    # mdn_nll top-1 per complex (lower = better; the contact-count-
    # invariant mode — measured the stronger POSE ranker with the
    # pose-discrimination-trained scorer, ROUND4_NOTES)
    if any(row["mdn_nll"] is not None for row in rows):
        best = {}
        for row in rows:
            c = row["complex_name"]
            if c not in best or _num(row["mdn_nll"], 1e30) < _num(
                best[c]["mdn_nll"], 1e30
            ):
                best[c] = row
        with open(
            os.path.join(outdir, "results_mdn_nll_top1.csv"), "w",
            newline="",
        ) as fh:
            w = csv.DictWriter(fh, fieldnames=fields)
            w.writeheader()
            w.writerows(best.values())

    # clustered top-1 per complex (app/cluster.py): single-linkage at
    # `cluster_rank` A over symmetric pose RMSDs, clusters ordered by
    # `cluster_mode` over mdn_nll, representative = best member. Across
    # two full-protocol pose draws the robust accuracy lever is the pose
    # BUDGET itself; cluster-vs-raw ranking is within draw noise at n=5
    # (ROUND5_NOTES 5/5b), so this stays an option, not the default.
    if cluster_rank > 0:
        have_nll = any(row["mdn_nll"] is not None for row in rows)
        have_vina = any(row["vina_score"] is not None for row in rows)
        score_col = "mdn_nll" if have_nll else (
            "vina_score" if have_vina else None)
        if score_col is None:
            print("[cluster] --cluster-rank requested but no pose has an "
                  "mdn_nll or vina_score (no -mdn and no EC stage?); "
                  "results_cluster_top1.csv NOT written")
        elif score_col != "mdn_nll":
            print("[cluster] no mdn_nll scores (no -mdn checkpoint); "
                  "cluster-ranking by vina_score instead")
    else:
        score_col = None
    if score_col is not None:
        from . import cluster as CL

        by_pair_rows: dict = {}
        for ri, r in enumerate(results):
            by_pair_rows.setdefault(r.pair_idx, []).append(ri)
        best = {}
        for pi, ris in by_pair_rows.items():
            pair = prepared[pi]
            scores = np.asarray(
                [_num(rows[ri][score_col], 1e30) for ri in ris])
            na = pair.lig.num_atoms
            lp = np.stack(
                [np.asarray(results[ri].lig_pos)[:na] for ri in ris])
            dmat = CL.pose_rmsd_matrix(lp, pair.lig.bonds,
                                       pair.lig.elements)
            labels = CL.single_linkage(dmat, cluster_rank)
            order = CL.cluster_rank(labels, scores, cluster_mode)
            best[pair.job.complex_name] = rows[ris[order[0]]]
        with open(
            os.path.join(outdir, "results_cluster_top1.csv"), "w",
            newline="",
        ) as fh:
            w = csv.DictWriter(fh, fieldnames=fields)
            w.writeheader()
            w.writerows(best.values())

    # vina top-1 per complex (reference *_smina_top1.csv; lower = better)
    if any(row["vina_score"] is not None for row in rows):
        best = {}
        for row in rows:
            c = row["complex_name"]
            if c not in best or _num(row["vina_score"], 1e30) < _num(
                best[c]["vina_score"], 1e30
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


def save_poses(outdir: str, prepared: list, results: list,
               name: str = "poses.npz") -> str:
    """Persist the final pose arrays of a run to `<outdir>/poses.npz` so
    scoring can be re-run on them without re-docking (the iteration/
    rescoring surface; reference KarmaDock scoring consumes saved poses
    the same way, DiffBindFR/scoring/dataset). Per complex the file holds
    the stacked padded pose block `{name}|lig_pos` [P, NL_pad, 3],
    `{name}|atom14_pos` [P, R_pad, 14, 3], `{name}|pose_idx` [P] and
    `{name}|vina` [P] (nan where absent); shapes are the pair's bucket
    shapes, matching what MDNEngine expects. Atomic write; returns the
    path."""
    by_pair: dict = {}
    for r in results:
        by_pair.setdefault(r.pair_idx, []).append(r)
    arrs = {}
    for pi, rs in by_pair.items():
        nm = prepared[pi].job.complex_name
        arrs[nm + "|lig_pos"] = np.stack([r.lig_pos for r in rs])
        arrs[nm + "|atom14_pos"] = np.stack([r.atom14_pos for r in rs])
        arrs[nm + "|pose_idx"] = np.asarray(
            [r.pose_idx for r in rs], np.int32)
        arrs[nm + "|vina"] = np.asarray(
            [np.nan if r.vina_score is None else r.vina_score for r in rs],
            np.float32)
    path = os.path.join(outdir, name)
    tmp = path + f".{os.getpid()}.tmp"
    np.savez(tmp, **arrs)
    os.replace(tmp + ".npz", path)
    return path


def load_poses(path: str, prepared: list) -> list:
    """Rebuild the PoseResult list from a `save_poses` file for the pairs
    in `prepared` (matched by complex_name; pairs without saved poses are
    skipped with a warning)."""
    data = np.load(path)
    names = {k.split("|")[0] for k in data.files}
    results = []
    for pi, pair in enumerate(prepared):
        nm = pair.job.complex_name
        if nm not in names:
            print(f"[poses] WARNING: no saved poses for {nm}")
            continue
        lp = data[nm + "|lig_pos"]
        a14 = data[nm + "|atom14_pos"]
        pidx = data[nm + "|pose_idx"]
        vina = data[nm + "|vina"]
        for j in range(lp.shape[0]):
            results.append(PoseResult(
                pair_idx=pi, pose_idx=int(pidx[j]), lig_pos=lp[j],
                atom14_pos=a14[j], chi=np.zeros(0, np.float32),
                vina_score=None if np.isnan(vina[j]) else float(vina[j]),
            ))
    return results


def write_failures(outdir: str, failures: list) -> None:
    if not failures:
        return
    with open(os.path.join(outdir, "failed.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["complex_name", "stage", "error"])
        for f in failures:
            w.writerow([f.complex_name, f.stage, f.error])
