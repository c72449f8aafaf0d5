"""App layer: jobs, reporter, validity checks on real example inputs."""
import os

import numpy as np
import pytest

from diffbindfr_tpu.app import jobs as J
from diffbindfr_tpu.app import reporter as R
from diffbindfr_tpu.app import validity as V
from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
from diffbindfr_tpu.chem.mol import perceive
from diffbindfr_tpu.chem.protein_feats import build_pocket_record
from diffbindfr_tpu.io.pdb import parse_pdb
from diffbindfr_tpu.io.sdf import parse_sdf

FWD = "/root/reference/examples/forward"


def test_make_jobs_autodiscovery():
    jobs = J.make_jobs(
        os.path.join(FWD, "mols"), os.path.join(FWD, "3dbs_protein.pdb")
    )
    assert len(jobs) == 15  # 15 ligands x 1 receptor
    assert all(j.crystal_ligand and j.crystal_ligand.endswith("_crystal.sdf")
               for j in jobs)
    kind, ref = jobs[0].pocket_ref()
    assert kind == "crystal"
    sl = J.job_slice(jobs, 2, 10, 2)
    assert len(sl) == 4


def test_jobs_csv_roundtrip(tmp_path):
    jobs = J.make_jobs(
        os.path.join(FWD, "mols"), os.path.join(FWD, "3dbs_protein.pdb")
    )[:3]
    jobs[1].center = (1.0, 2.0, 3.5)
    p = str(tmp_path / "jobs.csv")
    J.save_jobs_csv(p, jobs)
    back = J.load_jobs_csv(p)
    assert back[1].center == (1.0, 2.0, 3.5)
    assert back[0].complex_name == jobs[0].complex_name


def test_reporter_rates():
    rows = []
    # complex A: pose 0 bad, pose 1 good; mdn prefers pose 1
    rows.append(dict(complex_name="A", pose=0, l_rmsd=8.0, centroid=4.0,
                     mdn_score=0.1, vina_score=-2.0))
    rows.append(dict(complex_name="A", pose=1, l_rmsd=1.0, centroid=0.5,
                     mdn_score=0.9, vina_score=-1.0))
    # complex B: all poses bad
    rows.append(dict(complex_name="B", pose=0, l_rmsd=5.0, centroid=3.0,
                     mdn_score=0.5, vina_score=-3.0))
    rates = R.success_rates(rows, "mdn")
    assert rates["l_rmsd"][1] == 0.5  # A top-1 good, B bad
    rates_v = R.success_rates(rows, "vina")
    assert rates_v["l_rmsd"][1] == 0.0  # vina picks A pose 0 (lower score)
    assert rates_v["l_rmsd"][3] == 0.5
    txt = R.format_report(rows)
    assert "top-1" in txt and "l_rmsd" in txt


@pytest.fixture(scope="module")
def real_pair():
    prot = parse_pdb(os.path.join(FWD, "3dbs_protein.pdb"))
    lig = featurize_ligand(
        perceive(parse_sdf(os.path.join(FWD, "3dbs_protein_crystal.sdf"))[0]),
        "3dbs",
    )
    pocket = build_pocket_record(prot, lig.pos, cutoff=8.0)
    lig.pos = lig.pos - pocket.center
    return lig, pocket


def test_validity_crystal_pose_passes(real_pair):
    lig, pocket = real_pair
    checks = V.check_pose(lig, pocket, lig.pos)
    assert checks["bond_lengths"] and checks["bond_angles"]
    assert checks["internal_clash"]
    assert checks["in_pocket"]


def test_validity_catches_garbage(real_pair):
    lig, pocket = real_pair
    rng = np.random.default_rng(0)
    garbage = lig.pos + rng.normal(size=lig.pos.shape) * 2.0
    checks = V.check_pose(lig, pocket, garbage)
    assert not checks["bond_lengths"]
    assert not checks["pass"]
    # squashed ligand: internal clash
    squashed = lig.pos * 0.3
    checks2 = V.check_pose(lig, pocket, squashed)
    assert not checks2["internal_clash"]
    # far away: not in pocket
    far = lig.pos + 200.0
    assert not V.check_pose(lig, pocket, far)["in_pocket"]


def test_atom_graph_k16_retention(real_pair):
    """The atom graph truncates the reference's unbounded radius-4A list
    (tpscore.py:602-622) to K=16 nearest neighbors. On a real 12A pocket
    the truncation must retain >= 99% of the radius-4A edges."""
    prot = parse_pdb(os.path.join(FWD, "3dbs_protein.pdb"))
    lig = featurize_ligand(
        perceive(parse_sdf(os.path.join(FWD, "3dbs_protein_crystal.sdf"))[0]),
        "3dbs",
    )
    pocket = build_pocket_record(prot, lig.pos, cutoff=12.0)
    lig.pos = lig.pos - pocket.center
    from diffbindfr_tpu.data.sample import make_sample

    s = make_sample(lig, pocket)
    pos = s.atm_pos[s.atm_mask > 0]
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    np.fill_diagonal(d, 1e9)
    within = d <= 4.0
    total = int(within.sum())
    kept = int(np.minimum(within.sum(axis=1), 16).sum())
    assert total > 0
    retention = kept / total
    assert retention >= 0.99, f"K=16 retains only {retention:.4f} of radius-4A edges"


def test_parallel_prep_resume(tmp_path):
    """Parallel featurization (spawn pool) must produce byte-identical
    samples to serial prep, preserve job order, resume instantly from the
    per-pair cache, and tolerate a stale/corrupt cache entry."""
    from diffbindfr_tpu.app import jobs as J
    from diffbindfr_tpu.app import pipeline as P

    jobs = J.make_jobs(
        [os.path.join(FWD, "mols")], [os.path.join(FWD, "3dbs_protein.pdb")]
    )[:6]
    cache = str(tmp_path / "cache")
    par, pf = P.prep(jobs, pocket_radius=8.0, cache_dir=cache,
                     num_workers=2, chunk_size=2, verbose=False)
    ser, sf = P.prep(jobs, pocket_radius=8.0, verbose=False)
    assert not pf and not sf
    assert [p.job.complex_name for p in par] == [p.job.complex_name for p in ser]
    for a, b in zip(par, ser):
        for f in a.sample._fields:
            np.testing.assert_array_equal(
                getattr(a.sample, f), getattr(b.sample, f)
            )
    # resume: no worker pool needed, same result
    t0 = __import__("time").time()
    par2, _ = P.prep(jobs, pocket_radius=8.0, cache_dir=cache,
                     num_workers=2, verbose=False)
    assert __import__("time").time() - t0 < 2.0
    assert [p.job.complex_name for p in par2] == [p.job.complex_name for p in par]
    # corrupt one cache entry -> recomputed, not fatal
    import glob

    victim = sorted(glob.glob(os.path.join(cache, "*.rec.pkl")))[0]
    with open(victim, "wb") as fh:
        fh.write(b"garbage")
    par3, pf3 = P.prep(jobs, pocket_radius=8.0, cache_dir=cache,
                       num_workers=2, verbose=False)
    assert not pf3 and len(par3) == 6


def test_validity_stereo_checks(real_pair):
    """Mirror image must fail tetrahedral stereo; a 180-deg rotation about a
    stereo double bond must fail double_bond_stereo (PoseBusters chemistry
    checks, pb.py via posebusters redock config)."""
    lig, pocket = real_pair
    mirror = lig.pos * np.array([-1.0, 1.0, 1.0])
    # re-center so the mirror stays in the pocket (isolate the stereo check)
    mirror = mirror - mirror.mean(0) + lig.pos.mean(0)
    checks = V.check_pose(lig, pocket, mirror)
    assert not checks["tetrahedral_stereo"]

    # rotate one fragment of a stereo double bond by 180 deg, if any exist
    dbs = V._stereo_double_bonds(lig)
    if dbs:
        a, b, sa, sb, _, _ = dbs[0]
        pos = lig.pos.copy()
        axis = pos[b] - pos[a]
        n = axis / np.linalg.norm(axis)
        K = np.array([[0, -n[2], n[1]], [n[2], 0, -n[0]], [-n[1], n[0], 0]])
        R = np.eye(3) + 2 * (K @ K)  # Rodrigues at theta=pi
        # rotate everything on the b side (BFS from sb avoiding the a-b bond)
        import networkx as nx

        g = nx.Graph(list(map(tuple, lig.bonds)))
        g.remove_edge(a, b)
        side = list(nx.node_connected_component(g, b))
        pos[side] = (pos[side] - pos[a]) @ R.T + pos[a]
        checks = V.check_pose(lig, pocket, pos)
        assert not checks["double_bond_stereo"]


def test_validity_internal_energy_and_overlap(real_pair):
    lig, pocket = real_pair
    r = V.internal_energy_ratio(lig, lig.pos[: lig.num_atoms])
    assert r < 5.0  # crystal pose is near strain-free
    # squashing the ligand into the protein must blow up volume overlap
    exists = pocket.atom14_mask.astype(bool)
    ppos = pocket.atom14_pos[exists]
    frac = V.volume_overlap_fraction(
        ppos[: lig.num_atoms], V._vdw_radii(lig.elements)[: lig.num_atoms],
        ppos, V._pocket_radii(pocket),
    )
    assert frac > 0.5


def test_device_stager_slots_and_gather():
    """_DeviceStager: grouped staging, LRU eviction, gather correctness."""
    import jax
    import jax.numpy as jnp

    from diffbindfr_tpu.app.pipeline import _DeviceStager

    loads = []

    def load(pi):
        loads.append(pi)
        return {"a": np.full((3,), float(pi), np.float32),
                "b": np.full((2, 2), float(10 * pi), np.float32)}

    st = _DeviceStager(4, load, prefetch_workers=0)
    # batch 1: three distinct pairs, one duplicated
    slots = st.ensure([0, 1, 1, 2])
    assert len(slots) == 4 and slots[1] == slots[2]
    assert sorted(set(loads)) == [0, 1, 2]
    gathered = jax.tree.map(
        lambda x: np.asarray(x[jnp.asarray(slots)]), st.block)
    np.testing.assert_array_equal(gathered["a"][:, 0], [0.0, 1.0, 1.0, 2.0])

    # batch 2: pair 3 + repeat of 0 — no reload of 0
    loads.clear()
    slots = st.ensure([3, 0])
    assert loads == [3]
    gathered = jax.tree.map(
        lambda x: np.asarray(x[jnp.asarray(slots)]), st.block)
    np.testing.assert_array_equal(gathered["b"][:, 0, 0], [30.0, 0.0])

    # batch 3: two new pairs force LRU eviction (capacity 4); the evictees
    # are the least recently used (1 and 2), and re-ensuring one reloads it
    loads.clear()
    slots = st.ensure([4, 5])
    assert sorted(loads) == [4, 5]
    assert 1 not in st.slot_of and 2 not in st.slot_of
    assert 0 in st.slot_of and 3 in st.slot_of
    loads.clear()
    st.ensure([1])
    assert loads == [1]

    # capacity overflow is an explicit error
    with pytest.raises(ValueError):
        st.ensure([10, 11, 12, 13, 14])


def test_device_stager_prefetch():
    """Prefetched host loads are consumed by ensure without reloading."""
    import threading

    from diffbindfr_tpu.app.pipeline import _DeviceStager

    tids = []

    def load(pi):
        tids.append(threading.get_ident())
        return {"a": np.full((2,), float(pi), np.float32)}

    st = _DeviceStager(4, load, prefetch_workers=2)
    st.prefetch([7, 8])
    st.ensure([7, 8])
    # both loads ran on pool threads, none on the main thread
    assert len(tids) == 2
    assert threading.get_ident() not in tids
    st.close()


def test_export_top_k_limits_structure_files(real_pair, tmp_path):
    """export_top=K writes files only for the K best poses per complex;
    all rows keep scores, non-exported rows have empty file columns."""
    import csv as _csv

    from diffbindfr_tpu.app import pipeline as P
    from diffbindfr_tpu.io.pdb import parse_pdb

    lig, pocket = real_pair
    prot = parse_pdb(os.path.join(FWD, "3dbs_protein.pdb"))

    class Pair:
        pass

    pair = Pair()
    pair.job = type("J", (), {"complex_name": "cplx"})()
    pair.lig, pair.pocket, pair.crystal_pos = lig, pocket, None
    pair._protein = prot
    Pair.protein = property(lambda self: self._protein)

    results = []
    for k in range(4):
        r = P.PoseResult(0, k, lig.pos.copy(), pocket.atom14_pos.copy(),
                         np.zeros((pocket.num_res, 4), np.float32))
        r.mdn_score = float(k)  # pose 3 is best
        results.append(r)

    out = str(tmp_path / "exp")
    res_csv = P.export_and_rank([pair], results, out, export_top=2,
                                verbose=False)
    rows = list(_csv.DictReader(open(res_csv)))
    assert len(rows) == 4
    with_files = [r for r in rows if r["lig_sdf"]]
    assert len(with_files) == 2
    assert sorted(int(r["pose"]) for r in with_files) == [2, 3]
    for r in rows:
        assert r["mdn_score"] != ""
        if r["lig_sdf"]:
            assert os.path.exists(r["lig_sdf"])
            assert os.path.exists(r["prot_pdb"])
    # poses 0/1 wrote nothing
    assert not os.path.exists(os.path.join(out, "cplx", "pose_0"))
    # top-1 tables still rank over ALL rows
    top = list(_csv.DictReader(
        open(os.path.join(out, "results_mdn_top1.csv"))))
    assert top[0]["pose"] == "3"


def test_dispatch_retry_on_transient_compile_failure():
    """One retry on remote-compile infrastructure failures, immediate
    re-raise on anything else."""
    from diffbindfr_tpu.app.pipeline import _dispatch_with_retry

    calls = {"n": 0}

    def flaky(x):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:8103/remote_compile: read "
                "body: response body closed before all bytes were read")
        return x + 1

    assert _dispatch_retry_helper(flaky) == 42

    def broken(x):
        raise ValueError("real bug")

    with pytest.raises(ValueError):
        _dispatch_with_retry(broken, 1)

    def always_transient(x):
        raise RuntimeError("remote_compile: response body closed")

    with pytest.raises(RuntimeError):
        _dispatch_with_retry(always_transient, 1)


def _dispatch_retry_helper(flaky):
    from diffbindfr_tpu.app.pipeline import _dispatch_with_retry

    return _dispatch_with_retry(flaky, 41)


# ---------------------------------------------------------------------------
# side-chain metric wiring (the flexible-receptor eval axis)
# ---------------------------------------------------------------------------


def test_export_and_rank_sidechain_metrics(real_pair, tmp_path):
    """export_and_rank grades chi1/sc-RMSD against the input pocket by
    default (redock semantics, reference export.py:165-195): the crystal
    pose scores perfectly, a chi-scrambled pocket does not."""
    import csv as _csv

    from diffbindfr_tpu.app import pipeline as P
    from diffbindfr_tpu.io.pdb import parse_pdb

    lig, pocket = real_pair
    prot = parse_pdb(os.path.join(FWD, "3dbs_protein.pdb"))

    class Pair:
        holo_ref = None
        protein = property(lambda self: self._protein)

    pair = Pair()
    pair.job = type("J", (), {"complex_name": "cplx"})()
    pair.lig, pair.pocket, pair.crystal_pos = lig, pocket, None
    pair._protein = prot

    # pose 0: exact input pocket; pose 1: side-chain atoms displaced
    a14_bad = pocket.atom14_pos.copy()
    a14_bad[:, 4:] += 1.5
    results = [
        P.PoseResult(0, 0, lig.pos.copy(), pocket.atom14_pos.copy(),
                     np.zeros((pocket.num_res, 4), np.float32)),
        P.PoseResult(0, 1, lig.pos.copy(), a14_bad,
                     np.zeros((pocket.num_res, 4), np.float32)),
    ]
    res_csv = P.export_and_rank([pair], results, str(tmp_path / "sc"),
                                export_structures=False, verbose=False)
    rows = {r["pose"]: r for r in _csv.DictReader(open(res_csv))}
    assert float(rows["0"]["chi1_rate"]) == 1.0
    assert float(rows["0"]["sc_rmsd"]) < 1e-4
    assert float(rows["1"]["sc_rmsd"]) > 1.0
    assert float(rows["1"]["chi1_rate"]) < 0.5


def test_build_holo_ref_roundtrip(real_pair):
    """A holo reference built from the SAME structure matches every pocket
    residue and grades the input pose perfect, even after a rigid motion
    of the holo frame (the CA Kabsch must absorb it)."""
    from diffbindfr_tpu.app.analysis import build_holo_ref
    from diffbindfr_tpu.app.export import pose_metrics
    from diffbindfr_tpu.io.pdb import parse_pdb

    lig, pocket = real_pair
    prot = parse_pdb(os.path.join(FWD, "3dbs_protein.pdb"))
    ref = build_holo_ref(pocket, prot)
    assert ref.n_matched == pocket.num_res
    assert ref.ca_rmsd < 1e-3

    m = pose_metrics(lig, pocket, lig.pos, pocket.atom14_pos,
                     holo_pocket=ref)
    assert m.chi1_rate == 1.0 and m.sc_rmsd < 1e-3

    # rigidly move the "holo" structure: Kabsch must recover the frame
    import dataclasses as _dc

    th = 0.7
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0],
                    [0, 0, 1.0]], np.float64)
    moved = _dc.replace(
        prot, atom_positions=(prot.atom_positions @ rot.T + 5.0).astype(
            prot.atom_positions.dtype))
    ref2 = build_holo_ref(pocket, moved)
    assert ref2.ca_rmsd < 1e-3
    m2 = pose_metrics(lig, pocket, lig.pos, pocket.atom14_pos,
                      holo_pocket=ref2)
    assert m2.chi1_rate == 1.0 and m2.sc_rmsd < 1e-3


def test_prep_builds_holo_ref(tmp_path):
    """prep() with job.holo_protein attaches a HoloRef (and caches it)."""
    from diffbindfr_tpu.app import pipeline as P

    job = J.Job(
        protein=os.path.join(FWD, "3dbs_protein.pdb"),
        protein_name="3dbs",
        ligand=os.path.join(FWD, "3dbs_protein_crystal.sdf"),
        ligand_name="3dbs", complex_name="3dbs",
        crystal_ligand=os.path.join(FWD, "3dbs_protein_crystal.sdf"),
        holo_protein=os.path.join(FWD, "3dbs_protein.pdb"),
    )
    cache = str(tmp_path / "cache")
    prepared, failures = P.prep([job], cache_dir=cache, verbose=False)
    assert not failures and prepared[0].holo_ref is not None
    assert prepared[0].holo_ref.n_matched == prepared[0].pocket.num_res
    # second prep resolves from cache, holo_ref included
    prepared2, _ = P.prep([job], cache_dir=cache, verbose=False)
    assert prepared2[0].holo_ref is not None


def test_pose_clustering(real_pair):
    """Symmetric-RMSD single-linkage + cluster ranking: two tight basins
    of poses, the scorer noisy on single poses — cluster ranking must
    pick from the consistent basin."""
    from diffbindfr_tpu.app import cluster as C

    lig, _ = real_pair
    na = lig.num_atoms
    rng = np.random.default_rng(3)
    base = lig.pos[:na]
    # basin A: 5 poses jittered 0.2 A; basin B: 3 poses shifted 8 A
    poses = np.stack(
        [base + rng.normal(scale=0.2, size=(na, 3)) for _ in range(5)]
        + [base + 8.0 + rng.normal(scale=0.2, size=(na, 3))
           for _ in range(3)]).astype(np.float32)
    d = C.pose_rmsd_matrix(poses, lig.bonds, lig.elements)
    assert d.shape == (8, 8)
    assert np.allclose(np.diag(d), 0.0, atol=1e-5)
    labels = C.single_linkage(d, 2.0)
    assert len(set(labels[:5])) == 1 and len(set(labels[5:])) == 1
    assert labels[0] != labels[5]

    # scores: basin B holds the single best (noisy outlier) score, but
    # basin A wins on mean; `mean` mode must rank basin A's rep first
    scores = np.array([2.0, 2.1, 2.2, 2.3, 2.4, 1.0, 9.0, 9.5])
    ranked_best = C.cluster_rank(labels, scores, "best")
    assert ranked_best[0] == 5  # best-member mode follows the outlier
    ranked_mean = C.cluster_rank(labels, scores, "mean")
    assert labels[ranked_mean[0]] == labels[0]  # mean mode picks basin A
    ranked_size = C.cluster_rank(labels, scores, "size")
    assert labels[ranked_size[0]] == labels[0]  # size mode too
    # representative of a cluster = its best-scoring member
    assert ranked_mean[0] == 0


def test_expand_ligand_library(tmp_path):
    """Multi-molecule SDF -> one job per record via path#<i> addressing;
    single-molecule files and already-addressed jobs pass through."""
    from diffbindfr_tpu.io.sdf import parse_ligand_file, parse_sdf

    src = parse_sdf(
        "/root/reference/examples/forward/3dbs_protein_crystal.sdf")[0]
    from diffbindfr_tpu.io.sdf import to_sdf_block

    lib = tmp_path / "lib.sdf"
    blocks = []
    for i in range(3):
        m = src
        blocks.append(to_sdf_block(m, coords=m.coords + i))
    lib.write_text("".join(blocks))
    single = tmp_path / "one.sdf"
    single.write_text(to_sdf_block(src))

    # record addressing in the parser
    rec1 = parse_ligand_file(f"{lib}#1")
    assert len(rec1) == 1
    assert np.allclose(rec1[0].coords, src.coords + 1, atol=1e-3)
    with pytest.raises(IndexError):
        parse_ligand_file(f"{lib}#7")

    jobs = [
        J.Job(protein="p.pdb", protein_name="p", ligand=str(lib),
              ligand_name="lib", complex_name="p_lib",
              center=(0.0, 0.0, 0.0)),
        J.Job(protein="p.pdb", protein_name="p", ligand=str(single),
              ligand_name="one", complex_name="p_one",
              center=(0.0, 0.0, 0.0)),
    ]
    out = J.expand_ligand_library(jobs)
    assert len(out) == 4  # 3 records + 1 single
    addressed = [j for j in out if "#" in j.ligand]
    assert len(addressed) == 3
    assert {j.ligand for j in addressed} == {
        f"{lib}#0", f"{lib}#1", f"{lib}#2"}
    # unique complex names (same title line on every record)
    assert len({j.complex_name for j in out}) == 4
    # pocket definition carried through
    assert all(j.center == (0.0, 0.0, 0.0) for j in addressed)
    # idempotent: re-expanding leaves addressed jobs alone
    assert len(J.expand_ligand_library(out)) == 4


def test_prep_cache_holo_ref_semantics(tmp_path):
    """The prep cache must never silently change what side-chain metrics
    are graded against: a record written by an apo->holo run must not
    attach its holo_ref to a plain redock job, and a job naming a
    DIFFERENT holo structure must not reuse a stale reference."""
    import shutil

    from diffbindfr_tpu.app import pipeline as P

    fwd = "/root/reference/examples/forward"
    prot = f"{fwd}/3dbs_protein.pdb"
    lig = f"{fwd}/3dbs_protein_crystal.sdf"
    cache = str(tmp_path / "cache")

    def job(holo=None):
        return J.Job(protein=prot, protein_name="3dbs", ligand=lig,
                     ligand_name="lig", complex_name="3dbs_lig",
                     crystal_ligand=lig, holo_protein=holo)

    # 1. plain redock populates the cache with holo_ref=None
    prepared, failures = P.prep([job()], pocket_radius=8.0,
                                cache_dir=cache, verbose=False)
    assert not failures and prepared[0].holo_ref is None

    # 2. apo->holo job on the same cache: must RECOMPUTE (not hit the
    #    holo-free record) and build a reference from the named holo
    prepared, failures = P.prep([job(holo=prot)], pocket_radius=8.0,
                                cache_dir=cache, verbose=False)
    assert not failures
    hr = prepared[0].holo_ref
    assert hr is not None and hr.n_matched > 0
    assert hr.ca_rmsd < 1e-3  # holo == apo here: perfect CA fit

    # 3. plain redock again: the cached record now CARRIES a holo_ref,
    #    but a job that didn't ask for one must not receive it
    prepared, failures = P.prep([job()], pocket_radius=8.0,
                                cache_dir=cache, verbose=False)
    assert not failures and prepared[0].holo_ref is None

    # 4. different holo path: the stale reference must not be reused
    other = str(tmp_path / "other_holo.pdb")
    shutil.copy(prot, other)
    prepared, failures = P.prep([job(holo=other)], pocket_radius=8.0,
                                cache_dir=cache, verbose=False)
    assert not failures
    assert prepared[0].holo_ref is not None


def test_build_holo_ref_chain_aware(tmp_path):
    """Multi-chain receptors with overlapping residue numbering: pocket
    residues on chain B must match chain-B holo rows, not the first
    chain that happens to share (resnum, aatype)."""
    from diffbindfr_tpu.app.analysis import build_holo_ref
    from diffbindfr_tpu.chem.protein_feats import build_pocket_record

    src = "/root/reference/examples/forward/3dbs_protein.pdb"
    lines_a, lines_b = [], []
    for ln in open(src):
        if not ln.startswith(("ATOM", "HETATM")):
            continue
        try:
            resnum = int(ln[22:26])
        except ValueError:
            continue
        if not (143 <= resnum <= 260):
            continue
        lines_a.append(ln[:21] + "A" + ln[22:])
        x = float(ln[30:38]) + 50.0
        lines_b.append(ln[:21] + "B" + ln[22:30] + f"{x:8.3f}" + ln[38:])
    two = tmp_path / "dimer.pdb"
    two.write_text("".join(lines_a) + "TER\n" + "".join(lines_b) + "END\n")

    prot = parse_pdb(str(two))
    assert prot.chain_ids == ["A", "B"]
    b_rows = np.nonzero(prot.chain_index == 1)[0]
    # pocket around chain B's centroid (CA atom = atom37 slot 1)
    center = prot.atom_positions[b_rows, 1].mean(0, keepdims=True)
    pocket = build_pocket_record(prot, center, cutoff=15.0)
    assert pocket.chain_ids == ["A", "B"]
    assert (pocket.chain_index == 1).all(), "pocket should be chain B only"

    hr = build_holo_ref(pocket, prot)
    assert hr.n_matched == pocket.num_res
    # the matched reference coordinates must be chain B's (x shifted by
    # +50): compare CA positions against the pocket's own world-frame CAs
    apo_ca = pocket.atom14_pos[:, 1] + pocket.center[None, :]
    ca_ok = (hr.atom14_mask[:, 1] > 0) & (pocket.atom14_mask[:, 1] > 0)
    d = np.abs(hr.atom14_pos[ca_ok, 1] - apo_ca[ca_ok])
    assert d.max() < 1e-3, (
        "holo reference matched the wrong chain (chain-A rows)")


def test_record_addressed_parse_cached(tmp_path, monkeypatch):
    """lib.sdf#i lookups parse the library file once, not once per
    record (an N-record screen would otherwise be O(N^2))."""
    from diffbindfr_tpu.io import sdf as S

    src = S.parse_sdf(
        "/root/reference/examples/forward/3dbs_protein_crystal.sdf")[0]
    lib = tmp_path / "lib.sdf"
    lib.write_text("".join(S.to_sdf_block(src, coords=src.coords + i)
                           for i in range(4)))
    calls = []
    real = S.parse_sdf
    monkeypatch.setattr(S, "parse_sdf",
                        lambda p, **kw: calls.append(p) or real(p, **kw))
    S._PARSED_CACHE.clear()
    for i in range(4):
        (m,) = S.parse_ligand_file(f"{lib}#{i}")
        assert np.allclose(m.coords, src.coords + i, atol=1e-3)
    assert len(calls) == 1, calls
