"""Streaming training data layer (data/stream.py): manifest, shuffle
buffer, host sharding, grouped dynamic batching, prefetch, and the
train_cli --stream-cache path.

Reference roles: druglib/datasets/samplers/{group_sampler,
distributed_sampler}.py + LMDB custom_dataset.py:28.
"""
import os

import numpy as np
import pytest

from diffbindfr_tpu.data import stream as DS
from diffbindfr_tpu.data.sample import Buckets, DockingSample

B_SMALL = Buckets(n_lig=4, n_lig_edges=6, n_tor=2, n_res=3, n_atm=8)
B_MED = Buckets(n_lig=8, n_lig_edges=12, n_tor=3, n_res=4, n_atm=16)
B_BIG = Buckets(n_lig=16, n_lig_edges=24, n_tor=4, n_res=6, n_atm=32)


def fake_sample(b: Buckets, seed: int = 0) -> DockingSample:
    """Schema-valid random sample padded to bucket `b` (content is never
    interpreted by the stream layer, only stacked)."""
    r = np.random.default_rng(seed)
    f32 = lambda *s: r.normal(size=s).astype(np.float32)  # noqa: E731
    i32 = lambda *s: r.integers(0, 2, size=s).astype(np.int32)  # noqa: E731
    return DockingSample(
        lig_feat=f32(b.n_lig, 27), lig_pos=f32(b.n_lig, 3),
        lig_ref_pos=f32(b.n_lig, 3), lig_mask=f32(b.n_lig),
        lig_e_src=i32(b.n_lig_edges), lig_e_dst=i32(b.n_lig_edges),
        lig_e_feat=f32(b.n_lig_edges, 10), lig_e_mask=f32(b.n_lig_edges),
        tor_src=i32(b.n_tor), tor_dst=i32(b.n_tor), tor_mask=f32(b.n_tor),
        rot_node_mask=f32(b.n_tor, b.n_lig),
        atm_pos=f32(b.n_atm, 3), atm_mask=f32(b.n_atm),
        atm_feat=i32(b.n_atm, 5),
        cab_idx=i32(b.n_cab), cab_mask=f32(b.n_cab),
        noncab_mask=f32(b.n_atm),
        sc_src=i32(b.n_res, 4), sc_dst=i32(b.n_res, 4),
        chi_mask=f32(b.n_res, 4),
        aatype=i32(b.n_res), res_mask=f32(b.n_res),
        backbone_rots=f32(b.n_res, 3, 3), backbone_transl=f32(b.n_res, 3),
        default_frame=f32(b.n_res, 8, 4, 4),
        template_pos=f32(b.n_res, 14, 3), group_idx=i32(b.n_res, 14),
        atom14_mask=f32(b.n_res, 14), torsion_angle=f32(b.n_res, 5),
        pack_flat=i32(b.n_atm), pocket_center=f32(3),
    )


def write_cache(cache_dir, spec):
    """spec: list of (name, bucket); writes one npz per pair."""
    os.makedirs(cache_dir, exist_ok=True)
    for i, (name, b) in enumerate(spec):
        np.savez(os.path.join(cache_dir, f"{name}.npz"),
                 **fake_sample(b, seed=i)._asdict())


@pytest.fixture
def cache(tmp_path):
    spec = (
        [(f"s{i:03d}_r12", B_SMALL) for i in range(20)]
        + [(f"m{i:03d}_r12", B_MED) for i in range(12)]
        + [(f"b{i:03d}_r12", B_BIG) for i in range(8)]
    )
    d = str(tmp_path / "cache")
    write_cache(d, spec)
    return d, spec


def test_manifest_build_and_incremental(cache):
    d, spec = cache
    entries = DS.build_manifest(d)
    assert len(entries) == len(spec)
    by_name = {e.name: e for e in entries}
    for name, b in spec:
        assert by_name[name].bucket == b
    # incremental: new files are appended, existing rows not re-inspected
    write_cache(d, [("z_new_r12", B_MED)])
    entries2 = DS.build_manifest(d)
    assert len(entries2) == len(spec) + 1
    assert any(e.name == "z_new_r12" and e.bucket == B_MED for e in entries2)
    # manifest file itself must not be picked up; partial tmp files skipped
    open(os.path.join(d, "broken.npz.12.tmp.npz"), "w").close()
    assert len(DS.build_manifest(d)) == len(spec) + 1


def test_shuffle_stream_conservation_and_determinism(cache):
    d, _ = cache
    entries = DS.build_manifest(d)
    n, cap = len(entries), 16

    def names(seed):
        s = DS.ShuffleStream(entries, buffer_size=cap, seed=seed)
        return [s.draw()[0].name for _ in range(3 * n)]

    got = names(0)
    # conservation of a capacity-cap shuffle buffer: after 3n draws the
    # yielded multiset is the consumed (3n+cap)-entry stream prefix minus
    # the cap still-buffered items, so each name appears at most
    # ceil((3n+cap)/n) times and (for these seeds) at least once
    counts = {e.name: 0 for e in entries}
    for nm in got:
        counts[nm] += 1
    assert sum(counts.values()) == 3 * n
    assert min(counts.values()) >= 1
    assert max(counts.values()) <= int(np.ceil((3 * n + cap) / n))
    assert names(0) == got  # seeded determinism
    assert names(1) != got


def test_host_sharding_disjoint_coverage(cache):
    d, _ = cache
    entries = DS.build_manifest(d)
    n = len(entries)
    # buffer_size=1 makes draw order == stream order, exposing the shard
    per_host = []
    for h in range(2):
        s = DS.ShuffleStream(entries, buffer_size=1, seed=3,
                             host_id=h, num_hosts=2)
        per_host.append([s.draw()[0].name for _ in range(n // 2)])
    assert not set(per_host[0]) & set(per_host[1])
    assert len(set(per_host[0]) | set(per_host[1])) == 2 * (n // 2)
    # different epochs shuffle differently (shard-after-shuffle)
    s = DS.ShuffleStream(entries, buffer_size=1, seed=3,
                         host_id=0, num_hosts=2)
    epoch0 = [s.draw()[0].name for _ in range((n + 1) // 2)]
    epoch1 = [s.draw()[0].name for _ in range((n + 1) // 2)]
    assert epoch0 != epoch1


def test_grouped_batcher_shapes_and_budget(cache):
    d, _ = cache
    entries = DS.build_manifest(d)
    s = DS.ShuffleStream(entries, buffer_size=8, seed=0)
    bb = DS.GroupedBatcher(s, base_bs=4, base_area=B_SMALL.n_lig * B_SMALL.n_atm)
    # token budget: small bucket -> bs 4; med (4x area) -> 1; big -> 1
    assert bb.batch_size(B_SMALL) == 4
    assert bb.batch_size(B_MED) == 1
    assert bb.batch_size(B_BIG) == 1
    seen_buckets = set()
    for _ in range(30):
        bucket, batch, names = bb.next_batch()
        seen_buckets.add(bucket)
        bs = bb.batch_size(bucket)
        assert len(names) == bs
        assert batch.lig_feat.shape == (bs, bucket.n_lig, 27)
        assert batch.atm_pos.shape == (bs, bucket.n_atm, 3)
        assert batch.default_frame.shape == (bs, bucket.n_res, 8, 4, 4)
        # memory bound: buffer + at most (bs-1) pending per class
        assert s.resident_samples() <= s.buffer_size
        assert bb.pending_samples() <= sum(
            bb.batch_size(b) - 1 for b in (B_SMALL, B_MED, B_BIG))
    assert seen_buckets == {B_SMALL, B_MED, B_BIG}
    assert "bs4" in bb.format_stats()


def test_prefetcher_matches_direct(cache):
    d, _ = cache
    entries = DS.build_manifest(d)

    def pipeline():
        s = DS.ShuffleStream(entries, buffer_size=8, seed=5)
        return DS.GroupedBatcher(s, base_bs=4)

    bb = pipeline()
    direct = [bb.next_batch()[2] for _ in range(6)]
    pf = DS.Prefetcher(pipeline(), depth=2)
    try:
        fetched = [pf.next_batch()[2] for _ in range(6)]
    finally:
        pf.close()
    assert fetched == direct


def test_prefetcher_surfaces_errors(cache):
    d, _ = cache
    entries = DS.build_manifest(d)

    def boom(path):
        raise IOError("disk gone")

    s = DS.ShuffleStream(entries, buffer_size=2, seed=0, loader=boom)
    pf = DS.Prefetcher(DS.GroupedBatcher(s, base_bs=2), depth=1)
    try:
        with pytest.raises(RuntimeError, match="prefetch thread failed"):
            pf.next_batch()
    finally:
        pf.close()


def test_train_cli_stream_smoke(tmp_path):
    """End-to-end: prep a real pair into a cache, then train 2 steps from
    --stream-cache (tiny model, CPU)."""
    from diffbindfr_tpu.app import pipeline as P
    from diffbindfr_tpu.app import train_cli
    from diffbindfr_tpu.app.jobs import Job

    cache_dir = str(tmp_path / "prep_cache")
    job = Job(
        protein="/root/reference/examples/forward/3dbs_protein.pdb",
        protein_name="3dbs",
        ligand="/root/reference/examples/forward/3dbs_protein_crystal.sdf",
        ligand_name="3dbs", complex_name="3dbs",
        crystal_ligand="/root/reference/examples/forward/3dbs_protein_crystal.sdf",
    )
    prepared, failures = P.prep([job], pocket_radius=8.0, cache_dir=cache_dir)
    assert prepared and not failures
    outdir = str(tmp_path / "run")
    rc = train_cli.main([
        "--stream-cache", cache_dir, "-o", outdir, "--model", "mdn",
        "--steps", "2", "-bs", "2", "--log-every", "1",
        "--ckpt-every", "2", "--cpu",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(outdir, "mdn_ckpt_0000002.npz"))
