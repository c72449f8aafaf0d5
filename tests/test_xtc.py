"""XTC writer/reader round trip (libxdrf 3dfcoord codec)."""
import numpy as np
import pytest

from diffbindfr_tpu.io.xtc import read_xtc, write_xtc


def test_roundtrip_small_system(tmp_path):
    rng = np.random.default_rng(0)
    coords = rng.normal(size=(5, 48, 3)) * 12.0  # Angstrom
    p = str(tmp_path / "t.xtc")
    write_xtc(p, coords, time_ps=np.arange(5) * 0.5)
    back, times = read_xtc(p)
    assert back.shape == coords.shape
    # precision 1000 in nm = 0.001 nm = 0.01 A quantization
    np.testing.assert_allclose(back, coords, atol=0.02)
    np.testing.assert_allclose(times, np.arange(5) * 0.5, atol=1e-6)


def test_roundtrip_tiny_plain_float_path(tmp_path):
    rng = np.random.default_rng(1)
    coords = rng.normal(size=(3, 7, 3)) * 5.0  # natoms <= 9: plain floats
    p = str(tmp_path / "tiny.xtc")
    write_xtc(p, coords)
    back, _ = read_xtc(p)
    np.testing.assert_allclose(back, coords, atol=1e-4)


def test_roundtrip_large_spread(tmp_path):
    rng = np.random.default_rng(2)
    # wide box: forces the per-dimension bitsize path (> 2^24 int range)
    coords = rng.uniform(-9000, 9000, size=(2, 300, 3))
    p = str(tmp_path / "wide.xtc")
    write_xtc(p, coords)
    back, _ = read_xtc(p)
    np.testing.assert_allclose(back, coords, atol=0.02)


def test_trajectory_like_export(tmp_path):
    """Denoising-trajectory-shaped data: 20 steps of a 64-atom ligand
    drifting toward a pocket center."""
    rng = np.random.default_rng(3)
    start = rng.normal(size=(64, 3)) * 8.0 + 30.0
    frames = np.stack([start * (1 - s / 25.0) for s in range(20)])
    p = str(tmp_path / "traj.xtc")
    write_xtc(p, frames, time_ps=np.arange(20, dtype=float))
    back, times = read_xtc(p)
    np.testing.assert_allclose(back, frames, atol=0.02)
    assert len(times) == 20


def test_export_trajectory_writes_xtc(tmp_path):
    from diffbindfr_tpu.app.export import export_trajectory
    from diffbindfr_tpu.chem.ligand_feats import featurize_ligand
    from diffbindfr_tpu.chem.mol import perceive
    from diffbindfr_tpu.chem.protein_feats import build_pocket_record
    from diffbindfr_tpu.io.pdb import parse_pdb
    from diffbindfr_tpu.io.sdf import parse_sdf

    lig = featurize_ligand(
        perceive(parse_sdf(
            "/root/reference/examples/forward/3dbs_protein_crystal.sdf")[0]),
        "3dbs",
    )
    prot = parse_pdb("/root/reference/examples/forward/3dbs_protein.pdb")
    pocket = build_pocket_record(prot, lig.pos, cutoff=8.0)
    rng = np.random.default_rng(0)
    steps, nl_pad = 5, 48
    lt = rng.normal(size=(steps, nl_pad, 3)).astype(np.float32) * 3
    at = rng.normal(
        size=(steps, pocket.num_res, 14, 3)
    ).astype(np.float32) * 3
    export_trajectory(str(tmp_path), lig, pocket, lt, at)
    back, _ = read_xtc(str(tmp_path / "lig_traj.xtc"))
    assert back.shape == (steps, lig.num_atoms, 3)
    np.testing.assert_allclose(
        back, lt[:, : lig.num_atoms] + pocket.center, atol=0.02
    )
    pb, _ = read_xtc(str(tmp_path / "pocket_traj.xtc"))
    assert pb.shape[0] == steps
    assert pb.shape[1] == int(pocket.atom14_mask.sum())
