"""Native fastio library: parity with the pure-Python parsers."""
import numpy as np
import pytest

from diffbindfr_tpu.io import native
from diffbindfr_tpu.io.pdb import parse_pdb

PDB = "/root/reference/examples/forward/3dbs_protein.pdb"


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_pdb_parity(lib):
    nat = native.parse_pdb_native(PDB)
    assert nat is not None
    # force the pure-python path via string parsing
    py = parse_pdb(open(PDB).read(), is_string=True)
    assert nat.num_res == py.num_res
    np.testing.assert_array_equal(nat.aatype, py.aatype)
    np.testing.assert_array_equal(nat.atom_mask, py.atom_mask)
    np.testing.assert_allclose(nat.atom_positions, py.atom_positions, atol=1e-4)
    np.testing.assert_array_equal(nat.residue_index, py.residue_index)
    assert nat.resnames == py.resnames


def test_pocket_hits_parity(lib):
    prot = native.parse_pdb_native(PDB)
    rng = np.random.default_rng(0)
    mask = prot.atom_mask.astype(bool)
    ridx, aidx = np.nonzero(mask)
    flat = prot.atom_positions[ridx, aidx]
    ref = flat[rng.choice(flat.shape[0], 20)] + rng.normal(size=(20, 3))

    hits = native.pocket_hits_native(flat, ridx, prot.num_res, ref, 8.0)
    # brute force
    d2 = ((flat[:, None, :] - ref[None]) ** 2).sum(-1).min(axis=1)
    brute = np.zeros(prot.num_res, dtype=bool)
    np.logical_or.at(brute, ridx, d2 < 64.0)
    np.testing.assert_array_equal(hits, brute)


def test_parse_speed_sane(lib):
    import time

    t0 = time.perf_counter()
    for _ in range(3):
        native.parse_pdb_native(PDB)
    dt = (time.perf_counter() - t0) / 3
    assert dt < 0.5, f"native parse too slow: {dt:.3f}s"
