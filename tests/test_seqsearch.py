"""Offline homolog search (app/seqsearch.py — blastp_local role parity)."""
import numpy as np

from diffbindfr_tpu.app import seqsearch as ss


def _brute(qa, ta):
    """Reference O(n*m) semi-global DP (free end gaps on target)."""
    n, m = len(qa), len(ta)
    H = np.zeros((n + 1, m + 1), np.float32)
    H[1:, 0] = ss.GAP * np.arange(1, n + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            H[i, j] = max(
                H[i - 1, j - 1] + ss._BLOSUM[qa[i - 1], ta[j - 1]],
                H[i - 1, j] + ss.GAP,
                H[i, j - 1] + ss.GAP,
            )
    return float(H[n].max())


def test_align_score_matches_brute_force():
    rng = np.random.RandomState(0)
    for n, m in ((12, 15), (20, 9), (7, 30)):
        qa = rng.randint(0, 20, n)
        ta = rng.randint(0, 20, m)
        score, ident, cov, na = ss.align_stats(qa, ta)
        assert abs(score - _brute(qa, ta)) < 1e-4
        assert 0.0 <= ident <= 1.0 and 0.0 <= cov <= 1.0


def test_identical_and_substring():
    seq = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"
    score, ident, cov, na = ss.align_stats(seq, seq)
    assert ident == 1.0 and cov == 1.0 and na == len(seq)
    # query embedded in a longer target: free end gaps keep full identity
    score2, ident2, cov2, _ = ss.align_stats(seq, "GGGG" + seq + "PPPP")
    assert ident2 == 1.0 and cov2 == 1.0
    assert abs(score2 - score) < 1e-4


def test_search_ranks_true_homolog_first(tmp_path):
    """The 3dbs query must rank the 3dbs library entry above unrelated
    chains, with ~100% identity to itself."""
    from diffbindfr_tpu.io.pdb import parse_pdb

    lib = "/root/repo/runs/pb_bench"
    q = parse_pdb(f"{lib}/3dbs/3dbs_protein.pdb")
    hits = ss.search(
        q, [f"{lib}/{n}/{n}_protein.pdb" for n in
            ("2src", "2zec", "3dbs", "3mhw")], top=5)
    assert hits, "no hits returned"
    assert "3dbs" in hits[0].source
    assert hits[0].identity > 0.99
    assert hits[0].score > hits[-1].score
