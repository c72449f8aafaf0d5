"""Numeric regression goldens (VERDICT r4 task 6): fixed-seed CPU replay of
the sampler / EC minimizer / MDN scorer against recorded fixtures.

Round 4 changed numerics-adjacent code three times claiming bit-identical
results, verified manually each time (one-hot gathers, hoisted pair tables
— ROUND4_NOTES sections 7-9). These tests are the tripwire for the next
such change: an "exactness-preserving" optimization must leave them green;
an INTENDED numerics change regenerates the fixture via
`python tools/make_goldens.py` with the reason stated in the commit
message (update policy in the tool docstring).

Tolerances: identical platform + jax version replays bit-identically; the
loose-ish rtol absorbs only cross-version XLA reassociation, far below the
~1e-3 scale at which a real semantic regression (e.g. a wrong gather)
shows up.
"""
import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(ROOT, "tests", "fixtures", "goldens.npz")

sys.path.insert(0, os.path.join(ROOT, "tools"))


@pytest.fixture(scope="module")
def goldens():
    if not os.path.exists(FIXTURE):
        pytest.skip("goldens fixture missing; run tools/make_goldens.py")
    from make_goldens import compute_goldens

    return compute_goldens(), dict(np.load(FIXTURE))


def test_sampler_trajectory_golden(goldens):
    got, exp = goldens
    np.testing.assert_allclose(
        got["sampler_lig_pos"], exp["sampler_lig_pos"],
        rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(
        got["sampler_chi"], exp["sampler_chi"], rtol=5e-5, atol=5e-5)
    assert got["sampler_traj_checksum"] == pytest.approx(
        float(exp["sampler_traj_checksum"]), rel=1e-6)
    assert got["sampler_a14_checksum"] == pytest.approx(
        float(exp["sampler_a14_checksum"]), rel=1e-6)


def test_ec_affinity_golden(goldens):
    got, exp = goldens
    np.testing.assert_allclose(
        got["ec_affinities"], exp["ec_affinities"], rtol=1e-5, atol=1e-5)
    assert got["ec_pose_checksum"] == pytest.approx(
        float(exp["ec_pose_checksum"]), rel=1e-6)


def test_mdn_score_golden(goldens):
    got, exp = goldens
    assert got["mdn_score"] == pytest.approx(
        float(exp["mdn_score"]), rel=1e-5)
    assert got["mdn_nll"] == pytest.approx(float(exp["mdn_nll"]), rel=1e-5)
