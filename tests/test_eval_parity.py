"""Regression parity of the evaluation pipeline against the reference's
published results/metrics/final_evaluation.json."""

import json

import numpy as np
import pytest

from tests.conftest import REFERENCE_TRAJECTORIES, requires_reference_data

from mlis_tpu.eval.comprehensive import run_full_evaluation

FINAL_EVAL_JSON = "/root/reference/results/metrics/final_evaluation.json"


@pytest.fixture(scope="module")
def published():
    try:
        with open(FINAL_EVAL_JSON) as f:
            return json.load(f)
    except OSError:
        pytest.skip("published final_evaluation.json not available")


@pytest.fixture(scope="module")
def ours():
    return run_full_evaluation(
        REFERENCE_TRAJECTORIES,
        legacy_alignment=True,
        full_diagnostics=False,
        verbose=False,
    )


# The published final_evaluation.json ORB-SLAM3 entries were produced from
# OLDER trajectory exports than the files the reference repo ships today
# (e.g. 5th_floor: 7,272 poses / 139.5 m in the JSON vs 8,685 poses /
# 293.8 m in the shipped file). Parity is therefore asserted exactly for
# lego_loam / basalt / droid_slam (bit-identical to ~1e-15), and ORB is
# regression-pinned to the deterministic result of the current data.
PARITY_ALGOS = ("lego_loam", "basalt", "droid_slam")

ORB_PINNED = {
    "5th_floor": dict(poses=8685, length=293.764183, drift=0.623721, ate=15.047058),
    "1st_floor": dict(poses=2548, length=75.863753, drift=0.794754, ate=0.259955),
    "4th_floor": dict(poses=2616, length=66.615920, drift=0.276129, ate=0.198975),
    "2nd_floor": dict(poses=5314, length=140.619824, drift=0.285536, ate=0.271675),
}


@requires_reference_data
def test_lengths_and_drift_parity(published, ours):
    for algo in PARITY_ALGOS:
        for floor in published[algo]:
            want = published[algo][floor]
            got = ours[algo][floor]
            assert got["num_poses"] == want["poses"], (algo, floor)
            np.testing.assert_allclose(
                got["trajectory_length"], want["length"], rtol=1e-9
            )
            np.testing.assert_allclose(
                got["endpoint_drift"], want["drift"], rtol=1e-9
            )
            assert got["valid"] == want["valid"], (algo, floor)


@requires_reference_data
def test_ate_parity(published, ours):
    checked = 0
    for algo in PARITY_ALGOS:
        for floor in published[algo]:
            want = published[algo][floor].get("ate_vs_lego")
            if not want:
                continue
            got = ours[algo][floor]["ate_vs_lego"]
            for k in ("rmse", "mean", "max", "median"):
                np.testing.assert_allclose(got[k], want[k], rtol=1e-9), (algo, floor, k)
            if "num_matched" in published[algo][floor]:
                assert (
                    ours[algo][floor]["num_matched"]
                    == published[algo][floor]["num_matched"]
                )
            checked += 1
    assert checked >= 6


@requires_reference_data
def test_orb_slam3_pinned_regression(ours):
    for floor, want in ORB_PINNED.items():
        got = ours["orb_slam3"][floor]
        assert got["num_poses"] == want["poses"]
        np.testing.assert_allclose(got["trajectory_length"], want["length"], atol=1e-5)
        np.testing.assert_allclose(got["endpoint_drift"], want["drift"], atol=1e-5)
        np.testing.assert_allclose(got["ate_vs_lego"]["rmse"], want["ate"], atol=1e-5)


@requires_reference_data
def test_droid_sim3_scale_parity(published, ours):
    for floor, r in published["droid_slam"].items():
        if "scale" in r and r["scale"]:
            np.testing.assert_allclose(
                ours["droid_slam"][floor]["scale"], r["scale"], rtol=1e-9
            )
            assert 3.0 < ours["droid_slam"][floor]["scale"] < 3.2
