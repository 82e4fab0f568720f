"""Integer-exact parity against the reference's published gating results.

Targets (reference results/semantic_gating/semantic_gating_comparison.txt and
per-algorithm *_semantic_analysis.txt):

  algorithm    poses   candidates  same-floor  cross-floor  rate
  orb_slam3   19,163   5,110,618   1,498,091   3,612,527    70.7%
  droid_slam   1,926      94,672      35,339      59,333    62.7%
  lego_loam    2,406      87,044      21,477      65,567    75.3%
"""

import numpy as np
import pytest

from tests.conftest import REFERENCE_TRAJECTORIES, requires_reference_data

from mlis_tpu.gating.integration import INTEGRATIONS
from mlis_tpu.ops.pairwise import candidate_counts, candidate_counts_host

EXPECTED = {
    "orb_slam3": dict(poses=19163, total=5110618, same=1498091, cross=3612527),
    # NOTE: the reference's published DROID analysis (94,672/35,339/59,333)
    # is NOT reproducible from the trajectory files its repo ships today:
    # results/trajectories/droid_slam/*_stereo.txt yields 223,762 candidates
    # under the exact same float64 KDTree semantics (verified against
    # scipy.spatial.KDTree directly), and no Sim(3) scale or radius choice
    # recovers the published same/cross split. The published run evidently
    # used an older trajectory export. We therefore pin DROID to the
    # deterministic result of the *current* published data.
    "droid_slam": dict(poses=1926, total=223762, same=45357, cross=178405),
    "lego_loam": dict(poses=2406, total=87044, same=21477, cross=65567),
}


@requires_reference_data
@pytest.mark.parametrize("algo", ["droid_slam", "lego_loam"])
def test_candidate_count_parity_device(algo):
    integ = INTEGRATIONS[algo](REFERENCE_TRAJECTORIES, "/tmp/mlis_gating_out")
    combined, floors = integ.load_and_combine()
    exp = EXPECTED[algo]
    assert len(combined) == exp["poses"]
    total, same, cross = candidate_counts(combined[:, 1:4], floors)
    assert (total, same, cross) == (exp["total"], exp["same"], exp["cross"])


@requires_reference_data
@pytest.mark.slow
def test_candidate_count_parity_orb_slam3_host():
    # ORB-SLAM3 is the 19k-pose / 5.1M-candidate case; the device kernel is
    # exercised on TPU in bench.py — here the float64 host sweep guards the
    # numbers on CPU CI.
    integ = INTEGRATIONS["orb_slam3"](REFERENCE_TRAJECTORIES, "/tmp/mlis_gating_out")
    combined, floors = integ.load_and_combine()
    exp = EXPECTED["orb_slam3"]
    assert len(combined) == exp["poses"]
    total, same, cross = candidate_counts_host(combined[:, 1:4], floors)
    assert (total, same, cross) == (exp["total"], exp["same"], exp["cross"])


@requires_reference_data
def test_floor_distribution_parity():
    # Comparison table floor percentages (semantic_gating_comparison.txt:33-38)
    integ = INTEGRATIONS["lego_loam"](REFERENCE_TRAJECTORIES, "/tmp/mlis_gating_out")
    _, floors = integ.load_and_combine()
    dist = {
        f: round(100 * (floors == f).mean(), 1) for f in np.unique(floors)
    }
    assert dist == {1: 13.3, 2: 27.6, 4: 13.6, 5: 45.5}


@requires_reference_data
def test_run_comparison_report(tmp_path):
    from mlis_tpu.gating.integration import run_comparison

    results = run_comparison(
        REFERENCE_TRAJECTORIES, str(tmp_path), algorithms=["lego_loam"]
    )
    assert results["lego_loam"].total_candidates == 87044
    report = (tmp_path / "semantic_gating_comparison.txt").read_text()
    assert "87,044" in report
    assert "75.3%" in report
    assert "CROSS-FLOOR RATE" in report
