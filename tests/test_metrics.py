import numpy as np
import pytest

from mlis_tpu.eval.association import associate_by_time, normalize_timestamps
from mlis_tpu.eval.metrics import (
    analyze_problem_regions,
    analyze_tracking_quality,
    compute_ate,
    compute_error_at_distances,
    compute_rotation_error,
    compute_rpe,
    compute_segment_metrics,
    compute_trajectory_smoothness,
    is_valid_trajectory,
)


def test_normalize_timestamps_ns():
    t = np.array([1.6e18, 1.6e18 + 5e7])
    out = normalize_timestamps(t)
    assert out[0] == pytest.approx(1.6e9)
    assert out[1] - out[0] == pytest.approx(0.05)


def test_associate_by_time_nearest():
    est_t = np.array([0.0, 1.0, 2.0, 3.0])
    ref_t = np.array([0.04, 1.5, 2.96])
    ei, ri = associate_by_time(est_t, ref_t, max_diff=0.1, min_matches=1)
    np.testing.assert_array_equal(ei, [0, 3])
    np.testing.assert_array_equal(ri, [0, 2])


def test_associate_matches_reference_argmin_loop(rng):
    est_t = np.sort(rng.uniform(0, 100, size=400))
    ref_t = np.sort(rng.uniform(0, 100, size=300))
    ei, ri = associate_by_time(est_t, ref_t, max_diff=0.5, min_matches=1)
    # reference loop semantics (final_eval.py:104-115)
    matches = []
    for i, t in enumerate(est_t):
        j = np.argmin(np.abs(ref_t - t))
        if np.abs(ref_t[j] - t) < 0.5:
            matches.append((i, j))
    want = np.array(matches)
    np.testing.assert_array_equal(ei, want[:, 0])
    np.testing.assert_array_equal(ri, want[:, 1])


def test_associate_too_few_matches_returns_none():
    ei, ri = associate_by_time(np.arange(5.0), np.arange(5.0) + 100.0)
    assert ei is None and ri is None


def test_ate_stats():
    est = np.zeros((4, 3))
    ref = np.array([[3, 4, 0], [0, 0, 0], [0, 0, 5], [0, 0, 0]], dtype=float)
    ate = compute_ate(est, ref)
    assert ate["max"] == 5.0
    assert ate["min"] == 0.0
    assert ate["rmse"] == pytest.approx(np.sqrt((25 + 0 + 25 + 0) / 4))


def test_rpe_straight_line_is_zero():
    pos = np.zeros((100, 3))
    pos[:, 0] = np.arange(100) * 0.1
    rpe = compute_rpe(pos, delta=1.0)
    assert rpe["rmse"] == pytest.approx(0.0, abs=1e-9)


def test_rpe_matches_reference_loop(rng):
    pos = np.cumsum(rng.normal(size=(200, 3)) * 0.1, axis=0)
    got = compute_rpe(pos, delta=1.0)

    # reference loop (comprehensive_evaluation.py:219-257)
    cum = np.concatenate([[0], np.cumsum(np.linalg.norm(np.diff(pos, axis=0), axis=1))])
    vals = []
    for i in range(len(pos) - 1):
        target = cum[i] + 1.0
        if target > cum[-1]:
            break
        j = np.searchsorted(cum, target)
        if j >= len(pos):
            break
        actual = np.linalg.norm(pos[j] - pos[i])
        expected = cum[j] - cum[i]
        if expected > 0:
            vals.append(abs(actual - expected) / expected * 100)
    vals = np.array(vals)
    np.testing.assert_allclose(got["values"], vals, atol=1e-9)


def test_rotation_error_known_angle():
    # 90-degree rotation about z: q = (0, 0, sin(45), cos(45))
    q1 = np.array([[0.0, 0.0, 0.0, 1.0]])
    q2 = np.array([[0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)]])
    err = compute_rotation_error(q1, q2)
    assert err["mean"] == pytest.approx(90.0, abs=1e-6)


def test_rotation_error_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    q_est = rng.normal(size=(50, 4))
    q_est /= np.linalg.norm(q_est, axis=1, keepdims=True)
    q_ref = rng.normal(size=(50, 4))
    q_ref /= np.linalg.norm(q_ref, axis=1, keepdims=True)
    got = compute_rotation_error(q_est, q_ref)["errors"]
    want = [
        np.degrees((Rotation.from_quat(b).inv() * Rotation.from_quat(a)).magnitude())
        for a, b in zip(q_est, q_ref)
    ]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_segment_metrics_partition():
    est = np.zeros((105, 3))
    ref = np.zeros((105, 3))
    segs = compute_segment_metrics(est, ref, num_segments=10)
    assert len(segs) == 10
    assert segs[0]["start_idx"] == 0
    assert segs[-1]["end_idx"] == 105  # last segment absorbs the remainder
    assert sum(s["num_poses"] for s in segs) == 105


def test_error_at_distances():
    ref = np.zeros((300, 3))
    ref[:, 0] = np.arange(300) * 0.5  # 149.5 m long
    est = ref + np.array([0, 1.0, 0])
    out = compute_error_at_distances(est, ref, distances=(10, 100, 1000))
    assert out[10] == pytest.approx(1.0)
    assert out[100] == pytest.approx(1.0)
    assert out[1000] is None


def test_problem_regions_degradation():
    n = 200
    ref = np.zeros((n, 3))
    est = ref.copy()
    est[50:80, 1] = 5.0  # big error inside region A of 5th floor (25%-40%)
    est[:, 0] = 0.1
    out = analyze_problem_regions(est, ref, "5th_floor")
    assert out["A"]["degradation_factor"] > 5
    assert "B" in out


def test_tracking_quality_gaps():
    t = np.concatenate([np.arange(0, 5, 0.05), np.arange(10, 15, 0.05)])
    q = analyze_tracking_quality(t, expected_rate=20.0)
    assert q["num_gaps"] == 1
    assert q["max_gap"] == pytest.approx(5.0, abs=0.1)
    assert q["total_poses"] == len(t)


def test_smoothness_constant_velocity():
    pos = np.zeros((50, 3))
    pos[:, 0] = np.arange(50)
    s = compute_trajectory_smoothness(pos)
    assert s["mean_acceleration"] == pytest.approx(0.0, abs=1e-12)
    assert s["smoothness_score"] == pytest.approx(1.0)


def test_validity_gate():
    pos = np.zeros((100, 3))
    pos[:, 0] = np.linspace(0, 65, 100)
    ok, _ = is_valid_trajectory(pos, 65)
    assert ok
    ok, reason = is_valid_trajectory(pos * 20, 65)
    assert not ok and "diverged" in reason
    ok, reason = is_valid_trajectory(pos * 0.01, 65)
    assert not ok and "short" in reason
