import numpy as np
import pytest

from mlis_tpu.gating.fusion import MultiModalFloorDetector
from mlis_tpu.gating.lidar_floor_tracker import LiDARFloorTracker


def _ground_scan(rng, base_z, n=512, noise=0.05):
    x = rng.uniform(-10, 10, n)
    y = rng.uniform(-10, 10, n)
    z = base_z + rng.normal(0, noise, n)
    return np.column_stack([x, y, z])


def test_single_scan_height(rng):
    tracker = LiDARFloorTracker(min_ground_points=100)
    est = tracker.process_scan(_ground_scan(rng, -1.5), timestamp=0.0)
    assert est.num_ground_points > 100
    assert est.z_height == pytest.approx(1.5, abs=0.1)
    assert est.floor_number == 0
    # first scan: reference formula gives stability 1/(1+10) with a
    # single-sample history, so confidence ~= inlier_ratio * 0.09
    assert est.confidence > 0.05


def test_floor_transition_detection_batched(rng):
    """Reference demo scenario (lidar_floor_tracker.py:405-444): floor 0 ->
    +3.5 m -> back, via the batched TPU path."""
    tracker = LiDARFloorTracker(floor_height=3.5)
    scans, times = [], []
    for i in range(90):
        base = -1.5 if i < 30 or i >= 60 else -5.0  # ground drops when robot rises
        scans.append(_ground_scan(rng, base))
        times.append(i * 0.5)
    ests = tracker.process_scans(np.stack(scans), np.asarray(times))
    floors = [e.floor_number for e in ests]
    assert floors[10] == 0
    assert floors[55] == 1
    assert floors[-1] == 0
    transitions = tracker.detect_floor_transitions()
    assert len(transitions) == 2
    assert transitions[0][1:] == (0, 1)
    assert transitions[1][1:] == (1, 0)


def test_sequential_matches_batched(rng):
    scans = [
        _ground_scan(rng, -1.5 if i < 20 else -5.0, n=256) for i in range(40)
    ]
    times = np.arange(40) * 0.5

    seq = LiDARFloorTracker(min_ground_points=50)
    for s, t in zip(scans, times):
        seq.process_scan(s, t)
    bat = LiDARFloorTracker(min_ground_points=50)
    bat.process_scans(np.stack(scans), times)

    f_seq = [e.floor_number for e in seq.floor_history]
    f_bat = [e.floor_number for e in bat.floor_history]
    assert f_seq == f_bat
    z_seq = np.array([e.z_height for e in seq.floor_history])
    z_bat = np.array([e.z_height for e in bat.floor_history])
    np.testing.assert_allclose(z_seq, z_bat, atol=0.05)


def test_too_few_ground_points_low_confidence(rng):
    tracker = LiDARFloorTracker(min_ground_points=100)
    est = tracker.process_scan(_ground_scan(rng, -1.5, n=20), timestamp=0.0)
    assert est.confidence == 0.0
    assert est.num_ground_points == 20


def test_ring_based_ground_selection(rng):
    tracker = LiDARFloorTracker(min_ground_points=50)
    pts = np.vstack([_ground_scan(rng, -1.5, n=300), _ground_scan(rng, 2.0, n=300)])
    rings = np.concatenate([np.full(300, 5), np.full(300, 80)])  # ground rings first
    est = tracker.process_scan(pts, 0.0, rings=rings)
    # only ring<30 points participate -> height ~1.5, not polluted by z=+2 wall
    assert est.z_height == pytest.approx(1.5, abs=0.15)


def test_get_floor_labels_nearest_scan(rng):
    tracker = LiDARFloorTracker()
    scans = [_ground_scan(rng, -1.5 if i < 10 else -5.0) for i in range(20)]
    tracker.process_scans(np.stack(scans), np.arange(20.0))
    labels = tracker.get_floor_labels(np.array([0.2, 4.9, 15.4]))
    assert labels[0] == 0 and labels[1] == 0
    assert labels[2] == 1


def test_multimodal_fusion_imu_wins(rng):
    det = MultiModalFloorDetector(floor_height=3.5)
    # IMU: one up event
    fs = 200.0
    t = np.arange(0, 30, 1 / fs)
    ax = rng.normal(0, 0.1, len(t))
    ay = rng.normal(0, 0.1, len(t))
    az = np.full(len(t), 9.81) + rng.normal(0, 0.05, len(t))
    az[(t >= 10) & (t <= 14)] += 0.8
    det.process_imu(t, ax, ay, az)

    traj_t = np.linspace(0, 30, 300)
    labels = det.fuse_estimates(traj_t, start_floor=2)
    assert labels[0] == 2
    assert labels[-1] == 3
    rep = det.agreement(traj_t, start_floor=2)
    assert rep["lidar_available"] is False
