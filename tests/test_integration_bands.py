"""Tier-3 integration tests: PASS/WARN numeric bands on synthetic bags.

Mirrors the reference's real-data integration suite
(scripts/semantic_gating/test_lidar_floor_tracker.py): single-floor scans
must track height with z-std < 0.15 m; transit scans must show a z-change
of ~N x 3.5 m floors; LiDAR and IMU floor estimates must agree after offset
alignment. Real NUFR-M3F bags are not shipped, so the bags themselves are
synthesized through our own writer — which also exercises the full
bag -> decode -> track path end-to-end.
"""

import numpy as np
import pytest

from mlis_tpu.core.bag import (
    BagWriter,
    PointField,
    encode_imu,
    encode_pointcloud2,
    extract_imu,
    extract_pointclouds,
)
from mlis_tpu.gating.floor_detector import IMUFloorDetector
from mlis_tpu.gating.lidar_floor_tracker import LiDARFloorTracker

FIELDS = [
    PointField("x", 0, 7, 1),
    PointField("y", 4, 7, 1),
    PointField("z", 8, 7, 1),
    PointField("ring", 26, 4, 1),
]


def _scan_blob(rng, base_z, n=1024, noise=0.03):
    buf = np.zeros((n, 48), np.uint8)
    xyz = np.column_stack(
        [
            rng.uniform(-10, 10, n),
            rng.uniform(-10, 10, n),
            base_z + rng.normal(0, noise, n),
        ]
    ).astype(np.float32)
    rings = rng.integers(0, 25, n).astype(np.uint16)  # all ground rings
    buf[:, 0:4] = xyz[:, 0:1].view(np.uint8)
    buf[:, 4:8] = xyz[:, 1:2].view(np.uint8)
    buf[:, 8:12] = xyz[:, 2:3].view(np.uint8)
    buf[:, 26:28] = rings[:, None].view(np.uint8)
    return buf.tobytes()


def _write_lidar_bag(path, rng, z_profile, compression="none"):
    w = BagWriter(path)
    for i, z in enumerate(z_profile):
        w.write(
            "/ouster/points", "sensor_msgs/PointCloud2", float(i) * 0.5,
            encode_pointcloud2(float(i) * 0.5, _scan_blob(rng, z), 48, FIELDS),
        )
    w.close(compression=compression)


def _track(path):
    tracker = LiDARFloorTracker(floor_height=3.5, min_ground_points=200)
    scans, stamps, rings = [], [], []
    for stamp, xyz, ring in extract_pointclouds(path):
        scans.append(xyz)
        rings.append(ring)
        stamps.append(stamp)
    tracker.process_scans(
        np.stack(scans), np.asarray(stamps), rings=np.stack(rings)
    )
    return tracker


def test_single_floor_band(tmp_path, rng):
    """PASS band: single-floor bag -> z-std < 0.15 m (reference :328-332)."""
    _write_lidar_bag(tmp_path / "floor.bag", rng, [-1.5] * 60)
    tracker = _track(tmp_path / "floor.bag")
    z = np.asarray([e.z_height for e in tracker.floor_history])
    assert z.std() < 0.15, f"z-std {z.std():.3f} exceeds PASS band"
    floors = {e.floor_number for e in tracker.floor_history}
    assert floors == {0}


def test_single_floor_band_lz4_bag(tmp_path, rng):
    """The real NUFR bags are lz4-chunked; the same PASS band must hold
    reading through the lz4 frame path (reference ingests via rosbags,
    test_lidar_floor_tracker.py:32-39)."""
    _write_lidar_bag(tmp_path / "floor_lz4.bag", rng, [-1.5] * 60, "lz4")
    tracker = _track(tmp_path / "floor_lz4.bag")
    z = np.asarray([e.z_height for e in tracker.floor_history])
    assert len(z) == 60
    assert z.std() < 0.15
    assert {e.floor_number for e in tracker.floor_history} == {0}


def test_transit_band(tmp_path, rng):
    """PASS band: transit bag -> z-change > 2 m and ~= N x 3.5 m
    (reference :376-381). Simulates a 5->1 ride: 4 floors down."""
    profile = [-1.5] * 20 + list(np.linspace(-1.5, -1.5 + 4 * 3.5, 10)) + [
        -1.5 + 4 * 3.5
    ] * 20
    # ground drops relative to sensor when the robot rises; here the robot
    # DESCENDS 4 floors, so sensor-relative ground z rises... we model the
    # height signal directly: z_profile is the ground plane z in sensor frame
    _write_lidar_bag(tmp_path / "transit.bag", rng, [-z for z in profile])
    tracker = _track(tmp_path / "transit.bag")
    z = np.asarray([e.z_height for e in tracker.floor_history])
    dz = z[-5:].mean() - z[:5].mean()
    assert abs(dz) > 2.0, "transit must show > 2 m height change"
    n_floors = round(abs(dz) / 3.5)
    assert n_floors == 4, f"expected 4-floor change, got {n_floors} ({dz:.2f} m)"
    assert abs(abs(dz) - n_floors * 3.5) < 0.7


def test_lidar_vs_imu_cross_validation(tmp_path, rng):
    """LiDAR floor labels must agree with IMU labels after offset alignment
    (the reference's lidar_vs_imu comparison plots, :383-459)."""
    # IMU: 60 s at 200 Hz with one up event at t=[20, 25]
    fs = 200.0
    t_imu = np.arange(0, 60, 1 / fs)
    ax = rng.normal(0, 0.1, len(t_imu))
    ay = rng.normal(0, 0.1, len(t_imu))
    az = np.full(len(t_imu), 9.81) + rng.normal(0, 0.05, len(t_imu))
    az[(t_imu >= 20) & (t_imu <= 25)] += 0.8

    bag = tmp_path / "both.bag"
    w = BagWriter(bag)
    for i in range(0, len(t_imu), 4):  # thin out for bag size
        w.write(
            "/vectornav/imu", "sensor_msgs/Imu", t_imu[i],
            encode_imu(t_imu[i], [ax[i], ay[i], az[i]], [0, 0, 0]),
        )
    # LiDAR: 2 Hz scans; ground drops 3.5 m when the robot rides up at t=22
    for i in range(120):
        ts = i * 0.5
        base = -1.5 if ts < 22 else -5.0
        w.write(
            "/ouster/points", "sensor_msgs/PointCloud2", ts,
            encode_pointcloud2(ts, _scan_blob(rng, base), 48, FIELDS),
        )
    w.close()

    # IMU path
    ti, acc, gyro = extract_imu(bag)
    det = IMUFloorDetector()
    det.detect_elevator_events(ti, acc[:, 0], acc[:, 1], acc[:, 2])
    traj_t = np.linspace(0, 60, 120)
    imu_labels = det.assign_floor_labels(traj_t, start_floor=5)

    # LiDAR path
    tracker = _track(bag)
    lidar_labels = tracker.get_floor_labels(traj_t)
    lidar_aligned = lidar_labels + (5 - lidar_labels[0])

    # agreement outside the transition window (during the ride IMU labels
    # are 0 by design)
    steady = (traj_t < 19) | (traj_t > 27)
    agree = (imu_labels[steady] == lidar_aligned[steady]).mean()
    assert agree > 0.9, f"IMU/LiDAR agreement {agree:.2f} below PASS band"
