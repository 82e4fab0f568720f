import numpy as np
import pytest

from mlis_tpu.gating.floor_detector import IMUFloorDetector
from mlis_tpu.ops.filters import cumtrapz, uniform_filter1d


def test_uniform_filter_matches_scipy(rng):
    from scipy.ndimage import uniform_filter1d as scipy_filter

    for size in (3, 7, 50, 51):
        x = rng.normal(size=500).astype(np.float32)
        got = np.asarray(uniform_filter1d(x, size))
        want = scipy_filter(x.astype(np.float64), size=size)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_cumtrapz_matches_numpy_trapz(rng):
    t = np.sort(rng.uniform(0, 10, size=200)).astype(np.float32)
    y = rng.normal(size=200).astype(np.float32)
    ct = np.asarray(cumtrapz(y, t))
    for s, e in [(0, 200), (10, 50), (100, 101), (5, 6)]:
        want = np.trapezoid(y[s:e], t[s:e]) if e - s > 1 else 0.0
        got = ct[e - 1] - ct[s]
        np.testing.assert_allclose(got, want, atol=1e-4)


def _synthetic_imu(rng, fs=200.0, duration=60.0):
    """Reference demo scenario (floor_detector.py:202-231): gravity + noise,
    an up event at t=[20,25] (+0.8) and a down event at t=[40,44] (-0.7)."""
    t = np.arange(0, duration, 1.0 / fs)
    n = len(t)
    ax = rng.normal(0, 0.1, n)
    ay = rng.normal(0, 0.1, n)
    az = rng.normal(9.81, 0.1, n)
    az[(t >= 20) & (t <= 25)] += 0.8
    az[(t >= 40) & (t <= 44)] -= 0.7
    return t, ax, ay, az


def test_detects_two_elevator_events(rng):
    t, ax, ay, az = _synthetic_imu(rng)
    det = IMUFloorDetector()
    events = det.detect_elevator_events(t, ax, ay, az)
    assert len(events) == 2
    up, down = events
    assert up.direction == "up" and down.direction == "down"
    assert up.floor_change == 1 and down.floor_change == -1
    assert abs(up.start_time - 20) < 1.0 and abs(up.end_time - 25) < 1.0
    assert abs(down.start_time - 40) < 1.0 and abs(down.end_time - 44) < 1.0
    assert up.duration >= 2.0


def test_matches_reference_numpy_implementation(rng):
    """Decision-level parity with the reference algorithm on the same input."""
    from scipy.ndimage import uniform_filter1d as scipy_filter

    t, ax, ay, az = _synthetic_imu(rng)

    # re-derive reference events (floor_detector.py:63-118 semantics)
    az_det = az - np.median(az)
    az_s = scipy_filter(az_det, size=50)
    hv = scipy_filter(ax**2 + ay**2, size=50)
    mask = (np.abs(az_s) > 0.5) & (hv < 1.0)
    ref_events = []
    in_e, start = False, 0
    for i, m in enumerate(mask):
        if m and not in_e:
            start, in_e = i, True
        elif not m and in_e:
            if t[i] - t[start] >= 2.0:
                zi = np.trapezoid(az_s[start:i], t[start:i])
                ref_events.append((start, i, "up" if zi > 0 else "down"))
            in_e = False

    det = IMUFloorDetector()
    got = det.detect_elevator_events(t, ax, ay, az)
    assert len(got) == len(ref_events)
    for ev, (s, e, direction) in zip(got, ref_events):
        assert abs(ev.start_idx - s) <= 1
        assert abs(ev.end_idx - e) <= 1
        assert ev.direction == direction


def test_floor_labels_walk_and_elevator_zero(rng):
    t, ax, ay, az = _synthetic_imu(rng)
    det = IMUFloorDetector()
    det.detect_elevator_events(t, ax, ay, az)
    traj_t = np.linspace(0, 60, 1200)
    labels = det.assign_floor_labels(traj_t, start_floor=5)

    assert labels[traj_t < 19.5].min() == 5 and labels[traj_t < 19.5].max() == 5
    mid = labels[(traj_t > 26) & (traj_t < 39.5)]
    assert (mid == 6).all()  # after the up event
    tail = labels[traj_t > 45]
    assert (tail == 5).all()  # back down
    # poses inside the elevator window carry the 0 "in transit" label
    inside = labels[(traj_t > 21) & (traj_t < 24)]
    assert (inside == 0).all()


def test_no_event_when_horizontal_motion_high(rng):
    t = np.arange(0, 30, 1 / 200)
    n = len(t)
    ax = rng.normal(0, 2.0, n)  # strong horizontal motion -> masked out
    ay = rng.normal(0, 2.0, n)
    az = np.full(n, 9.81)
    az[(t >= 10) & (t <= 15)] += 0.8
    det = IMUFloorDetector()
    assert det.detect_elevator_events(t, ax, ay, az) == []


def test_trailing_active_run_not_emitted(rng):
    # mask still active at the final sample -> falling edge never fires
    t = np.arange(0, 30, 1 / 200)
    n = len(t)
    ax = rng.normal(0, 0.05, n)
    ay = rng.normal(0, 0.05, n)
    az = np.full(n, 9.81)
    az[t >= 20] += 0.9  # runs to the end
    det = IMUFloorDetector()
    events = det.detect_elevator_events(t, ax, ay, az)
    assert events == []


def test_absolute_ros_timestamps(rng):
    # 1.7e9-second stamps must not lose precision on device
    t, ax, ay, az = _synthetic_imu(rng)
    det = IMUFloorDetector()
    events = det.detect_elevator_events(t + 1.678e9, ax, ay, az)
    assert len(events) == 2
    assert abs(events[0].start_time - (1.678e9 + 20)) < 1.0
