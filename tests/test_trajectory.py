import numpy as np
import pytest

from mlis_tpu.core.trajectory import (
    Trajectory,
    combine_sequences,
    endpoint_drift,
    load_tum,
    save_tum,
    trajectory_length,
)


def _mk_traj(n, t0=0.0, rng=None):
    rng = rng or np.random.default_rng(1)
    t = t0 + np.arange(n) * 0.05
    pos = rng.normal(size=(n, 3))
    quat = rng.normal(size=(n, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    return Trajectory(t, pos, quat)


def test_tum_roundtrip(tmp_path):
    traj = _mk_traj(50)
    p = tmp_path / "t.txt"
    save_tum(traj, p)
    back = load_tum(p)
    assert len(back) == 50
    np.testing.assert_allclose(back.positions, traj.positions, atol=1e-8)
    np.testing.assert_allclose(back.timestamps, traj.timestamps, atol=1e-5)


def test_tum_skips_comments_and_blank(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("# comment\n\n1.0 0 0 0 0 0 0 1\n2.0 1 0 0 0 0 0 1\n")
    traj = load_tum(p)
    assert len(traj) == 2


def test_trajectory_length_and_drift():
    pos = np.array([[0, 0, 0], [3, 4, 0], [3, 4, 12]], dtype=float)
    assert trajectory_length(pos) == pytest.approx(5 + 12)
    assert endpoint_drift(pos) == pytest.approx(13.0)


def test_combine_constant_floors():
    t1, t2 = _mk_traj(10), _mk_traj(20, t0=10)
    mat, labels = combine_sequences([("a", 5, t1), ("b", 1, t2)])
    assert mat.shape == (30, 8)
    assert (labels[:10] == 5).all() and (labels[10:] == 1).all()


def test_combine_transit_interpolation():
    # Reference semantics: linspace(start, end, n).round()
    t = _mk_traj(7)
    _, labels = combine_sequences(
        [("transit_5_to_1", None, t)], {"transit_5_to_1": (5, 1)}
    )
    expected = np.linspace(5, 1, 7).round().astype(int)
    np.testing.assert_array_equal(labels, expected)


def test_combine_missing_transit_mapping_raises():
    t = _mk_traj(3)
    with pytest.raises(KeyError):
        combine_sequences([("transit_x", None, t)], {})
