import numpy as np
import pytest

from mlis_tpu.ops.pairwise import (
    candidate_counts,
    candidate_counts_host,
    candidate_pairs_host,
)


def _random_cloud(n, rng, scale=30.0):
    # Clustered positions so the 2 m ball finds plenty of neighbors
    centers = rng.normal(size=(8, 3)) * scale
    idx = rng.integers(0, 8, size=n)
    return centers[idx] + rng.normal(size=(n, 3))


def _brute_force(positions, floors, radius, min_gap):
    n = len(positions)
    total = same = 0
    for i in range(n):
        d = np.linalg.norm(positions[i + min_gap :] - positions[i], axis=1)
        js = np.nonzero(d <= radius)[0] + i + min_gap
        total += len(js)
        same += int((floors[js] == floors[i]).sum())
    return total, same, total - same


@pytest.mark.parametrize("n", [50, 700, 1500])
def test_host_counts_match_brute_force(n, rng):
    pos = _random_cloud(n, rng)
    floors = rng.integers(1, 6, size=n)
    expected = _brute_force(pos, floors, 2.0, 30)
    got = candidate_counts_host(pos, floors, radius=2.0, min_gap=30, tile=256)
    assert got == expected


def test_host_counts_match_scipy_kdtree(rng):
    from scipy.spatial import KDTree

    pos = _random_cloud(800, rng)
    floors = rng.integers(1, 6, size=800)
    tree = KDTree(pos)
    total = 0
    for i in range(len(pos)):
        for j in tree.query_ball_point(pos[i], 2.0):
            if abs(i - j) < 100 or i >= j:
                continue
            total += 1
    got_total, _, _ = candidate_counts_host(pos, floors, radius=2.0, min_gap=100)
    assert got_total == total


@pytest.mark.parametrize("n", [60, 900])
def test_device_counts_match_host(n, rng):
    pos = _random_cloud(n, rng)
    floors = rng.integers(1, 6, size=n)
    host = candidate_counts_host(pos, floors, radius=2.0, min_gap=25)
    dev = candidate_counts(pos, floors, radius=2.0, min_gap=25)
    assert dev == host


def test_device_counts_boundary_pairs(rng):
    # Pairs exactly at / within float32-noise of the radius must resolve in
    # float64 semantics via the band-refinement path.
    pos = np.zeros((300, 3))
    pos[:, 0] = np.arange(300) * 10.0
    # plant a pair at exactly radius, one just in, one just out
    pos[250] = pos[0] + [2.0, 0, 0]
    pos[251] = pos[1] + [2.0 - 1e-9, 0, 0]
    pos[252] = pos[2] + [2.0 + 1e-9, 0, 0]
    floors = np.ones(300, dtype=int)
    host = candidate_counts_host(pos, floors, radius=2.0, min_gap=100)
    dev = candidate_counts(pos, floors, radius=2.0, min_gap=100)
    assert host == dev
    assert host[0] == 2  # exactly-at and just-in count; just-out does not


def test_pairs_host_consistent_with_counts(rng):
    pos = _random_cloud(500, rng)
    floors = rng.integers(1, 6, size=500)
    qi, mi, d = candidate_pairs_host(pos, floors, radius=2.0, min_gap=40, tile=128)
    total, same, cross = candidate_counts_host(pos, floors, radius=2.0, min_gap=40)
    assert len(qi) == total
    assert (mi - qi >= 40).all()
    assert (d <= 2.0).all()
    assert int((floors[qi] == floors[mi]).sum()) == same
