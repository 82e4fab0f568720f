"""Epipolar ops: synthetic two-view geometry with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlis_tpu.ops.epipolar import (
    essential_ransac,
    essential_ransac_batch,
    recover_pose,
    sampson_error,
)


def _rotation(axis, angle):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


K_CAM = np.array([[400.0, 0, 360.0], [0, 400.0, 270.0], [0, 0, 1.0]])


def _two_view_scene(rng, n=200, noise_px=0.3, outlier_frac=0.0):
    """Points in front of both cameras; camera2 = (R, t) with x2 = R x1 + t."""
    R = _rotation([0.2, 1.0, 0.1], 0.15)
    t = np.array([0.5, 0.05, 0.1])
    t /= np.linalg.norm(t)

    P1 = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3))
    P2 = P1 @ R.T + t

    def project(P):
        uv = P[:, :2] / P[:, 2:3]
        return uv * [K_CAM[0, 0], K_CAM[1, 1]] + [K_CAM[0, 2], K_CAM[1, 2]]

    k1 = project(P1) + rng.normal(0, noise_px, (n, 2))
    k2 = project(P2) + rng.normal(0, noise_px, (n, 2))

    n_out = int(n * outlier_frac)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        k2[idx] = rng.uniform([0, 0], [720, 540], size=(n_out, 2))
    return k1, k2, R, t


def test_ransac_finds_inliers_clean_scene(rng):
    k1, k2, R, t = _two_view_scene(rng, n=100, noise_px=0.2)
    valid = jnp.ones(100, bool)
    res = essential_ransac(
        jnp.asarray(k1), jnp.asarray(k2), valid, jnp.asarray(K_CAM),
        jax.random.PRNGKey(0), num_hypotheses=256,
    )
    assert int(res.num_inliers) > 85
    assert float(res.inlier_ratio) > 0.85


def test_ransac_rejects_outliers(rng):
    k1, k2, R, t = _two_view_scene(rng, n=200, noise_px=0.2, outlier_frac=0.4)
    valid = jnp.ones(200, bool)
    res = essential_ransac(
        jnp.asarray(k1), jnp.asarray(k2), valid, jnp.asarray(K_CAM),
        jax.random.PRNGKey(1), num_hypotheses=512,
    )
    # ~120 true inliers; RANSAC should find most and not absorb outliers
    assert 90 <= int(res.num_inliers) <= 140
    mask = np.asarray(res.inlier_mask)
    # the planted outliers are at the chosen indices -> most must be excluded
    assert mask.mean() < 0.75


def test_ransac_respects_padding_mask(rng):
    k1, k2, *_ = _two_view_scene(rng, n=50, noise_px=0.2)
    k1p = np.vstack([k1, np.zeros((30, 2))])
    k2p = np.vstack([k2, np.zeros((30, 2))])
    valid = jnp.asarray(np.r_[np.ones(50, bool), np.zeros(30, bool)])
    res = essential_ransac(
        jnp.asarray(k1p), jnp.asarray(k2p), valid, jnp.asarray(K_CAM),
        jax.random.PRNGKey(2), num_hypotheses=256,
    )
    mask = np.asarray(res.inlier_mask)
    assert not mask[50:].any()  # padded rows can never be inliers
    assert int(res.num_inliers) > 40


def test_recover_pose_matches_ground_truth(rng):
    k1, k2, R_true, t_true = _two_view_scene(rng, n=150, noise_px=0.1)
    valid = jnp.ones(150, bool)
    res = essential_ransac(
        jnp.asarray(k1), jnp.asarray(k2), valid, jnp.asarray(K_CAM),
        jax.random.PRNGKey(3), num_hypotheses=512,
    )
    T, good, det = recover_pose(
        res.E, jnp.asarray(k1), jnp.asarray(k2), res.inlier_mask, jnp.asarray(K_CAM)
    )
    T = np.asarray(T)
    assert float(det) == pytest.approx(1.0, abs=1e-4)
    assert int(good) > 100
    # rotation error
    dR = T[:3, :3] @ R_true.T
    angle = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert angle < 1.0
    # translation direction (up to scale)
    cos = abs(np.dot(T[:3, 3], t_true))
    assert cos > 0.99


def test_sampson_error_zero_for_exact_geometry(rng):
    k1, k2, R, t = _two_view_scene(rng, n=50, noise_px=0.0)
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    from mlis_tpu.ops.epipolar import normalize_points

    x1 = normalize_points(jnp.asarray(k1), jnp.asarray(K_CAM))
    x2 = normalize_points(jnp.asarray(k2), jnp.asarray(K_CAM))
    err = np.asarray(sampson_error(jnp.asarray(E), x1, x2))
    assert err.max() < 1e-10


def test_batched_ransac_pose(rng):
    pairs = [_two_view_scene(rng, n=120, noise_px=0.2) for _ in range(4)]
    k1 = jnp.asarray(np.stack([p[0] for p in pairs]))
    k2 = jnp.asarray(np.stack([p[1] for p in pairs]))
    valid = jnp.ones((4, 120), bool)
    res, T, good = essential_ransac_batch(
        k1, k2, valid, jnp.asarray(K_CAM), jax.random.PRNGKey(4),
        num_hypotheses=256,
    )
    assert res.num_inliers.shape == (4,)
    assert T.shape == (4, 4, 4)
    assert (np.asarray(res.num_inliers) > 90).all()
    assert (np.asarray(good) > 80).all()


# -- two-stage hypothesis scoring (score_subset) -------------------------------


def test_two_stage_scoring_matches_full_on_outlier_scene(rng):
    """Ranking hypotheses on a stratified point subset must find the same
    consensus set as full scoring (the final mask/count are ALWAYS
    computed on all N points with the projected E)."""
    k1, k2, R, t = _two_view_scene(rng, n=200, noise_px=0.3, outlier_frac=0.3)
    valid = jnp.ones(200, bool)
    args = (jnp.asarray(k1), jnp.asarray(k2), valid, jnp.asarray(K_CAM),
            jax.random.PRNGKey(7))
    full = essential_ransac(*args, num_hypotheses=256)
    two = essential_ransac(*args, num_hypotheses=256, score_subset=48)
    # ~140 true inliers; both scorings must recover the consensus set
    assert int(full.num_inliers) > 90
    assert int(two.num_inliers) > 90
    assert abs(int(two.num_inliers) - int(full.num_inliers)) < 20


def test_two_stage_subset_geq_n_is_exact_full_path(rng):
    """score_subset >= N (or 0) is bit-identical to classic full scoring."""
    k1, k2, *_ = _two_view_scene(rng, n=64, noise_px=0.3, outlier_frac=0.2)
    valid = jnp.ones(64, bool)
    args = (jnp.asarray(k1), jnp.asarray(k2), valid, jnp.asarray(K_CAM),
            jax.random.PRNGKey(3))
    full = essential_ransac(*args, num_hypotheses=128)
    same = essential_ransac(*args, num_hypotheses=128, score_subset=64)
    assert int(full.num_inliers) == int(same.num_inliers)
    np.testing.assert_array_equal(
        np.asarray(full.inlier_mask), np.asarray(same.inlier_mask)
    )


def test_two_stage_scoring_with_padded_slots(rng):
    """The stratified subset must draw only from VALID (compacted-first)
    slots; padded correspondences stay excluded from inlier counts."""
    k1, k2, *_ = _two_view_scene(rng, n=96, noise_px=0.3)
    pad = 160 - 96
    k1p = np.concatenate([k1, np.zeros((pad, 2))])
    k2p = np.concatenate([k2, np.zeros((pad, 2))])
    valid = jnp.asarray([True] * 96 + [False] * pad)
    res = essential_ransac(
        jnp.asarray(k1p), jnp.asarray(k2p), valid, jnp.asarray(K_CAM),
        jax.random.PRNGKey(11), num_hypotheses=256, score_subset=32,
    )
    assert int(res.num_inliers) > 80
    assert not np.asarray(res.inlier_mask)[96:].any()
    assert float(res.inlier_ratio) <= 1.0
