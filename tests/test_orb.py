"""TPU-native ORB (FAST-9 + steered BRIEF + Hamming cross-check).

Covers the reference's weight-free fallback matcher behavior
(geometric_verification.py:243-250, 314-350): corner detection on real
structure only, shift-consistent matching, crossCheck mutual filtering,
and distance-derived confidences.
"""

import numpy as np
import pytest

from mlis_tpu.models.orb import (
    ORBMatcher,
    fast_detect,
    hamming_mutual_match,
    orb_detect_describe,
)


def _textured(rng, h=120, w=160):
    """Blocky random texture: plenty of corners, deterministic."""
    img = np.kron(
        rng.uniform(0.1, 0.9, size=(h // 8, w // 8)), np.ones((8, 8))
    )[:h, :w]
    return img.astype(np.float32)


def test_fast_detect_finds_corners_not_flat(rng):
    img = _textured(rng)
    flat = np.full_like(img, 0.5)
    coords, scores, valid = fast_detect(np.stack([img, flat]), 128, 0.08)
    coords, scores, valid = map(np.asarray, (coords, scores, valid))
    assert valid[0].sum() > 20  # texture has corners
    assert valid[1].sum() == 0  # flat image has none
    # all detections respect the patch margin
    ys, xs = coords[0, valid[0], 1], coords[0, valid[0], 0]
    assert ys.min() >= 18 and xs.min() >= 18
    assert ys.max() < 120 - 18 and xs.max() < 160 - 18


def test_orb_descriptors_shift_consistent(rng):
    """The same scene translated by (dx, dy): mutual Hamming matches must
    recover the shift for the bulk of the matched points."""
    base = _textured(rng, 160, 200)
    dy, dx = 6, 9
    shifted = np.roll(base, (dy, dx), axis=(0, 1))
    m = ORBMatcher(max_keypoints=256)
    mk1, mk2, conf = m.detect_and_match(base, shifted)
    assert len(mk1) >= 20
    deltas = mk2 - mk1
    good = (np.abs(deltas[:, 0] - dx) <= 1) & (np.abs(deltas[:, 1] - dy) <= 1)
    assert good.mean() > 0.6
    # confidences: sorted-by-distance, in [0, 1], best first
    assert conf[0] == conf.max()
    assert (conf >= 0).all() and (conf <= 1).all()
    assert m.last_detector_counts[0] >= 20


def test_hamming_mutual_match_vs_numpy(rng):
    K = 64
    d0 = rng.integers(0, 2**32, size=(K, 8), dtype=np.uint32)
    d1 = rng.integers(0, 2**32, size=(K, 8), dtype=np.uint32)
    v0 = np.ones(K, bool)
    v1 = np.ones(K, bool)
    v1[-10:] = False
    midx, mdist = map(np.asarray, hamming_mutual_match(d0, v0, d1, v1))

    # numpy brute force
    dist = np.zeros((K, K), np.int32)
    for i in range(K):
        for j in range(K):
            dist[i, j] = bin(
                int.from_bytes(
                    (d0[i] ^ d1[j]).tobytes(), "little"
                )
            ).count("1")
    dist[:, ~v1] = 1 << 24
    nn0 = dist.argmin(1)
    nn1 = dist.argmin(0)
    for i in range(K):
        expect = nn0[i] if nn1[nn0[i]] == i else -1
        assert midx[i] == expect
        if expect >= 0:
            assert mdist[i] == dist[i, expect]
            assert not (expect >= K - 10 and not v1[expect])


def test_orb_flat_images_return_empty(rng):
    m = ORBMatcher(max_keypoints=64)
    flat = np.full((100, 100), 0.3, np.float32)
    mk1, mk2, conf = m.detect_and_match(flat, flat)
    assert len(mk1) == 0 and len(mk2) == 0 and len(conf) == 0


def test_orb_through_geometric_verifier(rng):
    from mlis_tpu.gating.verification import GeometricVerifier

    base = (_textured(rng, 160, 200) * 255).astype(np.uint8)
    shifted = np.roll(base, (0, 7), axis=(0, 1))
    v = GeometricVerifier(matcher_type="orb", max_keypoints=256)
    K = np.array([[150.0, 0, 100.0], [0, 150.0, 80.0], [0, 0, 1.0]])
    res = v.verify(base, shifted, K)
    assert res.num_matches >= 5
    assert res.num_keypoints_query >= res.num_matches
    assert 0.0 <= res.inlier_ratio <= 1.0


def test_orb_batched_front_end(rng):
    m = ORBMatcher(max_keypoints=128)
    batch = np.stack([_textured(rng), _textured(rng)])
    coords, desc, valid = m.detect_and_describe(batch)
    assert coords.shape == (2, 128, 2)
    assert desc.shape == (2, 128, 8) and desc.dtype == np.uint32
    assert valid.any(axis=1).all()
