"""VPR retrieval path at SURVEY §6 scale.

The reference's headline VPR flow (place_recognition.py:851-933) runs
N x N retrieval -> floor-validity flags -> match statistics over the full
keyframe database. These tests drive the same path through the device
retrieval (ops/knn.cosine_topk) at >= 2048 keyframes, with a slow variant
at the real 19,163-pose ORB-SLAM3 scale using the published floor labels.

Descriptors are synthesized as random Fourier features of the PLANAR
(x, y) position only, so vertically stacked floors alias — exactly the
multi-level perceptual-aliasing phenomenon the semantic gate exists to
reject.
"""

import numpy as np
import pytest

from mlis_tpu.gating.place_recognition import (
    BasePlaceRecognition,
    SemanticPlaceRecognition,
)

REFERENCE_ROOT = "/root/reference/results/trajectories"


def _planar_descriptors(positions_xy: np.ndarray, dim: int, seed: int = 0):
    """Random-Fourier-feature embedding of planar position: cosine
    similarity approximates an RBF kernel of in-plan distance, so frames
    above/below each other (different floors, same plan location) produce
    near-identical descriptors."""
    rng = np.random.default_rng(seed)
    W = rng.normal(scale=0.8, size=(2, dim))
    b = rng.uniform(0, 2 * np.pi, size=dim)
    d = np.cos(positions_xy @ W + b).astype(np.float32)
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def _build_spr(positions_xy, timestamps, floors, dim=128, threshold=0.6):
    vpr = BasePlaceRecognition(descriptor_dim=dim)
    spr = SemanticPlaceRecognition(
        vpr_method=vpr, similarity_threshold=threshold, min_time_gap=30.0
    )
    descs = _planar_descriptors(positions_xy, dim)
    for i in range(len(descs)):
        vpr.add_descriptor(descs[i], float(timestamps[i]), int(floors[i]))
    return spr


def test_vpr_path_at_scale_2k():
    """>= 2048 keyframes through cosine_topk + floor gating + stats."""
    n = 2048
    rng = np.random.default_rng(7)
    # 4 floors sharing one building footprint: repeated plan-space loops
    floors = np.repeat([1, 2, 4, 5], n // 4)
    t = np.linspace(0, 4 * np.pi, n // 4)
    loop_xy = np.stack([12 * np.cos(t), 7 * np.sin(2 * t)], axis=1)
    positions = np.concatenate([loop_xy] * 4) + rng.normal(scale=0.05, size=(n, 2))
    timestamps = np.arange(n) * 5.0

    spr = _build_spr(positions, timestamps, floors)
    matches = spr.find_loop_closures(enable_floor_gating=True, k=10)
    stats = spr.get_statistics(matches)

    assert stats["total_matches"] > n  # directed matches, dense aliasing
    assert stats["total_matches"] == len(matches)
    assert 0.0 < stats["rejection_rate"] < 1.0
    # floors stack the same footprint -> the gate must reject a majority
    assert stats["rejection_rate"] > 0.5
    assert stats["valid_matches"] + stats["rejected_matches"] == stats["total_matches"]
    # validity flag parity with a direct recomputation
    fl = spr.vpr.floor_labels()
    for m in matches[:500]:
        assert m.is_valid == (fl[m.query_idx] == fl[m.match_idx])
        assert m.similarity >= spr.similarity_threshold
        assert abs(m.query_timestamp - m.match_timestamp) >= spr.min_time_gap

    # retrieval parity against brute-force numpy on a sample of queries
    db = spr.vpr.build_descriptor_matrix()
    sims = db @ db.T
    ts = spr.vpr.timestamps()
    by_query = {}
    for m in matches:
        by_query.setdefault(m.query_idx, []).append(m)
    for q in range(0, n, 257):
        row = sims[q].copy()
        row[np.abs(ts - ts[q]) < spr.min_time_gap] = -np.inf
        expect = {
            int(j)
            for j in np.argsort(-row)[:10]
            if row[j] >= spr.similarity_threshold
        }
        got = {m.match_idx for m in by_query.get(q, [])}
        # ties at the top-k boundary may swap members; require >= 80% overlap
        if expect:
            assert len(expect & got) / len(expect) >= 0.8


@pytest.mark.slow
def test_vpr_path_survey_scale_19k():
    """The full 19,163-pose ORB-SLAM3 database (SURVEY §6 scale) through
    the directed VPR path, using the published floor labels."""
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference trajectory data not present")
    from mlis_tpu.core.dataset import NUFRM3F
    from mlis_tpu.core.trajectory import combine_sequences

    m = NUFRM3F(REFERENCE_ROOT, "orb_slam3")
    mat, floors = combine_sequences(m.load(), {})
    n = len(mat)
    assert n == 19163

    spr = _build_spr(mat[:, 1:3], mat[:, 0], floors, dim=128, threshold=0.6)
    matches = spr.find_loop_closures(enable_floor_gating=True, k=10)
    stats = spr.get_statistics(matches)

    assert stats["total_matches"] > 10_000
    assert 0.0 < stats["rejection_rate"] < 1.0
    assert stats["mean_similarity"] >= 0.6
    # every match respects the temporal mask and threshold
    for mm in matches[:1000]:
        assert mm.similarity >= 0.6
        assert abs(mm.query_timestamp - mm.match_timestamp) >= spr.min_time_gap
