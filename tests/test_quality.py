"""Gate decision-quality benchmark (eval/quality.py).

The pinned story (round-2 verdict #2): on a scene with known ground-truth
loop closures and cross-floor perceptual-aliasing traps, the full gate
with the shipped TRAINED matcher makes good decisions (F1), the same
pipeline at random init cannot (nothing verifies), and the floor gate
rejects every aliased candidate regardless.
"""

import os

import numpy as np
import pytest

from mlis_tpu.eval.quality import (
    make_quality_scene,
    make_quality_scene_v2,
    retrieval_recall,
    run_gate_quality,
    score_gate_decisions,
)

CKPT = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "lightglue_homog.npz"
)


def test_quality_scene_construction():
    scene = make_quality_scene(n_places=4, hw=(64, 96))
    assert scene.images.shape == (16, 64, 96)
    assert scene.images.dtype == np.uint8
    assert len(scene.gt_pairs) == 8  # 2 floors x 4 places
    assert len(scene.aliased_pairs) == 16  # 4 cross-floor combos per place
    # gt pairs are same-floor, aliased pairs cross-floor
    for a, b in scene.gt_pairs:
        assert scene.floors[a] == scene.floors[b]
    for a, b in scene.aliased_pairs:
        assert scene.floors[a] != scene.floors[b]
    # revisit gaps exceed the default min_time_gap; consecutive frames don't
    for a, b in scene.gt_pairs:
        assert abs(scene.timestamps[a] - scene.timestamps[b]) >= 10.0


def test_quality_scene_v2_construction():
    # small config for the CPU tier; the bench runs the full 4x32@270x360
    scene = make_quality_scene_v2(
        n_floors=3, n_places=4, hw=(96, 128), seed=1
    )
    assert scene.images.shape == (24, 96, 128)
    assert scene.images.dtype == np.uint8
    assert len(scene.gt_pairs) == 12  # 3 floors x 4 places
    # aliased traps: per place, C(3,2) floor pairs x 2x2 observations
    assert len(scene.aliased_pairs) == 4 * 3 * 4
    for a, b in scene.gt_pairs:
        assert scene.floors[a] == scene.floors[b]
        assert abs(scene.timestamps[a] - scene.timestamps[b]) >= 10.0
    for a, b in scene.aliased_pairs:
        assert scene.floors[a] != scene.floors[b]
    # 3 distinct floor labels, balanced
    fl, counts = np.unique(scene.floors, return_counts=True)
    assert len(fl) == 3 and (counts == 8).all()


def test_quality_scene_v2_has_parallax_not_single_homography():
    """The v2 revisit views must NOT be explainable by one homography
    (that was v1's saturation cause): fit the best single homography
    between the two views' layer-0 plane mapping and verify the other
    layers' induced mappings disagree by many pixels (parallax)."""
    import jax
    import jax.numpy as jnp

    from mlis_tpu.eval.quality import _plane_homography, _rotation_matrix

    H, W = 270, 360
    f = 200.0
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    Kinv = jnp.linalg.inv(K)
    R = _rotation_matrix(jnp.deg2rad(jnp.asarray([2.0, -3.0, 1.5])))
    # pure lateral translation at the scene's max_trans: disparity
    # between depth layers is exactly f*tx*(1/d_near - 1/d_far) = 15 px
    t = jnp.asarray([0.45, 0.0, 0.0])
    pt = jnp.asarray([W * 0.75, H * 0.25, 1.0])
    mapped = []
    for d in (4.0, 7.0, 12.0):
        Hm = _plane_homography(K, Kinv, R, t, d)
        q = Hm @ pt
        mapped.append(np.asarray(q[:2] / q[2]))
    expected = f * 0.45 * (1 / 4.0 - 1 / 12.0)  # 15 px
    assert abs(np.linalg.norm(mapped[0] - mapped[2]) - expected) < 1.0
    # and scale change: the z-translation changes pairwise pixel distances
    Hm = _plane_homography(K, Kinv, jnp.eye(3), jnp.asarray([0, 0, 1.0]), 4.0)
    a = Hm @ jnp.asarray([100.0, 100.0, 1.0])
    b = Hm @ jnp.asarray([200.0, 100.0, 1.0])
    a, b = np.asarray(a[:2] / a[2]), np.asarray(b[:2] / b[2])
    # X1 = X0 + t with t_z=+1: depth 4 -> 5 in the new frame, scale 4/5
    # (the scene draws t_z in +-1.2, i.e. scale changes of 0.77-1.43x)
    assert abs(np.linalg.norm(a - b) / 100.0 - 4.0 / 5.0) < 0.02


def test_quality_scene_v2_alias_similarity_varies():
    """Aliasing traps occur at VARYING similarity: alpha=1.0 places are
    near-identical cross-floor, alpha<1 places less so."""
    scene = make_quality_scene_v2(
        n_floors=2, n_places=6, hw=(96, 128),
        alias_strengths=(1.0, 0.7), occluder_prob=0.0, seed=0,
    )

    def corr(a, b):
        a = a.astype(np.float32).ravel() - a.mean()
        b = b.astype(np.float32).ravel() - b.mean()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    P = 6
    # pass-1 canonical views of place p on the two floors
    strong = [corr(scene.images[p], scene.images[2 * P * 1 + p])
              for p in range(0, P, 2)]  # alpha 1.0 places
    weak = [corr(scene.images[p], scene.images[2 * P * 1 + p])
            for p in range(1, P, 2)]  # alpha 0.7 places
    assert min(strong) > max(weak), (strong, weak)
    assert np.mean(strong) > 0.9  # near-identical -> retrieval WILL bite


def test_gate_runs_on_v2_scene_small():
    """End-to-end gate on a reduced v2 scene: decisions flow, the floor
    gate rejects the aliased traps, scoring fields are consistent. The
    weight-free ORB family keeps the CPU tier checkpoint-independent;
    the full 4x32 scoreboard runs on the chip (MLIS_BENCH_MODE=quality2)."""
    scene = make_quality_scene_v2(
        n_floors=2, n_places=4, hw=(135, 180), seed=0
    )
    out = run_gate_quality(
        "orb", scene=scene, max_keypoints=256,
        top_k=8, similarity_threshold=0.3,
    )
    assert out["n_frames"] == 16 and out["gt_pairs"] == 8
    assert out["gating_effectiveness"] == 1.0  # all traps rejected
    assert out["total_candidates"] > 0
    assert 0.0 <= out["f1"] <= 1.0
    # every accepted decision is a geometrically-valid verified pair
    assert (
        out["true_positives"] + out["false_positives"]
        == out["geometrically_valid"]
    )


def test_retrieval_metrics_rerank_contract():
    """retrieval_metrics: plain-encoder path, and the rerank path's
    requirement for a patch-cache instance."""
    from mlis_tpu.eval.quality import _pixel_encoder, retrieval_metrics

    scene = make_quality_scene_v2(
        n_floors=2, n_places=4, hw=(96, 128), seed=0
    )
    m = retrieval_metrics(scene, _pixel_encoder, top_k=6, threshold=0.0)
    assert 0.0 <= m["retrieval_recall"] <= 1.0
    assert 0.0 <= m["aliased_rate"] <= 1.0
    assert m["candidates_above_threshold"] > 0
    with pytest.raises(ValueError, match="rerank"):
        retrieval_metrics(scene, _pixel_encoder, rerank=True)


@pytest.mark.skipif(not os.path.exists(CKPT), reason="no shipped checkpoint")
def test_gate_decisions_trained_vs_random():
    scene = make_quality_scene(n_places=4)
    # 256 kpts: the trained weights transfer across keypoint budgets
    # (K is a top-k parameter, not a weight shape) and CPU time halves
    trained = run_gate_quality("trained", scene=scene, max_keypoints=256)
    random_ = run_gate_quality("random", scene=scene, max_keypoints=256)

    # the trained matcher makes the pipeline's decisions GOOD
    from mlis_tpu.models.weights import default_matcher_checkpoint

    assert trained["weights"] == os.path.basename(default_matcher_checkpoint())
    assert trained["f1"] >= 0.8, trained
    assert trained["recall"] >= 0.6
    # the confident-match cut (GeometricVerifier min_confident_matches=6)
    # removes the repeated-structure FPs RANSAC lets through: measured
    # precision 1.0 on seeds 0-7 at n_places=8 and on this scene
    assert trained["precision"] >= 0.99, trained
    # random init: true pairs don't verify -> decision quality collapses
    assert random_["f1"] <= 0.2, random_
    assert trained["f1"] - random_["f1"] >= 0.4

    # the floor gate rejects ALL aliased candidates in both runs (aliased
    # pairs share textures, so they'd geometrically verify — only the
    # gate stops them)
    assert trained["gating_effectiveness"] == 1.0
    assert random_["gating_effectiveness"] == 1.0
    assert trained["cross_floor_rate"] > 0.3  # traps actually retrieved
    # retrieval surfaces most true pairs to begin with
    assert trained["retrieval_recall"] >= 0.6

    # ablation: with the floor gate OFF the aliased same-texture pairs
    # geometrically verify and precision collapses — the gate IS the
    # decision-quality mechanism (reference's 62-75% rejection claim)
    no_gate = run_gate_quality(
        "trained", scene=scene, max_keypoints=256, floor_gate=False
    )
    assert no_gate["false_positives"] > trained["false_positives"]
    assert no_gate["precision"] <= trained["precision"] - 0.3
    assert no_gate["f1"] < trained["f1"]
