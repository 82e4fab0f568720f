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
