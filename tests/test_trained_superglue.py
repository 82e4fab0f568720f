"""Shipped in-env trained SuperGlue checkpoint quality gate.

The Sinkhorn-dustbin matcher family's trained-weights milestone
(reference README.md:41-45 lists SuperGlue as one of its three matcher
options; `pretrain_matcher --arch superglue` trains it with the same
homography self-supervision as the shipped LightGlue). Skips until
checkpoints/superglue_homog.npz ships.
"""

import os

import jax
import numpy as np
import pytest

CKPT = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "superglue_homog.npz"
)

requires_checkpoint = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="shipped SuperGlue checkpoint not present"
)


@requires_checkpoint
def test_shipped_superglue_checkpoint_meets_recall_milestone():
    from mlis_tpu.models.lightglue import SuperGlue
    from mlis_tpu.models.superpoint import SuperPointConfig
    from mlis_tpu.train.matcher_trainer import (
        MatcherTrainer,
        synthetic_textures,
    )

    hw = (128, 160)  # the checkpoint's training resolution/budget
    kpts = 256
    eval_imgs = np.asarray(synthetic_textures(jax.random.PRNGKey(777), 4, *hw))

    sg = SuperGlue(sp_cfg=SuperPointConfig(max_keypoints=kpts))
    sg.load_weights(CKPT, image_hw=hw)
    trained = MatcherTrainer(sg, hw).match_metrics(eval_imgs)

    rnd = MatcherTrainer(
        SuperGlue(sp_cfg=SuperPointConfig(max_keypoints=kpts), seed=3), hw
    ).match_metrics(eval_imgs)

    assert trained["recall"] >= 0.3, trained
    assert trained["recall"] >= rnd["recall"] + 0.25, (trained, rnd)


@requires_checkpoint
def test_shipped_superglue_perfect_gate_decisions():
    """Decision level: the trained Sinkhorn stack measured F1 1.0 on all
    8 quality-scene seeds (BENCH_NOTES); pin >= 0.95 on one held-out
    seed to leave numeric margin."""
    from mlis_tpu.eval.quality import make_quality_scene, run_gate_quality

    scene = make_quality_scene(n_places=8, seed=5)
    out = run_gate_quality("superglue", scene=scene, seed=5)
    assert out["weights"] == "superglue_homog.npz"
    assert out["f1"] >= 0.95, out
    assert out["false_positives"] == 0, out
    assert out["gating_effectiveness"] == 1.0
