"""Shipped in-env trained matcher checkpoint quality gates.

Round-2 verdict #1: the matcher must ship TRAINED weights with a pinned
held-out match-recall milestone. The checkpoint is produced by
`python -m mlis_tpu.train.pretrain_matcher` (homography self-supervision,
the official LightGlue pretraining recipe; the reference consumes the
torch-hub equivalent at geometric_verification.py:216-242). TPU-measured
held-out recall at save time: 0.93 (log: checkpoints/lightglue_homog_log.json);
the milestone here leaves margin for CPU-vs-TPU numerics.
"""

import os

import jax
import numpy as np
import pytest

CKPT = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "lightglue_homog.npz"
)

requires_checkpoint = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="shipped matcher checkpoint not present"
)


def _build(max_kpts=512):
    from mlis_tpu.models.lightglue import LightGlue, MatcherConfig
    from mlis_tpu.models.superpoint import SuperPointConfig

    return LightGlue(
        sp_cfg=SuperPointConfig(max_keypoints=max_kpts),
        matcher_cfg=MatcherConfig.lightglue(),
    )


@requires_checkpoint
def test_shipped_checkpoint_meets_recall_milestone():
    from mlis_tpu.train.matcher_trainer import (
        MatcherTrainer,
        synthetic_textures,
    )

    hw = (270, 360)
    # held-out: key disjoint from both the training stream (folds of seed 0)
    # and the trainer's eval key (10_000)
    eval_imgs = np.asarray(synthetic_textures(jax.random.PRNGKey(777), 6, *hw))

    lg = _build()
    lg.load_weights(CKPT, image_hw=hw)
    trained = MatcherTrainer(lg, hw).match_metrics(eval_imgs)

    random_init = MatcherTrainer(_build(), hw).match_metrics(eval_imgs)

    # the pinned milestone: >= 0.6 held-out homography match recall
    # (vs ~0 at random init)
    assert trained["recall"] >= 0.6, trained
    assert trained["precision"] >= 0.3, trained
    assert random_init["recall"] < 0.05, random_init
    assert trained["recall"] - random_init["recall"] >= 0.5


@requires_checkpoint
def test_checkpoint_loads_into_bench_configuration():
    """The 1024-kpt bench matcher accepts the checkpoint (keypoint count
    is a top-k parameter, not a weight shape) and the pipeline auto-load
    reports it."""
    from mlis_tpu.gating.full_gate import FullGatePipeline
    from mlis_tpu.gating.verification import GeometricVerifier

    lg = _build(max_kpts=1024)
    lg.load_weights(CKPT, image_hw=(270, 360))

    pipe = FullGatePipeline(
        verifier=GeometricVerifier(matcher=_build(max_kpts=1024)),
        vpr_method="mixvpr",
    )
    assert pipe.matcher_weights_loaded is not None
    assert pipe.matcher_weights_loaded.endswith("lightglue_homog.npz")


def test_tiny_matcher_auto_load_keeps_random_init():
    """Auto mode must not break tiny test matchers (shape mismatch ->
    silent random init)."""
    from types import SimpleNamespace

    from mlis_tpu.gating.full_gate import FullGatePipeline
    from mlis_tpu.gating.verification import GeometricVerifier
    from mlis_tpu.models.lightglue import LightGlue, MatcherConfig
    from mlis_tpu.models.superpoint import SuperPointConfig

    lg = LightGlue(
        sp_cfg=SuperPointConfig.tiny_test(max_keypoints=32),
        matcher_cfg=MatcherConfig.tiny_test(),
    )
    pipe = FullGatePipeline(
        vpr=SimpleNamespace(vpr=SimpleNamespace()),
        verifier=GeometricVerifier(matcher=lg),
    )
    assert pipe.matcher_weights_loaded is None
