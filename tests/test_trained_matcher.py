"""Shipped in-env trained matcher checkpoint quality gates.

Round-2 verdict #1: the matcher must ship TRAINED weights with a pinned
held-out match-recall milestone. Two checkpoints are produced by
`python -m mlis_tpu.train.pretrain_matcher` (homography self-supervision,
the official LightGlue pretraining recipe; the reference consumes the
torch-hub equivalent at geometric_verification.py:216-242):

  * lightglue_homog.npz     — matcher on the random-filter SuperPoint
                              (TPU held-out recall at save time: 0.93);
  * lightglue_homog_sp.npz  — matcher trained ON the self-supervised
                              trained SuperPoint (--sp-init,
                              train/pretrain_superpoint.py; recall 0.87,
                              higher quality-bench F1) — the preferred
                              shipped default (models/weights.py
                              default_matcher_checkpoint).

The milestones here leave margin for CPU-vs-TPU numerics.
"""

import os

import jax
import numpy as np
import pytest

_CKPT_DIR = os.path.join(os.path.dirname(__file__), "..", "checkpoints")
CKPT = os.path.join(_CKPT_DIR, "lightglue_homog.npz")
CKPT_SP = os.path.join(_CKPT_DIR, "lightglue_homog_sp.npz")

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


@pytest.mark.parametrize(
    "ckpt", [CKPT, CKPT_SP], ids=["random_sp", "trained_sp"]
)
def test_shipped_checkpoint_meets_recall_milestone(ckpt):
    if not os.path.exists(ckpt):
        pytest.skip("shipped matcher checkpoint not present")
    from mlis_tpu.train.matcher_trainer import (
        MatcherTrainer,
        synthetic_textures,
    )

    hw = (270, 360)
    # held-out: key disjoint from both the training stream (folds of seed 0)
    # and the trainer's eval key (10_000)
    eval_imgs = np.asarray(synthetic_textures(jax.random.PRNGKey(777), 6, *hw))

    lg = _build()
    lg.load_weights(ckpt, image_hw=hw)
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
    reports the preferred shipped default."""
    from mlis_tpu.gating.full_gate import FullGatePipeline
    from mlis_tpu.gating.verification import GeometricVerifier
    from mlis_tpu.models.weights import default_matcher_checkpoint

    lg = _build(max_kpts=1024)
    lg.load_weights(CKPT, image_hw=(270, 360))

    pipe = FullGatePipeline(
        verifier=GeometricVerifier(matcher=_build(max_kpts=1024)),
        vpr_method="mixvpr",
    )
    assert pipe.matcher_weights_loaded is not None
    assert pipe.matcher_weights_loaded == default_matcher_checkpoint()
    expected = "lightglue_homog_sp.npz" if os.path.exists(CKPT_SP) else \
        "lightglue_homog.npz"
    assert pipe.matcher_weights_loaded.endswith(expected)


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


# -- fullres-protocol checkpoint (lightglue_homog_sp_fullres.npz) ---------------

CKPT_FULLRES = os.path.join(_CKPT_DIR, "lightglue_homog_sp_fullres.npz")


def test_fullres_default_lookup():
    """The fullres protocol prefers the 540x720-trained checkpoint and
    falls back to the half-res default when it isn't shipped."""
    from mlis_tpu.models.weights import (
        default_fullres_matcher_checkpoint,
        default_matcher_checkpoint,
    )

    got = default_fullres_matcher_checkpoint()
    if os.path.exists(CKPT_FULLRES):
        assert got.endswith("lightglue_homog_sp_fullres.npz")
    else:
        assert got == default_matcher_checkpoint()


# -- parallax-trained checkpoint (lightglue_parallax_sp.npz) -------------------

CKPT_PARALLAX = os.path.join(_CKPT_DIR, "lightglue_parallax_sp.npz")


def test_parallax_default_lookup():
    """The v2 quality protocol prefers the parallax-trained checkpoint
    and falls back to the homography-trained default when absent."""
    from mlis_tpu.models.weights import (
        default_matcher_checkpoint,
        default_parallax_matcher_checkpoint,
    )

    got = default_parallax_matcher_checkpoint()
    if os.path.exists(CKPT_PARALLAX):
        assert got.endswith("lightglue_parallax_sp.npz")
    else:
        assert got == default_matcher_checkpoint()


def test_parallax_checkpoint_meets_recall_milestone():
    """Held-out recall on layered SE(3) pairs with occlusion-aware GT
    (MatcherTrainer.parallax_match_metrics — the v2 GT scene's two-view
    distribution) for the shipped parallax-trained checkpoint. The
    homography-trained default is the comparison floor: parallax
    training must beat it on its own distribution."""
    if not os.path.exists(CKPT_PARALLAX):
        pytest.skip("parallax matcher checkpoint not present")
    from mlis_tpu.train.matcher_trainer import MatcherTrainer

    hw = (270, 360)
    key = jax.random.PRNGKey(777)

    lg = _build()
    lg.load_weights(CKPT_PARALLAX, image_hw=hw)
    par = MatcherTrainer(lg, hw, pair_mode="parallax").parallax_match_metrics(
        n_pairs=8, key=key
    )

    lg_h = _build()
    lg_h.load_weights(CKPT_SP, image_hw=hw)
    homog = MatcherTrainer(
        lg_h, hw, pair_mode="parallax"
    ).parallax_match_metrics(n_pairs=8, key=key)

    # pinned milestone (save-time TPU recall 0.58+; margin for CPU
    # numerics and the 8-pair sample)
    assert par["recall"] >= 0.35, par
    assert par["recall"] > homog["recall"], (par, homog)


@pytest.mark.slow
def test_fullres_checkpoint_meets_recall_milestone():
    """540x720/1024-kpt held-out homography recall >= 0.6 (save-time TPU
    value 0.896; margin for CPU numerics). GT-scene decisions at the
    fullres protocol: mean F1 0.93 vs 0.75 for the half-res-trained
    default (BENCH_NOTES 'Fullres-trained matcher')."""
    if not os.path.exists(CKPT_FULLRES):
        pytest.skip("fullres matcher checkpoint not present")
    from mlis_tpu.train.matcher_trainer import (
        MatcherTrainer,
        synthetic_textures,
    )

    hw = (540, 720)
    eval_imgs = np.asarray(synthetic_textures(jax.random.PRNGKey(777), 4, *hw))
    lg = _build(max_kpts=1024)
    lg.load_weights(CKPT_FULLRES, image_hw=hw)
    trained = MatcherTrainer(lg, hw).match_metrics(eval_imgs)
    assert trained["recall"] >= 0.6, trained
    assert trained["precision"] >= 0.3, trained


# -- parallax-trained SuperGlue / LoFTR (round-5) -------------------------------

CKPT_SG_PARALLAX = os.path.join(_CKPT_DIR, "superglue_parallax.npz")
CKPT_SG_HOMOG = os.path.join(_CKPT_DIR, "superglue_homog.npz")


def _build_superglue(max_kpts=512):
    from mlis_tpu.models.lightglue import SuperGlue
    from mlis_tpu.models.superpoint import SuperPointConfig

    return SuperGlue(sp_cfg=SuperPointConfig(max_keypoints=max_kpts))


def test_superglue_parallax_default_lookup():
    from mlis_tpu.models.weights import (
        default_parallax_superglue_checkpoint,
        default_superglue_checkpoint,
    )

    got = default_parallax_superglue_checkpoint()
    if os.path.exists(CKPT_SG_PARALLAX):
        assert got.endswith("superglue_parallax.npz")
    else:
        assert got == default_superglue_checkpoint()


def test_superglue_parallax_checkpoint_meets_recall_milestone():
    """pretrain_matcher --arch superglue --parallax --sp-init: held-out
    SE(3)-pair recall 0.562 at save time (chip). Unlike LightGlue, the
    homography-trained Sinkhorn stack is already parallax-robust on raw
    recall (0.66 on this CPU sample) — the parallax training buys
    PRECISION (0.32 vs 0.29), so the pin compares match F1, and recall
    cross-checkpoint comparisons are confounded anyway (different frozen
    SuperPoints -> different GT correspondence sets)."""
    if not os.path.exists(CKPT_SG_PARALLAX):
        pytest.skip("parallax SuperGlue checkpoint not present")
    from mlis_tpu.train.matcher_trainer import MatcherTrainer

    hw = (270, 360)
    key = jax.random.PRNGKey(777)

    sg = _build_superglue()
    sg.load_weights(CKPT_SG_PARALLAX, image_hw=hw)
    par = MatcherTrainer(sg, hw, pair_mode="parallax").parallax_match_metrics(
        n_pairs=8, key=key
    )

    sg_h = _build_superglue()
    sg_h.load_weights(CKPT_SG_HOMOG, image_hw=hw)
    homog = MatcherTrainer(
        sg_h, hw, pair_mode="parallax"
    ).parallax_match_metrics(n_pairs=8, key=key)

    def f1(m):
        return 2 * m["precision"] * m["recall"] / (
            m["precision"] + m["recall"] + 1e-9
        )

    # save-time TPU recall 0.562; margin for CPU numerics + 8-pair sample
    assert par["recall"] >= 0.30, par
    assert f1(par) > f1(homog), (par, homog)
