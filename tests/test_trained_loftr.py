"""Shipped in-env trained LoFTR checkpoint quality gate.

The third matcher family's trained-weights milestone (the reference
consumes kornia's pretrained LoFTR, geometric_verification.py:469-526;
`python -m mlis_tpu.train.pretrain_loftr` produces the in-env
equivalent). Skips until checkpoints/loftr_homog.npz ships.

The bar (held-out homography match recall >= 0.3 at <= 4 px) leaves
margin for the checkpoint's training resolution and CPU-vs-TPU numerics:
random init measures ~0.0 (nothing matches mutually), the tiny trainer
smoke already reaches 0.55 by 300 steps, so 0.3 separates "trained"
from "random" decisively without over-pinning.
"""

import os

import jax
import numpy as np
import pytest

def _default_ckpt():
    from mlis_tpu.models.weights import default_loftr_checkpoint

    return default_loftr_checkpoint()


CKPT = _default_ckpt()

requires_checkpoint = pytest.mark.skipif(
    CKPT is None, reason="shipped LoFTR checkpoint not present"
)


@requires_checkpoint
def test_shipped_loftr_checkpoint_meets_recall_milestone():
    from mlis_tpu.models.loftr import LoFTR
    from mlis_tpu.train.loftr_trainer import LoFTRTrainer
    from mlis_tpu.train.matcher_trainer import synthetic_textures

    hw = (128, 160)  # LoFTR weights are resolution-agnostic (convs +
    # attention over tokens); evaluate at a fixed modest size
    eval_imgs = np.asarray(synthetic_textures(jax.random.PRNGKey(777), 4, *hw))

    lf = LoFTR()
    lf.load_weights(CKPT, image_hw=hw)
    trained = LoFTRTrainer(lf, hw).match_metrics(eval_imgs)

    rnd = LoFTRTrainer(LoFTR(seed=3), hw).match_metrics(eval_imgs)

    assert trained["recall"] >= 0.3, trained
    assert trained["precision"] >= 0.5, trained
    assert trained["recall"] >= rnd["recall"] + 0.25, (trained, rnd)


@requires_checkpoint
def test_shipped_loftr_improves_gate_decisions():
    """Decision-level: trained LoFTR beats random-init LoFTR on the GT
    quality scene (the eval/quality.py third-family row)."""
    from mlis_tpu.eval.quality import make_quality_scene, run_gate_quality

    scene = make_quality_scene(n_places=4, hw=(128, 160))
    trained = run_gate_quality("loftr", scene=scene)
    rnd = run_gate_quality("loftr", scene=scene, weights_path="/nonexistent")
    assert trained["weights"] == os.path.basename(CKPT)
    assert trained["f1"] > rnd["f1"], (trained["f1"], rnd["f1"])
    assert trained["gating_effectiveness"] == 1.0


# -- parallax-trained checkpoint (round-5) --------------------------------------

CKPT_PARALLAX = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "loftr_parallax.npz"
)


def test_loftr_parallax_default_lookup():
    from mlis_tpu.models.weights import (
        default_loftr_checkpoint,
        default_parallax_loftr_checkpoint,
    )

    got = default_parallax_loftr_checkpoint()
    if os.path.exists(CKPT_PARALLAX):
        assert got.endswith("loftr_parallax.npz")
    else:
        assert got == default_loftr_checkpoint()


@pytest.mark.heavy
def test_loftr_parallax_checkpoint_meets_recall_milestone():
    """pretrain_loftr --parallax (warm-started from loftr_homog_v3):
    held-out dense recall on layered SE(3) pairs with occlusion-aware
    GT (LoFTRTrainer.parallax_match_metrics). The homography-trained v3
    is the floor on the parallax distribution."""
    if not os.path.exists(CKPT_PARALLAX):
        pytest.skip("parallax LoFTR checkpoint not present")
    from mlis_tpu.models.loftr import LoFTR, LoFTRConfig
    from mlis_tpu.train.loftr_trainer import LoFTRTrainer

    hw = (272, 360)
    key = jax.random.PRNGKey(773)

    lf = LoFTR(LoFTRConfig())
    lf.load_weights(CKPT_PARALLAX, image_hw=hw)
    par = LoFTRTrainer(
        lf, hw, pair_mode="parallax"
    ).parallax_match_metrics(n_pairs=4, key=key)

    from mlis_tpu.models.weights import _shipped_checkpoint

    v3 = _shipped_checkpoint("loftr_homog_v3.npz")
    if v3:
        lf_h = LoFTR(LoFTRConfig())
        lf_h.load_weights(v3, image_hw=hw)
        homog = LoFTRTrainer(
            lf_h, hw, pair_mode="parallax"
        ).parallax_match_metrics(n_pairs=4, key=key)
        assert par["recall"] > homog["recall"], (par, homog)
    assert par["recall"] >= 0.25, par
