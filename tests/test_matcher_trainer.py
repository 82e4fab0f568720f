"""Homography self-supervision for the LightGlue matcher (tiny, CPU).

Validates the training geometry (DLT homographies, on-device warping, GT
correspondence construction) and that a few training steps reduce the
assignment loss and raise held-out match recall over random init —
the LightGlue pretraining recipe, TPU-native.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlis_tpu.models.lightglue import LightGlue, MatcherConfig
from mlis_tpu.models.superpoint import SuperPointConfig
from mlis_tpu.train.matcher_trainer import (
    MatcherTrainer,
    apply_homography,
    gt_assignment,
    random_homography,
    warp_image,
)


def _textures(rng, n, h, w):
    imgs = np.kron(
        rng.uniform(0.1, 0.9, size=(n, h // 8, w // 8)), np.ones((8, 8))
    )[:, :h, :w]
    return imgs.astype(np.float32)


def test_random_homography_maps_corners_and_inverts():
    Hm = np.asarray(random_homography(jax.random.PRNGKey(0), 64, 96))
    assert Hm.shape == (3, 3)
    assert Hm[2, 2] == pytest.approx(1.0)
    # corners map within the declared jitter budget
    corners = np.array([[0, 0], [95, 0], [95, 63], [0, 63]], float)
    mapped = np.asarray(apply_homography(jnp.asarray(Hm), jnp.asarray(corners)))
    assert np.all(np.abs(mapped - corners) <= 0.15 * np.array([96, 64]) + 1e-3)
    # identity homography keeps points fixed
    pts = np.random.default_rng(0).uniform(0, 60, (10, 2))
    same = np.asarray(apply_homography(jnp.eye(3), jnp.asarray(pts)))
    np.testing.assert_allclose(same, pts, atol=1e-6)


def test_warp_image_identity_and_translation(rng):
    img = _textures(rng, 1, 48, 64)[0]
    out = np.asarray(warp_image(jnp.asarray(img), jnp.eye(3)))
    np.testing.assert_allclose(out, img, atol=1e-5)
    # pure translation by (5, 3): interior pixels shift exactly
    T = np.eye(3)
    T[0, 2], T[1, 2] = 5.0, 3.0
    out = np.asarray(warp_image(jnp.asarray(img), jnp.asarray(T)))
    np.testing.assert_allclose(out[10:40, 10:60], img[7:37, 5:55], atol=1e-4)


def test_gt_assignment_recovers_known_matches():
    kp0 = jnp.asarray([[10.0, 10.0], [30.0, 20.0], [50.0, 40.0], [0.0, 0.0]])
    m0 = jnp.asarray([True, True, True, False])
    T = jnp.asarray(np.array([[1, 0, 5], [0, 1, -2], [0, 0, 1]], float))
    kp1 = jnp.asarray(
        [[35.0, 18.0], [15.0, 8.0], [99.0, 99.0], [55.0, 38.0]]
    )  # shuffled projections of kp0 (+ one outlier slot)
    m1 = jnp.ones(4, bool)
    gt = np.asarray(gt_assignment(kp0, m0, kp1, m1, T, threshold_px=3.0))
    assert gt[0, 1] and gt[1, 0] and gt[2, 3]
    assert gt.sum() == 3  # masked kp0[3] and outlier kp1[2] match nothing


def test_matcher_training_improves_recall(rng):
    lg = LightGlue(
        sp_cfg=SuperPointConfig.tiny_test(max_keypoints=48),
        matcher_cfg=MatcherConfig.tiny_test(),
    )
    hw = (64, 96)
    trainer = MatcherTrainer(lg, hw, learning_rate=3e-3, seed=1)
    train_imgs = _textures(rng, 4, *hw)
    eval_imgs = _textures(rng, 4, *hw)

    recall_before = trainer.match_recall(eval_imgs)
    loss0, n_gt = trainer.train_batch(train_imgs)
    assert n_gt > 0  # homography pairs must produce GT correspondences
    # scanned multi-step chunk with on-device synthetic textures (the
    # production training path — one dispatch for all steps)
    losses = trainer.train_chunk(30, batch_size=4)
    recall_after = trainer.match_recall(eval_imgs)

    assert losses.shape == (30,)
    assert np.isfinite(losses).all()
    assert losses[-5:].mean() < losses[:5].mean() * 0.9  # loss drops materially
    assert recall_after >= recall_before  # and held-out recall doesn't regress


def test_gt_assignment_parallax_occlusion_aware():
    """Hand-built two-layer case: a keypoint on the far layer projects
    through the FAR plane's homography, and is excluded when the near
    layer covers its projection in view 1 (occlusion) — supervision a
    single-homography gt_assignment cannot express."""
    import jax.numpy as jnp
    import numpy as np

    from mlis_tpu.train.matcher_trainer import gt_assignment_parallax

    H = W = 64
    # layer 0 (near) covers the left half of view 1 ONLY; view 0 is all
    # far layer (layer 1)
    lid0 = jnp.ones((H, W), jnp.int32)  # everything far in view 0
    lid1 = jnp.where(
        jnp.arange(W)[None, :] < W // 2, 0, 1
    ) * jnp.ones((H, 1), jnp.int32)
    # far plane shifts +8 px in x; near plane irrelevant here
    H_far = jnp.asarray([[1.0, 0, 8.0], [0, 1, 0], [0, 0, 1]])
    H_near = jnp.asarray([[1.0, 0, 20.0], [0, 1, 0], [0, 0, 1]])
    Hs = jnp.stack([H_near, H_far])

    # kp A at x=40 (projects to 48, right half -> far layer visible: GT)
    # kp B at x=10 (projects to 18, LEFT half -> occluded by near: no GT)
    kp0 = jnp.asarray([[40.0, 32.0], [10.0, 32.0]])
    m0 = jnp.ones(2, bool)
    kp1 = jnp.asarray([[48.0, 32.0], [18.0, 32.0]])
    m1 = jnp.ones(2, bool)
    gt = np.asarray(
        gt_assignment_parallax(kp0, m0, kp1, m1, lid0, lid1, Hs, 3.0, (H, W))
    )
    assert gt[0, 0]  # visible far-layer correspondence kept
    assert not gt[1].any()  # occluded correspondence excluded
    assert gt.sum() == 1
