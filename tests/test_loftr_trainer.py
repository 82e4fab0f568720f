"""LoFTR homography self-supervision (train/loftr_trainer.py).

Mirrors the reference's matcher capability slot: kornia's pretrained
LoFTR (geometric_verification.py:469-526) — trained in-env here.
"""

import jax
import numpy as np
import pytest

from mlis_tpu.models.loftr import LoFTR, LoFTRConfig
from mlis_tpu.train.loftr_trainer import (
    LoFTRTrainer,
    coarse_gt_cells,
    coarse_gt_cells_parallax,
)
from mlis_tpu.train.matcher_trainer import synthetic_textures


def test_coarse_gt_identity_homography():
    # identity homography: every in-bounds cell maps to itself
    import jax.numpy as jnp

    hc, wc = 6, 8
    idx1, valid, proj = coarse_gt_cells(jnp.eye(3), hc, wc, (48, 64))
    assert bool(valid.all())
    np.testing.assert_array_equal(np.asarray(idx1), np.arange(hc * wc))
    centers = np.stack(
        [
            (np.arange(hc * wc) % wc) * 8.0 + 3.5,
            (np.arange(hc * wc) // wc) * 8.0 + 3.5,
        ],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(proj), centers, atol=1e-5)


def test_coarse_gt_translation():
    import jax.numpy as jnp

    # shift +16 px in x = +2 coarse cells; rightmost 2 columns fall out
    Hm = jnp.asarray([[1.0, 0, 16.0], [0, 1.0, 0], [0, 0, 1.0]])
    hc, wc = 4, 6
    idx1, valid, _ = coarse_gt_cells(Hm, hc, wc, (32, 48))
    v = np.asarray(valid).reshape(hc, wc)
    assert v[:, : wc - 2].all() and not v[:, wc - 2 :].any()
    tgt = np.asarray(idx1).reshape(hc, wc)
    for y in range(hc):
        for x in range(wc - 2):
            assert tgt[y, x] == y * wc + x + 2


def test_coarse_gt_parallax_occlusion_aware():
    """Dense analogue of the matcher trainer's occlusion test: far-layer
    cells project through the FAR plane's homography and are excluded
    where the near layer covers the projection in view 1."""
    import jax.numpy as jnp

    H, W = 32, 64
    hc, wc = H // 8, W // 8
    lid0 = jnp.ones((H, W), jnp.int32)  # view 0 is all far layer (1)
    # near layer (0) covers the left half of view 1 only
    lid1 = jnp.where(
        jnp.arange(W)[None, :] < W // 2, 0, 1
    ) * jnp.ones((H, 1), jnp.int32)
    H_far = jnp.asarray([[1.0, 0, 8.0], [0, 1, 0], [0, 0, 1]])
    H_near = jnp.asarray([[1.0, 0, 20.0], [0, 1, 0], [0, 0, 1]])
    Hs = jnp.stack([H_near, H_far])

    idx1, valid, proj = coarse_gt_cells_parallax(
        lid0, lid1, Hs, hc, wc, (H, W)
    )
    v = np.asarray(valid).reshape(hc, wc)
    tgt = np.asarray(idx1).reshape(hc, wc)
    # columns: center x = 8c + 3.5, projected x = 8c + 11.5 -> target
    # cell c+1. Supervisable iff the projection is in-bounds
    # (8c + 11.5 <= 63, excluding c=7 which lands at 67.5) AND the far
    # layer is on top there (right half: 8c + 11.5 >= W/2 -> c >= 3).
    for c in range(wc):
        expect = W // 2 <= (8 * c + 11.5) <= W - 1
        assert v[:, c].all() == expect, (c, v[:, c])
        if expect:
            assert (tgt[:, c] == np.arange(hc) * wc + c + 1).all()
    # sanity: projections follow the FAR homography everywhere
    px = np.asarray(proj)[:, 0].reshape(hc, wc)
    np.testing.assert_allclose(
        px, (np.arange(wc) * 8.0 + 11.5)[None].repeat(hc, 0), atol=1e-5
    )


def test_parallax_training_step_runs():
    """pair_mode='parallax' trains end-to-end on layered pairs and the
    held-out metrics route to parallax_match_metrics."""
    lf = LoFTR(LoFTRConfig.tiny_test())
    trainer = LoFTRTrainer(lf, (64, 96), learning_rate=3e-4, seed=0,
                           pair_mode="parallax")
    losses = trainer.train_chunk(4, batch_size=2)
    assert np.isfinite(losses).all()
    m = trainer.parallax_match_metrics(n_pairs=2)
    assert 0.0 <= m["recall"] <= 1.0 and m["n_gt"] > 0


def test_loftr_training_improves_recall():
    lf = LoFTR(LoFTRConfig.tiny_test())
    trainer = LoFTRTrainer(lf, (64, 96), learning_rate=3e-4, seed=0)
    eval_imgs = np.asarray(
        synthetic_textures(jax.random.PRNGKey(123), 2, 64, 96)
    )
    m0 = trainer.match_metrics(eval_imgs)
    losses = trainer.train_chunk(24, batch_size=2)
    m1 = trainer.match_metrics(eval_imgs)
    assert losses[-4:].mean() < 0.8 * losses[:4].mean()
    assert m1["recall"] >= m0["recall"]
    assert m1["recall"] > 0.02  # tiny model already finds real matches


def test_loftr_checkpoint_roundtrip(tmp_path):
    lf = LoFTR(LoFTRConfig.tiny_test())
    trainer = LoFTRTrainer(lf, (64, 96), seed=1)
    trainer.train_chunk(2, batch_size=2)
    path = str(tmp_path / "loftr.npz")
    trainer.save_checkpoint(path)

    fresh = LoFTR(LoFTRConfig.tiny_test(), seed=7)
    fresh.load_weights(path, image_hw=(64, 96))
    a = jax.tree_util.tree_leaves(lf.params)
    b = jax.tree_util.tree_leaves(fresh.params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32), atol=2e-3
        )
