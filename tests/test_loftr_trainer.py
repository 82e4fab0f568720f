"""LoFTR homography self-supervision (train/loftr_trainer.py).

Mirrors the reference's matcher capability slot: kornia's pretrained
LoFTR (geometric_verification.py:469-526) — trained in-env here.
"""

import jax
import numpy as np
import pytest

from mlis_tpu.models.loftr import LoFTR, LoFTRConfig
from mlis_tpu.train.loftr_trainer import LoFTRTrainer, coarse_gt_cells
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
