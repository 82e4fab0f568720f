"""SuperPoint self-supervised training (train/superpoint_trainer.py):
on-device shape rendering with exact corner GT, the 65-way detector
labels, the dense descriptor hinge, and a short joint training run.
"""

import jax
import numpy as np
import pytest

from mlis_tpu.models.superpoint import SuperPoint, SuperPointConfig
from mlis_tpu.train.superpoint_trainer import (
    SuperPointTrainer,
    corner_cell_labels,
    descriptor_loss,
    detector_loss,
    render_shapes,
)


def test_render_shapes_produces_corner_ground_truth():
    imgs, corners, valid = render_shapes(jax.random.PRNGKey(0), 3, 64, 96)
    assert imgs.shape == (3, 64, 96)
    assert 0.0 <= float(imgs.min()) and float(imgs.max()) <= 1.0
    corners = np.asarray(corners)
    assert corners.shape[0] == 3 and corners.shape[2] == 2
    assert np.asarray(valid).all()
    # corners lie inside the image bounds
    assert (corners[..., 0] >= 0).all() and (corners[..., 0] <= 95).all()
    assert (corners[..., 1] >= 0).all() and (corners[..., 1] <= 63).all()
    # shapes actually painted: foreground pixels well above background
    assert float(np.asarray(imgs).max()) > 0.34


def test_corner_cell_labels_place_corners_in_their_cells():
    corners = np.asarray([[[10.0, 12.0], [70.0, 40.0]]])  # xy
    valid = np.ones((1, 2), bool)
    labels = np.asarray(corner_cell_labels(corners, valid, 64, 96))
    assert labels.shape == (1, 8, 12)
    # (10, 12) -> cell (row 1, col 1), in-cell (y=4, x=2) -> 34
    assert labels[0, 1, 1] == (12 % 8) * 8 + (10 % 8)
    # (70, 40) -> cell (row 5, col 8)
    assert labels[0, 5, 8] == (40 % 8) * 8 + (70 % 8)
    # everything else is dustbin
    assert (labels == 64).sum() == 8 * 12 - 2


def test_detector_loss_prefers_correct_cells():
    labels = np.full((1, 4, 4), 64, np.int32)
    labels[0, 1, 2] = 10
    good = np.zeros((1, 4, 4, 65), np.float32)
    good[..., 64] = 5.0  # confident dustbin everywhere
    good[0, 1, 2, :] = 0.0
    good[0, 1, 2, 10] = 5.0  # confident correct corner bin
    bad = np.zeros((1, 4, 4, 65), np.float32)  # uniform
    l_good = float(detector_loss(jax.numpy.asarray(good), jax.numpy.asarray(labels)))
    l_bad = float(detector_loss(jax.numpy.asarray(bad), jax.numpy.asarray(labels)))
    assert l_good < l_bad


def test_descriptor_loss_identity_alignment():
    """Under the identity homography, matching descriptors (same map) give
    a lower loss than mismatched random maps."""
    rng = np.random.default_rng(0)
    d = rng.normal(size=(1, 4, 6, 16)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d2 = rng.normal(size=(1, 4, 6, 16)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    Hm = np.eye(3, dtype=np.float32)[None]
    l_aligned = float(
        descriptor_loss(
            jax.numpy.asarray(d), jax.numpy.asarray(d), jax.numpy.asarray(Hm), 32, 48
        )
    )
    l_mismatch = float(
        descriptor_loss(
            jax.numpy.asarray(d), jax.numpy.asarray(d2), jax.numpy.asarray(Hm), 32, 48
        )
    )
    assert l_aligned < l_mismatch


def test_superpoint_training_reduces_losses():
    sp = SuperPoint(SuperPointConfig.tiny_test(max_keypoints=64))
    trainer = SuperPointTrainer(sp, (64, 96), learning_rate=1e-3)
    trace = trainer.train_chunk(40, batch_size=4)
    assert trace.shape == (40, 3)
    assert np.isfinite(trace).all()
    # joint loss drops materially over the chunk
    assert trace[-5:, 0].mean() < trace[:5, 0].mean() * 0.9
    m = trainer.corner_metrics(n=4)
    assert 0.0 <= m["corner_recall"] <= 1.0
    assert m["n_gt"] > 0
