"""Shipped warp-invariant VPR encoder checkpoint quality gates.

`checkpoints/vpr_tiny.npz` is produced by
`python -m mlis_tpu.train.pretrain_vpr` (supervised NT-Xent over fresh
on-device procedural places under random homographies; TPU-measured
held-out recall@1 at save time: 0.83 over 32 unseen textures x 2 views).
The milestones here leave margin for CPU-vs-TPU numerics. The
reference's analogue capability is the frozen VPR encoder stack at
scripts/semantic_gating/place_recognition.py:220-272, which is never
domain-adapted; the in-env trained encoder is what makes the quality
benchmark's retrieval stage reliable (eval/quality.py).
"""

import os

import jax
import numpy as np
import pytest

CKPT = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "vpr_tiny.npz"
)

requires_checkpoint = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="shipped VPR checkpoint not present"
)


@requires_checkpoint
def test_shipped_encoder_meets_heldout_recall_milestone():
    from mlis_tpu.train.pretrain_vpr import (
        _build_model,
        _make_apply,
        _sample_batch,
        heldout_recall,
        load_encoder,
    )

    # random init: nearest-neighbour retrieval over warped views is chance
    model, params = _build_model(0)
    random_recall = heldout_recall(_make_apply(model), params)
    assert random_recall < 0.2

    # shipped checkpoint through the public uint8 entry point
    enc = load_encoder()
    assert enc is not None
    imgs, place = _sample_batch(
        jax.random.PRNGKey(77_000), 32, 2, (270, 360), 0.08, 0.08
    )
    d = np.asarray(enc((np.asarray(imgs) * 255).astype(np.uint8)))
    sims = d @ d.T
    np.fill_diagonal(sims, -np.inf)
    place = np.asarray(place)
    recall = float((place[np.argmax(sims, 1)] == place).mean())
    assert recall >= 0.6, recall
    assert recall - random_recall >= 0.4


@requires_checkpoint
def test_trained_encoder_lifts_scene_retrieval_recall():
    """On the 8-place quality scene the pixel encoder's retrieval recall
    caps at ~0.6-0.88 (warp drift in downsampled-pixel space); the
    trained encoder reaches 1.0 on every tested seed (TPU + CPU)."""
    from mlis_tpu.eval.quality import (
        _pixel_encoder,
        make_quality_scene,
        retrieval_recall,
    )
    from mlis_tpu.train.pretrain_vpr import load_encoder

    enc = load_encoder()
    scene = make_quality_scene(n_places=8, seed=1)  # pixel's worst seed
    rr_trained = retrieval_recall(scene, enc, top_k=8, threshold=0.45)
    rr_pixel = retrieval_recall(
        scene, _pixel_encoder, top_k=8, threshold=0.45
    )
    assert rr_trained >= 0.9, rr_trained
    assert rr_trained >= rr_pixel


def test_quality_mode_falls_back_to_pixel_without_checkpoint(monkeypatch):
    """encoder='trained_vpr' must degrade gracefully when the checkpoint
    is absent (fresh clone before training)."""
    import mlis_tpu.train.pretrain_vpr as pv

    monkeypatch.setattr(pv, "load_encoder", lambda *a, **k: None)
    from mlis_tpu.eval.quality import make_quality_scene, run_gate_quality

    scene = make_quality_scene(n_places=2, hw=(64, 96))
    out = run_gate_quality(
        "orb", encoder="trained_vpr", scene=scene, max_keypoints=128,
        verify_batch=8,
    )
    assert out["encoder"] == "pixel"
