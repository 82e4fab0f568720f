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


CKPT_V2 = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "vpr_tiny_v2.npz"
)


@pytest.mark.skipif(
    not os.path.exists(CKPT_V2), reason="parallax VPR checkpoint not present"
)
def test_parallax_encoder_meets_milestones():
    """checkpoints/vpr_tiny_v2.npz (pretrain_vpr --parallax): trained on
    layered-scene SE(3) views — the v2 GT scene's corruption family.
    Chip-measured at save time: heldout parallax recall@1 0.64; v2-scene
    retrieval recall 0.82 at top-16/thr-0.30 vs 0.61 for the
    homography-trained v1 encoder and 0.55 for the pixel encoder.
    Milestones leave margin for CPU numerics."""
    from mlis_tpu.eval.quality import (
        make_quality_scene_v2,
        retrieval_metrics,
        _pixel_encoder,
    )
    from mlis_tpu.train.pretrain_vpr import heldout_recall, load_encoder
    from mlis_tpu.models.convert import _match_dtypes
    from mlis_tpu.models.weights import load_params_npz
    from mlis_tpu.train.pretrain_vpr import _build_model, _make_apply

    # held-out parallax recall through the training-eval path
    model, params = _build_model(0)
    params = _match_dtypes(load_params_npz(CKPT_V2)["vpr"], params)
    r = heldout_recall(
        _make_apply(model), params, hw=(136, 180), parallax=True
    )
    assert r >= 0.45, r

    # the deliverable: v2-scene retrieval recall beats the pixel encoder
    # by a wide margin (a smaller scene keeps the CPU tier fast; the
    # full-scene numbers are in BENCH_NOTES round 4)
    enc = load_encoder(CKPT_V2)
    scene = make_quality_scene_v2(
        n_floors=2, n_places=12, hw=(136, 180), seed=3
    )
    rr = retrieval_metrics(scene, enc, top_k=8, threshold=0.3)
    rr_pix = retrieval_metrics(scene, _pixel_encoder, top_k=8, threshold=0.3)
    assert rr["retrieval_recall"] >= rr_pix["retrieval_recall"] + 0.1, (
        rr, rr_pix,
    )


CKPT_MIX = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "vpr_mixvpr.npz"
)


@pytest.mark.skipif(
    not os.path.exists(CKPT_MIX), reason="MixVPR checkpoint not present"
)
def test_full_size_mixvpr_meets_milestones():
    """checkpoints/vpr_mixvpr.npz: the FULL-architecture MixVPR
    (ResNet-50 crop-stage-3 + 4-layer mixer, 4096-d, 320x320 input —
    the reference's default VPR method) trained in-env with the
    parallax NT-Xent recipe. Chip-measured at save time: held-out
    parallax recall@1 0.844 (tiny-v2 encoder: 0.64; chance 0.016).
    CPU margins below."""
    from mlis_tpu.eval.quality import (
        make_quality_scene_v2,
        retrieval_metrics,
        _pixel_encoder,
    )
    from mlis_tpu.train.pretrain_vpr import load_mixvpr_vpr

    mv = load_mixvpr_vpr()
    assert mv is not None
    enc = mv.encode_batch_device
    scene = make_quality_scene_v2(
        n_floors=2, n_places=12, hw=(136, 180), seed=3
    )
    rr = retrieval_metrics(scene, enc, top_k=8, threshold=0.3)
    rr_pix = retrieval_metrics(scene, _pixel_encoder, top_k=8, threshold=0.3)
    assert rr["retrieval_recall"] >= 0.6, rr
    assert rr["retrieval_recall"] >= rr_pix["retrieval_recall"] + 0.1, (
        rr, rr_pix,
    )


CKPT_SALAD = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "vpr_salad.npz"
)
CKPT_ANYLOC = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "vpr_anyloc.npz"
)


@pytest.mark.smoke
def test_salad_and_anyloc_arch_plumbing():
    """The two remaining reference VPR encoders (place_recognition.py
    :335-410 SALAD, :413-505 AnyLoc) train/fit through pretrain_vpr:
    the SALAD arch builds + forwards at the trainer's input contract,
    and the AnyLoc VLAD apply fn produces normalized descriptors."""
    import jax.numpy as jnp

    from mlis_tpu.train.pretrain_vpr import (
        ENC_HW,
        _anyloc_apply,
        _build_model,
        _make_apply,
    )

    model, params = _build_model(0, arch="salad")
    apply_fn = _make_apply(model, ENC_HW, pooling="module")
    x = jnp.linspace(0, 1, 2 * 96 * 128).reshape(2, 96, 128)
    d = apply_fn(params, x)
    assert d.shape == (2, 16 * 32 + 64)
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-3)

    tmodel, tparams = _build_model(0, arch="tiny")
    centers = np.random.RandomState(0).randn(8, 64).astype(np.float32)
    a = _anyloc_apply(tmodel, jnp.asarray(centers))
    d2 = a(tparams, x)
    assert d2.shape == (2, 8 * 64)
    assert np.allclose(np.linalg.norm(np.asarray(d2), axis=1), 1.0, atol=1e-3)


CKPT_V2_path = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "vpr_tiny_v2.npz"
)


@pytest.mark.skipif(
    not os.path.exists(CKPT_V2_path),
    reason="parallax VPR checkpoint not present",
)
def test_crica_tiny_rerank_runs_on_trained_features():
    """load_crica_tiny_vpr: the CricaVPR patch-correlation rerank
    (reference place_recognition.py:669-757) over the parallax-trained
    tiny backbone. Its GLOBAL descriptors must match the plain trained
    encoder (same GeM path), so the rerank A/B isolates the rerank."""
    from mlis_tpu.train.pretrain_vpr import load_crica_tiny_vpr, load_encoder

    v = load_crica_tiny_vpr()
    assert v is not None
    imgs = np.random.RandomState(0).randint(
        0, 255, (6, 135, 180), np.uint8
    )
    d = np.asarray(v.encode_batch_device(imgs))
    assert d.shape == (6, 64) and len(v.patch_cache) == 6
    e = load_encoder(os.path.abspath(CKPT_V2_path))
    d2 = np.asarray(e(imgs))
    assert np.abs(d - d2).max() < 5e-3
    cc = v.rerank_scores_all(np.arange(6), np.tile(np.arange(6), (6, 1)))
    assert cc.shape == (6, 6) and np.isfinite(cc).all()


@pytest.mark.skipif(
    not os.path.exists(CKPT_SALAD),
    reason="trained SALAD checkpoint not present",
)
def test_salad_checkpoint_meets_milestone():
    """The shipped in-env-trained SALAD encoder (pretrain_vpr --arch
    salad --parallax, round 5): held-out parallax recall@1 well above
    the 1/64 chance floor, and the checkpoint loads through the same
    load_encoder path quality2's rr_salad row uses."""
    import json

    log = json.load(open(CKPT_SALAD.replace(".npz", "_log.json")))
    assert log["best_recall_at_1"] >= 0.25  # measured 0.344; chance 0.016
    assert log["config"]["parallax"] is True

    from mlis_tpu.train.pretrain_vpr import load_encoder

    enc = load_encoder(arch="salad")
    assert enc is not None
    imgs = np.random.RandomState(1).randint(
        0, 255, (4, 135, 180), np.uint8
    ).astype(np.float32) / 255.0
    d = np.asarray(enc(imgs))
    assert d.shape == (4, 16 * 32 + 64)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-3)
