"""Cross-family matcher plumbing: the dense (LoFTR) batched verify path
and the SuperGlue (sinkhorn) homography-pretraining arch switch."""

import jax
import numpy as np

from mlis_tpu.gating.verification import GeometricVerifier
from mlis_tpu.models.loftr import LoFTR, LoFTRConfig
from mlis_tpu.train.matcher_trainer import synthetic_textures


def test_verify_pairs_batch_dense_matcher():
    # verify_pairs_batch must route DenseMatches (detector-free) through
    # the batched RANSAC — not the (kp0, kp1, matches) unpack
    lf = LoFTR(LoFTRConfig.tiny_test())
    v = GeometricVerifier(matcher=lf, min_inliers=5, min_inlier_ratio=0.1)
    imgs = np.asarray(synthetic_textures(jax.random.PRNGKey(0), 2, 64, 96))
    im0 = imgs[:, :, :, None].astype(np.float32)
    im1 = np.roll(im0, 3, axis=2)  # small translation: matchable content
    K = np.array([[100.0, 0, 48.0], [0, 100.0, 32.0], [0, 0, 1.0]])
    res = v.verify_pairs_batch(im0, im1, K, indices=[(0, 1), (2, 3)])
    assert len(res) == 2
    assert res[0].query_idx == 0 and res[0].match_idx == 1
    for r in res:
        assert r.num_inliers >= 0
        assert 0.0 <= r.inlier_ratio <= 1.0
        # detector-free: keypoint totals == matched count
        assert r.num_keypoints_query == r.num_matches


def test_verify_pairs_batch_dense_matches_single_pair_path():
    # the DenseMatches branch must agree with the single-pair verify()
    # on the matched-point counts for the same image pair
    lf = LoFTR(LoFTRConfig.tiny_test())
    v = GeometricVerifier(matcher=lf, min_inliers=5, min_inlier_ratio=0.1)
    img = np.asarray(
        synthetic_textures(jax.random.PRNGKey(1), 1, 64, 96)
    )[0]
    u8 = (img * 255).astype(np.uint8)
    single = v.verify(u8, u8)
    batched = v.verify_pairs_batch(
        img[None, :, :, None].astype(np.float32),
        img[None, :, :, None].astype(np.float32),
        K=np.array([[100.0, 0, 48.0], [0, 100.0, 32.0], [0, 0, 1.0]]),
    )[0]
    assert single.num_matches == batched.num_matches


def test_pretrain_matcher_superglue_arch(tmp_path):
    from mlis_tpu.train.pretrain_matcher import main

    out = str(tmp_path / "sg.npz")
    hist = main([
        "--tiny", "--arch", "superglue", "--steps", "8", "--chunk", "4",
        "--batch", "2", "--eval-every", "8", "--save-every", "100",
        "--eval-batch", "2", "--out", out,
    ])
    assert len(hist["loss"]) == 2
    # the checkpoint must load into a fresh SuperGlue (sinkhorn head keys)
    import os

    from mlis_tpu.models.lightglue import MatcherConfig, SuperGlue
    from mlis_tpu.models.superpoint import SuperPointConfig

    assert os.path.exists(out)
    sg = SuperGlue(
        sp_cfg=SuperPointConfig.tiny_test(max_keypoints=48),
        matcher_cfg=MatcherConfig.tiny_test(assignment="sinkhorn"),
    )
    sg.load_weights(out, image_hw=(64, 96))
    flat = jax.tree_util.tree_leaves(sg.params)
    assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in flat)


def test_quality_bench_loftr_matcher():
    # the quality bench's third matcher family: detector-free LoFTR runs
    # the full gate end-to-end through the dense-matcher verify dispatch
    # (random init here — decision quality is not asserted, wiring is)
    from mlis_tpu.eval.quality import make_quality_scene, run_gate_quality

    scene = make_quality_scene(n_places=2, hw=(64, 96))
    out = run_gate_quality("loftr", scene=scene, weights_path="/nonexistent")
    assert out["matcher"] == "loftr"
    assert out["weights"] == "random_init"
    assert out["total_candidates"] > 0
    # the floor gate still rejects every aliased trap regardless of weights
    assert out["gating_effectiveness"] == 1.0
    assert 0.0 <= out["f1"] <= 1.0
