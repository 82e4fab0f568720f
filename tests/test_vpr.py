"""VPR pipeline tests with tiny-config encoders (CPU-fast)."""

import numpy as np
import pytest

from mlis_tpu.gating.place_recognition import (
    BasePlaceRecognition,
    SemanticPlaceRecognition,
)
from mlis_tpu.models.anyloc import AnyLoc
from mlis_tpu.models.cricavpr import CricaVPR
from mlis_tpu.models.mixvpr import MixVPR
from mlis_tpu.models.resnet import ResNetConfig
from mlis_tpu.models.salad import SALAD
from mlis_tpu.models.vit import ViTConfig


TINY_VIT = ViTConfig.tiny_test()
TINY_RESNET = ResNetConfig.tiny_test()


def _images(rng, n, h=64, w=64):
    return (rng.uniform(0, 255, size=(n, h, w, 3))).astype(np.uint8)


@pytest.fixture(scope="module")
def tiny_crica():
    return CricaVPR(descriptor_dim=64, vit_cfg=TINY_VIT, input_size=(56, 56))


def test_mixvpr_tiny_descriptor(rng):
    enc = MixVPR(descriptor_dim=32, backbone_cfg=TINY_RESNET, input_size=(64, 64))
    d = enc.encode_batch(_images(rng, 3))
    assert d.shape == (3, 32)
    assert np.isfinite(d).all()


def test_salad_tiny_descriptor(rng):
    enc = SALAD(
        vit_cfg=TINY_VIT, input_size=(56, 56),
        num_clusters=4, cluster_dim=16, token_dim=32,
    )
    d = enc.encode_batch(_images(rng, 2, 60, 80))
    assert d.shape == (2, 4 * 16 + 32)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, rtol=1e-3)


def test_anyloc_tiny_vlad(rng):
    enc = AnyLoc(vit_cfg=TINY_VIT, num_clusters=4, input_size=(56, 56))
    d = enc.encode_batch(_images(rng, 2))
    assert d.shape == (2, 4 * 64)
    enc.fit_vocabulary(_images(rng, 2), iters=2)
    d2 = enc.encode_batch(_images(rng, 2))
    assert d2.shape == (2, 4 * 64)


def test_cricavpr_descriptor_and_patch_cache(rng, tiny_crica):
    d = tiny_crica.encode_batch(_images(rng, 3, 56, 56))
    assert d.shape == (3, 64)
    assert len(tiny_crica.patch_cache) >= 3
    assert tiny_crica.patch_cache[0].shape == (16, 64)  # 4x4 grid of dim 64


def test_cricavpr_rerank_prefers_identical_patches(rng, tiny_crica):
    from mlis_tpu.gating.place_recognition import PlaceMatch

    n0 = len(tiny_crica.patch_cache)
    imgs = _images(rng, 2, 56, 56)
    both = np.concatenate([imgs, imgs[:1]])  # image 0 duplicated at idx 2
    tiny_crica.encode_batch(both)
    matches = [
        PlaceMatch(query_idx=n0 + 0, match_idx=n0 + 1, similarity=0.9),
        PlaceMatch(query_idx=n0 + 0, match_idx=n0 + 2, similarity=0.9),
    ]
    rr = tiny_crica.rerank_candidates(n0 + 0, matches)
    # the duplicate (identical patches) must outrank the different image
    assert rr[0].match_idx == n0 + 2


def test_semantic_place_recognition_gating_demo(rng):
    """Mirrors the reference demo (place_recognition.py:994-1039): random
    descriptors on two floors; same-place pairs get near-identical
    descriptors; cross-floor lookalikes must be flagged invalid."""
    spr = SemanticPlaceRecognition(
        vpr_method=BasePlaceRecognition(descriptor_dim=64),
        similarity_threshold=0.5,
        min_time_gap=10.0,
    )
    rng_ = np.random.default_rng(0)
    base_a = rng_.normal(size=64)
    base_b = rng_.normal(size=64)

    # floor 5: two visits to place A separated in time (true loop closure)
    spr.vpr.add_descriptor(base_a + rng_.normal(scale=0.01, size=64), 0.0, 5)
    spr.vpr.add_descriptor(rng_.normal(size=64), 30.0, 5)
    spr.vpr.add_descriptor(base_a + rng_.normal(scale=0.01, size=64), 60.0, 5)
    # floor 2: perceptual alias of place A (cross-floor lookalike)
    spr.vpr.add_descriptor(base_a + rng_.normal(scale=0.01, size=64), 120.0, 2)
    spr.vpr.add_descriptor(base_b, 150.0, 2)

    matches = spr.find_loop_closures(enable_floor_gating=True, k=4)
    assert matches, "lookalikes above threshold expected"
    valid = [m for m in matches if m.is_valid]
    invalid = [m for m in matches if not m.is_valid]
    # true same-floor revisit survives
    assert any({m.query_idx, m.match_idx} == {0, 2} for m in valid)
    # cross-floor alias rejected
    assert any({m.query_idx, m.match_idx} == {0, 3} or {m.query_idx, m.match_idx} == {2, 3} for m in invalid)

    stats = spr.get_statistics(matches)
    assert stats["total_matches"] == len(matches)
    assert stats["rejected_matches"] == len(invalid)
    assert 0 < stats["rejection_rate"] < 1


def test_base_query_api(rng):
    db = BasePlaceRecognition(descriptor_dim=16)
    for i in range(12):
        db.add_descriptor(rng.normal(size=16), float(i * 20), floor_label=1)
    target = db.descriptors[3].descriptor

    class _Echo:
        def encode_batch(self, images):
            return target[None]

    db.encoder = _Echo()
    matches = db.query(np.zeros((4, 4, 3), np.uint8), timestamp=300.0, k=3)
    assert matches[0].match_idx == 3
    assert matches[0].similarity > 0.99


def test_find_loop_closures_with_crica_rerank(rng, tiny_crica):
    """CricaVPR path reranks top-k with patch correlations before gating."""
    tiny_crica.descriptors = []
    tiny_crica._matrix_cache = None
    tiny_crica.patch_cache = []
    spr = SemanticPlaceRecognition(
        vpr_method=tiny_crica, similarity_threshold=0.0, min_time_gap=10.0
    )
    imgs = _images(rng, 6, 56, 56)
    spr.add_images_batch(imgs, np.arange(6) * 30.0, [5, 5, 5, 2, 2, 2])
    matches = spr.find_loop_closures(enable_floor_gating=True, k=3, rerank=True)
    assert matches
    # rerank blends scores but validity flags still reflect floor labels
    for m in matches:
        fl = [5, 5, 5, 2, 2, 2]
        assert m.is_valid == (fl[m.query_idx] == fl[m.match_idx])


def test_find_loop_closures_descriptor_only_db_skips_rerank(rng, tiny_crica):
    """A CricaVPR DB populated from precomputed descriptors (no images =>
    no patch cache) must degrade to un-reranked retrieval, not crash on an
    empty patch stack."""
    tiny_crica.descriptors = []
    tiny_crica._matrix_cache = None
    tiny_crica.patch_cache = []
    tiny_crica._patch_matrix = None
    spr = SemanticPlaceRecognition(
        vpr_method=tiny_crica, similarity_threshold=0.0, min_time_gap=10.0
    )
    descs = rng.standard_normal((6, 64)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)
    for i in range(6):
        tiny_crica.add_descriptor(descs[i], i * 30.0, [5, 5, 5, 2, 2, 2][i])
    matches = spr.find_loop_closures(enable_floor_gating=True, k=3, rerank=True)
    assert matches  # plain cosine retrieval still works
    for m in matches:
        fl = [5, 5, 5, 2, 2, 2]
        assert m.is_valid == (fl[m.query_idx] == fl[m.match_idx])


def test_rerank_scores_all_matches_per_query_path(rng):
    """The one-dispatch across-queries rerank must score identically to the
    per-query rerank_candidates path (same math, different batching)."""
    from mlis_tpu.gating.place_recognition import PlaceMatch

    enc = CricaVPR(descriptor_dim=64, vit_cfg=TINY_VIT, input_size=(56, 56))
    imgs = _images(rng, 8, 56, 56)
    enc.encode_batch(imgs)

    q_idx = np.arange(8, dtype=np.int32)
    c_idx = np.stack([(np.arange(3) + i + 1) % 8 for i in range(8)]).astype(
        np.int32
    )
    cc_all = enc.rerank_scores_all(q_idx, c_idx, batch_size=4)
    assert cc_all.shape == (8, 3)

    w = enc.rerank_weight
    for i in range(8):
        matches = [
            PlaceMatch(query_idx=i, match_idx=int(j), similarity=0.0)
            for j in c_idx[i]
        ]
        rr = enc.rerank_candidates(i, matches)
        per_query = {m.match_idx: m.similarity for m in rr}
        for kk, j in enumerate(c_idx[i]):
            np.testing.assert_allclose(
                per_query[int(j)], w * cc_all[i, kk], rtol=1e-5, atol=1e-6
            )


def test_find_loop_closures_batched_rerank_equals_serial(rng):
    """find_loop_closures with the batched rerank must produce the same
    (query, match, similarity) set as manually reranking each query."""
    enc = CricaVPR(descriptor_dim=64, vit_cfg=TINY_VIT, input_size=(56, 56))
    spr = SemanticPlaceRecognition(
        vpr_method=enc, similarity_threshold=0.0, min_time_gap=10.0
    )
    imgs = _images(rng, 6, 56, 56)
    spr.add_images_batch(imgs, np.arange(6) * 30.0, [5, 5, 5, 2, 2, 2])

    got = spr.find_loop_closures(enable_floor_gating=True, k=3, rerank=True)

    # serial reference: raw retrieval + per-query rerank_candidates
    from mlis_tpu.gating.place_recognition import PlaceMatch
    import jax.numpy as jnp
    from mlis_tpu.ops.knn import cosine_topk

    db = jnp.asarray(enc.build_descriptor_matrix())
    times = jnp.asarray(enc.timestamps())
    scores, idx = cosine_topk(db, db, times, times, k=3, min_time_gap=10.0)
    scores, idx = np.asarray(scores), np.asarray(idx)
    want = {}
    for i in range(6):
        cand = [
            PlaceMatch(query_idx=i, match_idx=int(j), similarity=float(s))
            for s, j in zip(scores[i], idx[i])
            if np.isfinite(s)
        ]
        for m in enc.rerank_candidates(i, cand):
            want[(m.query_idx, m.match_idx)] = m.similarity
    got_map = {(m.query_idx, m.match_idx): m.similarity for m in got}
    assert set(got_map) == set(want)
    for key in want:
        np.testing.assert_allclose(got_map[key], want[key], rtol=1e-5, atol=1e-6)


def test_descriptor_database_roundtrip(tmp_path, rng):
    db = BasePlaceRecognition(descriptor_dim=16)
    for i in range(10):
        db.add_descriptor(
            rng.normal(size=16), float(i * 20),
            floor_label=5 if i < 5 else None,
            image_path=f"kf_{i}.png" if i % 2 else None,
        )
    db.save_database(tmp_path / "db.npz")

    db2 = BasePlaceRecognition(descriptor_dim=16)
    n = db2.load_database(tmp_path / "db.npz")
    assert n == 10
    np.testing.assert_allclose(
        db2.build_descriptor_matrix(), db.build_descriptor_matrix(), atol=1e-6
    )
    assert db2.descriptors[0].floor_label == 5
    assert db2.descriptors[9].floor_label is None
    assert db2.descriptors[1].image_path == "kf_1.png"
    assert db2.descriptors[0].image_path is None
