"""Full gate pipeline tests (tiny configs, CPU)."""

import numpy as np
import pytest

from mlis_tpu.gating.full_gate import FullGatePipeline
from mlis_tpu.gating.place_recognition import (
    BasePlaceRecognition,
    SemanticPlaceRecognition,
)
from mlis_tpu.gating.verification import GeometricVerifier
from mlis_tpu.models.lightglue import LightGlue, MatcherConfig
from mlis_tpu.models.superpoint import SuperPointConfig

K_CAM = np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1.0]])


class _PatchEncoder:
    """Deterministic cheap encoder: downsampled grayscale as descriptor."""

    def encode_batch(self, images):
        x = images.astype(np.float32)
        if x.ndim == 4:  # color -> gray
            x = x.mean(-1)
        B = x.shape[0]
        d = x[:, ::12, ::12].reshape(B, -1)
        return d / (np.linalg.norm(d, axis=1, keepdims=True) + 1e-8)


def _scene_images(rng, n):
    bases = [
        np.kron(
            rng.integers(0, 255, (15, 20, 3), dtype=np.uint8),
            np.ones((8, 8, 1), np.uint8),
        )[:120, :160]
        for _ in range(4)
    ]
    return np.stack([bases[i % 4] for i in range(n)])


@pytest.fixture
def pipeline():
    vpr_db = BasePlaceRecognition(descriptor_dim=110, encoder=_PatchEncoder())
    spr = SemanticPlaceRecognition(
        vpr_method=vpr_db, similarity_threshold=0.9, min_time_gap=10.0
    )
    lg = LightGlue(
        sp_cfg=SuperPointConfig.tiny_test(max_keypoints=64),
        matcher_cfg=MatcherConfig.tiny_test(),
    )
    return FullGatePipeline(
        vpr=spr,
        verifier=GeometricVerifier(matcher=lg),
        similarity_threshold=0.9,
        verify_batch=8,
    )


def test_full_gate_end_to_end(rng, pipeline):
    n = 16
    images = _scene_images(rng, n)
    times = np.arange(n) * 30.0
    floors = np.asarray([5] * 8 + [2] * 8)
    res = pipeline.process(images, times, floors, K_CAM)

    assert res.total_pairs > 0
    # identical scenes repeat across the two floors -> cross-floor aliases
    assert res.cross_floor_rejected > 0
    assert res.verified == res.total_pairs - res.cross_floor_rejected
    assert res.verified == len(res.results)
    assert res.elapsed_s > 0
    s = res.summary()
    assert 0 < s["rejection_rate"] < 1
    assert set(s["stage_seconds"]) == {"vpr", "retrieval", "verification"}
    # every verified pair is same-floor by construction
    for r in res.results:
        assert floors[r.query_idx] == floors[r.match_idx]


def test_full_gate_no_verify_mode(rng, pipeline):
    n = 12
    images = _scene_images(rng, n)
    res = pipeline.process(
        images, np.arange(n) * 30.0, np.asarray([5] * n), K_CAM, verify=False
    )
    assert res.verified == 0
    assert res.cross_floor_rejected == 0  # single floor


def test_full_gate_empty_when_threshold_high(rng):
    vpr_db = BasePlaceRecognition(descriptor_dim=110, encoder=_PatchEncoder())
    spr = SemanticPlaceRecognition(vpr_method=vpr_db, similarity_threshold=1.1)
    pipe = FullGatePipeline(
        vpr=spr,
        verifier=GeometricVerifier(
            matcher=LightGlue(
                sp_cfg=SuperPointConfig.tiny_test(max_keypoints=32),
                matcher_cfg=MatcherConfig.tiny_test(),
            )
        ),
        similarity_threshold=1.1,
    )
    images = _scene_images(rng, 8)
    res = pipe.process(images, np.arange(8) * 30.0, np.ones(8, int), K_CAM)
    assert res.total_pairs == 0
    assert res.pairs_per_sec == 0.0


def test_full_gate_mono_matches_replicated_rgb(rng, pipeline):
    """Mono8 keyframes (NUFR's FLIR array encoding, reference
    extract_to_euroc.py:102) run the same gate as gray-replicated RGB:
    BT.601 weights sum to 1 on replicated channels, so keypoints,
    retrieval, and verification decisions are identical."""
    n = 16
    mono = _scene_images(rng, n)[..., 0]  # (N, H, W) uint8
    rgb = np.repeat(mono[..., None], 3, axis=-1)
    times = np.arange(n) * 30.0
    floors = np.asarray([5] * 8 + [2] * 8)

    res_m = pipeline.process(mono, times, floors, K_CAM)
    pipeline.spr.vpr.descriptors = []
    pipeline.spr.vpr._matrix_cache = None
    res_c = pipeline.process(rgb, times, floors, K_CAM)

    assert res_m.total_pairs == res_c.total_pairs > 0
    assert res_m.cross_floor_rejected == res_c.cross_floor_rejected
    assert res_m.verified == res_c.verified
    valid_m = [(r.query_idx, r.match_idx) for r in res_m.results if r.is_valid]
    valid_c = [(r.query_idx, r.match_idx) for r in res_c.results if r.is_valid]
    assert valid_m == valid_c


def test_preprocess_imagenet_mono_replication():
    """On-device GRAY->RGB replication mirrors the reference's
    cv2.COLOR_GRAY2RGB (place_recognition.py:316-322)."""
    from mlis_tpu.ops.image import preprocess_imagenet

    rng = np.random.default_rng(3)
    mono = rng.integers(0, 255, (2, 40, 50), dtype=np.uint8)
    rgb = np.repeat(mono[..., None], 3, axis=-1)
    out_m = np.asarray(preprocess_imagenet(mono, (24, 24)))
    out_m1 = np.asarray(preprocess_imagenet(mono[..., None], (24, 24)))
    out_c = np.asarray(preprocess_imagenet(rgb, (24, 24)))
    assert out_m.shape == (2, 24, 24, 3)
    np.testing.assert_allclose(out_m, out_c, atol=1e-6)
    np.testing.assert_allclose(out_m, out_m1, atol=1e-6)


class _DeviceEncoder(_PatchEncoder):
    """Patch encoder exposing the device-resident entry point, so the
    fused (survivor_budget) gate path activates."""

    def encode_batch_device(self, images):
        import jax.numpy as jnp

        return jnp.asarray(self.encode_batch(np.asarray(images)))


class _DeviceVPR(BasePlaceRecognition):
    def __init__(self):
        super().__init__(descriptor_dim=110, encoder=_DeviceEncoder())

    def encode_batch_device(self, images):
        return self.encoder.encode_batch_device(images)


def _device_pipeline():
    spr = SemanticPlaceRecognition(
        vpr_method=_DeviceVPR(), similarity_threshold=0.9, min_time_gap=10.0
    )
    lg = LightGlue(
        sp_cfg=SuperPointConfig.tiny_test(max_keypoints=64),
        matcher_cfg=MatcherConfig.tiny_test(),
    )
    return FullGatePipeline(
        vpr=spr,
        verifier=GeometricVerifier(matcher=lg),
        similarity_threshold=0.9,
        verify_batch=8,
    )


def test_full_gate_fused_budget_matches_two_phase(rng):
    """The device-compacted (survivor_budget) path must produce the same
    stats and per-pair decisions as the exact two-phase path, and fall
    back exactly when the budget overflows."""
    n = 16
    images = _scene_images(rng, n)
    times = np.arange(n) * 30.0
    floors = np.asarray([5] * 8 + [2] * 8)
    K = K_CAM

    pipe = _device_pipeline()
    ref = pipe.process(images, times, floors, K)
    assert ref.total_pairs > 0 and ref.verified > 0

    fused = pipe.process(images, times, floors, K, survivor_budget=64)
    assert fused.total_pairs == ref.total_pairs
    assert fused.cross_floor_rejected == ref.cross_floor_rejected
    assert fused.verified == ref.verified
    for a, b in zip(fused.results, ref.results):
        assert (a.query_idx, a.match_idx) == (b.query_idx, b.match_idx)
        assert a.num_matches == b.num_matches
        assert a.is_valid == b.is_valid

    # overflow: budget below the survivor count must rerun the exact path
    tiny = pipe.process(images, times, floors, K, survivor_budget=1)
    assert tiny.total_pairs == ref.total_pairs
    assert tiny.verified == ref.verified

    # zero survivors under a budget: clean empty result, no fallback loop
    pipe.similarity_threshold = 2.0  # nothing passes
    empty = pipe.process(images, times, floors, K, survivor_budget=64)
    assert empty.total_pairs == 0
    assert empty.verified == 0 and empty.results == []
    pipe.similarity_threshold = 0.9


def test_full_gate_from_config():
    from mlis_tpu.config import PipelineConfig

    cfg = PipelineConfig()
    cfg.vpr.method = "mixvpr"
    cfg.vpr.top_k = 7
    cfg.verification.max_keypoints = 128
    cfg.gating.gate.strict_mode = False
    pipe = FullGatePipeline.from_config(cfg)
    assert pipe.top_k == 7
    assert pipe.strict_floor is False
    assert pipe.verifier.matcher.sp.cfg.max_keypoints == 128
    assert type(pipe.spr.vpr).__name__ == "MixVPR"


def test_full_gate_match_top_k_prunes_but_preserves_pairs(rng):
    """Keypoint pruning (detect K, match top-M by score) keeps the
    survivor pair set identical (retrieval/gating are keypoint-free) and
    every matcher-stage count is bounded by the pruned budget. Also
    covers device-resident keyframe input (compute-only bench path)."""
    import jax

    n = 12
    images = _scene_images(rng, n)
    times = np.arange(n) * 30.0
    floors = np.asarray([5] * 6 + [2] * 6)

    def build(match_top_k):
        vpr_db = BasePlaceRecognition(descriptor_dim=110, encoder=_PatchEncoder())
        spr = SemanticPlaceRecognition(
            vpr_method=vpr_db, similarity_threshold=0.9, min_time_gap=10.0
        )
        lg = LightGlue(
            sp_cfg=SuperPointConfig.tiny_test(max_keypoints=64),
            matcher_cfg=MatcherConfig.tiny_test(),
        )
        return FullGatePipeline(
            vpr=spr,
            verifier=GeometricVerifier(matcher=lg),
            similarity_threshold=0.9,
            verify_batch=8,
            match_top_k=match_top_k,
        )

    full = build(None).process(images, times, floors, K_CAM)
    pruned_pipe = build(32)
    pruned = pruned_pipe.process(
        jax.device_put(images), times, floors, K_CAM
    )

    assert {(r.query_idx, r.match_idx) for r in full.results} == {
        (r.query_idx, r.match_idx) for r in pruned.results
    }
    assert pruned.total_pairs == full.total_pairs
    for r in pruned.results:
        assert r.num_keypoints_query <= 32
        assert r.num_keypoints_match <= 32
        assert r.num_matches <= 32


def test_full_gate_monolithic_matches_two_phase(rng):
    """The single-dispatch mega program (detect+encode+gate+verify in ONE
    jit) produces the same survivors, stats, and matcher verdicts as the
    exact two-phase path; budget overflow falls back to exact."""
    from mlis_tpu.models.mixvpr import MixVPR
    from mlis_tpu.models.resnet import ResNetConfig

    n = 12
    images = _scene_images(rng, n)
    times = np.arange(n) * 30.0
    floors = np.asarray([5] * 6 + [2] * 6)

    def build():
        enc = MixVPR(
            descriptor_dim=32,
            backbone_cfg=ResNetConfig.tiny_test(),
            input_size=(64, 64),
        )
        spr = SemanticPlaceRecognition(
            vpr_method=enc, similarity_threshold=0.8, min_time_gap=10.0
        )
        lg = LightGlue(
            sp_cfg=SuperPointConfig.tiny_test(max_keypoints=64),
            matcher_cfg=MatcherConfig.tiny_test(),
        )
        return FullGatePipeline(
            vpr=spr,
            verifier=GeometricVerifier(matcher=lg),
            similarity_threshold=0.8,
            verify_batch=64,
        )

    two_phase = build().process(images, times, floors, K_CAM)
    assert two_phase.total_pairs > 0

    pipe = build()
    mono = pipe.process(
        images, times, floors, K_CAM,
        survivor_budget=max(two_phase.verified, 1), monolithic=True,
    )
    assert mono.total_pairs == two_phase.total_pairs
    assert mono.cross_floor_rejected == two_phase.cross_floor_rejected
    assert mono.verified == two_phase.verified
    a = {(r.query_idx, r.match_idx): r.num_matches for r in mono.results}
    b = {(r.query_idx, r.match_idx): r.num_matches for r in two_phase.results}
    assert a == b

    # overflow: budget 1 with >1 survivors must fall back to exact
    if two_phase.verified > 1:
        over = build().process(
            images, times, floors, K_CAM,
            survivor_budget=1, monolithic=True,
        )
        assert over.verified == two_phase.verified


def test_pipelined_matches_mega(rng):
    """The PIPELINED mega path (per-chunk detect+encode dispatches that
    overlap the tunnel upload + one gate/verify tail) must match the
    one-dispatch mega program (device-resident images) decision-for-
    decision — chunked batching of the per-frame detect/encode must not
    change any verdict."""
    import jax

    from mlis_tpu.models.mixvpr import MixVPR
    from mlis_tpu.models.resnet import ResNetConfig

    n = 12
    images = _scene_images(rng, n)
    times = np.arange(n) * 30.0
    floors = np.asarray([5] * 6 + [2] * 6)

    def build():
        enc = MixVPR(
            descriptor_dim=32,
            backbone_cfg=ResNetConfig.tiny_test(),
            input_size=(64, 64),
        )
        spr = SemanticPlaceRecognition(
            vpr_method=enc, similarity_threshold=0.8, min_time_gap=10.0
        )
        lg = LightGlue(
            sp_cfg=SuperPointConfig.tiny_test(max_keypoints=64),
            matcher_cfg=MatcherConfig.tiny_test(),
        )
        return FullGatePipeline(
            vpr=spr,
            verifier=GeometricVerifier(matcher=lg),
            similarity_threshold=0.8,
            verify_batch=64,
        )

    base = build().process(images, times, floors, K_CAM)
    budget = max(base.verified, 1)

    pipe = build()
    dev = pipe.process(
        jax.device_put(images), times, floors, K_CAM,
        survivor_budget=budget, monolithic=True,
    )
    # 3 chunks of 4 frames through the pipelined path, same pipeline
    # instance (shared weights) so the comparison isolates the chunking
    pipe.spr.vpr.descriptors = []
    pipe.spr.vpr._matrix_cache = None
    piped = pipe.process(
        images, times, floors, K_CAM,
        survivor_budget=budget, monolithic=True, upload_chunk=4,
    )
    assert piped.total_pairs == dev.total_pairs == base.total_pairs
    assert piped.verified == dev.verified
    a = {(r.query_idx, r.match_idx): (r.num_matches, r.num_inliers)
         for r in piped.results}
    b = {(r.query_idx, r.match_idx): (r.num_matches, r.num_inliers)
         for r in dev.results}
    assert a == b


def test_budget_slots_quarter_octave():
    """Survivor budgets round up to {5,6,7,8}*2^k slot counts: tighter
    than power-of-2 padding (an 814-survivor gate pays 896 slots, not
    1024) while keeping at most 4 distinct fused-matcher shapes per
    octave in the jit cache."""
    f = FullGatePipeline._budget_slots
    for s in (1, 7, 16):
        assert f(s) == 16  # floor
    for s, want in [
        (17, 20), (24, 24), (25, 28), (64, 64), (65, 80),
        (513, 640), (768, 768), (814, 896), (896, 896),
        (897, 1024), (1024, 1024), (1025, 1280),
    ]:
        assert f(s) == want, (s, f(s), want)
    # invariants: never below the request, at most 4 sizes per octave
    for s in range(17, 5000):
        m = f(s)
        assert m >= s
        p = 1 << (m - 1).bit_length() if m & (m - 1) else m
        assert m % (p // 8) == 0 and m // (p // 8) in (5, 6, 7, 8)
