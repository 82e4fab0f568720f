"""Geometric verification: matchers + verifier pipeline (tiny configs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlis_tpu.gating.verification import (
    GeometricVerifier,
    SemanticGeometricVerifier,
)
from mlis_tpu.models.lightglue import LightGlue, MatcherConfig, SuperGlue
from mlis_tpu.models.loftr import LoFTR, LoFTRConfig
from mlis_tpu.models.superpoint import SuperPoint, SuperPointConfig
from mlis_tpu.ops.image import to_grayscale

K_CAM = np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1.0]])


def _textured_image(rng, h=120, w=160):
    """Random blobs so the detector finds corners."""
    img = rng.integers(0, 255, size=(h // 8, w // 8, 3), dtype=np.uint8)
    img = np.kron(img, np.ones((8, 8, 1), dtype=np.uint8))
    return img[:h, :w]


def _tiny_lightglue(cls=LightGlue):
    return cls(
        sp_cfg=SuperPointConfig.tiny_test(max_keypoints=64),
        matcher_cfg=MatcherConfig.tiny_test(),
    )


def test_superpoint_detect_shapes(rng):
    sp = SuperPoint(SuperPointConfig.tiny_test(max_keypoints=32))
    imgs = to_grayscale(jnp.asarray(np.stack([_textured_image(rng) for _ in range(2)])))
    kp = sp.detect(imgs)
    assert kp.coords.shape == (2, 32, 2)
    assert kp.descriptors.shape[:2] == (2, 32)
    # descriptors L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(kp.descriptors), axis=-1), 1.0, atol=1e-3
    )
    # coords inside the image
    c = np.asarray(kp.coords)
    assert (c[..., 0] < 160).all() and (c[..., 1] < 120).all()


def test_nms_heatmap_spacing(rng):
    # unique scores -> survivors must be >= radius apart in Chebyshev
    # distance (ties legitimately co-survive window-max NMS, so the test
    # drives the op directly with tie-free values)
    from mlis_tpu.models.superpoint import nms_heatmap, topk_keypoints

    heat = jnp.asarray(rng.permutation(64 * 64).reshape(1, 64, 64) / (64.0 * 64))
    nmsed = nms_heatmap(heat, radius=4)
    coords, scores, mask = topk_keypoints(nmsed, k=32, threshold=0.0)
    pts = np.asarray(coords[0])[np.asarray(mask[0])]
    d = np.abs(pts[:, None] - pts[None]).max(-1)  # Chebyshev
    np.fill_diagonal(d, np.inf)
    assert d.min() > 4


@pytest.mark.parametrize("cls", [LightGlue, SuperGlue])
def test_matcher_identical_images_match_self(rng, cls):
    lg = _tiny_lightglue(cls)
    img = _textured_image(rng)
    k1, k2, conf = lg.detect_and_match(img, img)
    assert len(k1) == len(k2) == len(conf)
    if len(k1):  # random weights: matches may be sparse but must be sane
        assert ((k1 >= 0).all()) and ((k2 >= 0).all())


def test_matcher_batch_shapes(rng):
    lg = _tiny_lightglue()
    imgs0 = to_grayscale(jnp.asarray(np.stack([_textured_image(rng) for _ in range(3)])))
    imgs1 = to_grayscale(jnp.asarray(np.stack([_textured_image(rng) for _ in range(3)])))
    kp0, kp1, matches = lg.match_batch(imgs0, imgs1)
    assert matches.idx0.shape == (3, 64)
    assert matches.valid.dtype == bool


def test_loftr_tiny_match(rng):
    lf = LoFTR(LoFTRConfig.tiny_test())
    img = _textured_image(rng, 128, 160)
    k1, k2, conf = lf.detect_and_match(img, img)
    assert k1.shape == k2.shape
    if len(k1):
        # identical images: matched coords should be close to each other
        d = np.linalg.norm(k1 - k2, axis=1)
        assert np.median(d) < 16


def _synthetic_verifier(rng, **kw):
    from mlis_tpu.gating.verification import BaseFeatureMatcher

    class M(BaseFeatureMatcher):
        def __init__(self):
            from tests.test_epipolar import _two_view_scene

            self.k1, self.k2, _, _ = _two_view_scene(
                rng, n=150, noise_px=0.3, outlier_frac=0.1
            )

        def detect_and_match(self, image1, image2):
            return self.k1, self.k2, np.ones(len(self.k1))

    return GeometricVerifier(matcher=M(), **kw)


def test_verifier_valid_on_good_geometry(rng):
    v = _synthetic_verifier(rng)
    img = np.zeros((120, 160, 3), np.uint8)
    res = v.verify(img, img, K=np.array([[400.0, 0, 360], [0, 400, 270], [0, 0, 1]]))
    assert res.is_valid
    assert res.num_inliers >= 20
    assert res.inlier_ratio >= 0.25
    assert res.relative_pose is not None and res.relative_pose.shape == (4, 4)
    assert res.confidence == pytest.approx(
        min(1.0, res.inlier_ratio * res.num_inliers / 20), abs=1e-6
    )


def test_verifier_invalid_on_too_few_points(rng):
    from mlis_tpu.gating.verification import BaseFeatureMatcher

    class Empty(BaseFeatureMatcher):
        def detect_and_match(self, a, b):
            return np.zeros((3, 2)), np.zeros((3, 2)), np.zeros(3)

    v = GeometricVerifier(matcher=Empty())
    res = v.verify(np.zeros((10, 10, 3), np.uint8), np.zeros((10, 10, 3), np.uint8))
    assert not res.is_valid
    assert res.num_inliers == 0 and res.confidence == 0.0


def test_semantic_verifier_skips_cross_floor(rng):
    from mlis_tpu.gating.verification import BaseFeatureMatcher

    calls = {"n": 0}

    class Spy(BaseFeatureMatcher):
        def detect_and_match(self, a, b):
            calls["n"] += 1
            return np.zeros((3, 2)), np.zeros((3, 2)), np.zeros(3)

    v = SemanticGeometricVerifier(matcher=Spy(), enable_floor_gating=True)
    img = np.zeros((10, 10, 3), np.uint8)
    res = v.verify_with_semantics(img, img, floor1=5, floor2=2)
    assert not res.is_valid
    assert calls["n"] == 0  # model work skipped entirely
    v.verify_with_semantics(img, img, floor1=5, floor2=5)
    assert calls["n"] == 1
    stats = v.get_statistics()
    assert stats["skipped_floor_mismatch"] == 1
    assert stats["verified"] == 1
    assert stats["total_candidates"] == 2
    assert stats["skip_rate"] == 0.5


def test_verifier_batch_device_path(rng):
    lg = _tiny_lightglue()
    v = GeometricVerifier(matcher=lg)
    imgs0 = to_grayscale(jnp.asarray(np.stack([_textured_image(rng) for _ in range(2)])))
    imgs1 = to_grayscale(jnp.asarray(np.stack([_textured_image(rng) for _ in range(2)])))
    out = v.verify_pairs_batch(np.asarray(imgs0), np.asarray(imgs1), K_CAM)
    assert len(out) == 2
    for r in out:
        assert isinstance(r.is_valid, bool)
        assert 0.0 <= r.confidence <= 1.0


def test_unknown_matcher_raises():
    with pytest.raises(ValueError, match="Unknown matcher"):
        GeometricVerifier(matcher_type="sift")


def test_rotary_encoding_properties(rng):
    """Rotary rotation preserves norms and relative angles."""
    import jax
    import jax.numpy as jnp

    from mlis_tpu.models.lightglue import (
        RotaryEncoding,
        apply_rotary,
        normalize_keypoints,
    )

    coords = jnp.asarray(rng.uniform(0, 100, (1, 10, 2)), jnp.float32)
    rot = RotaryEncoding(head_dim=8)
    params = rot.init(jax.random.PRNGKey(0), normalize_keypoints(coords, (100, 100)))
    cos, sin = rot.apply(params, normalize_keypoints(coords, (100, 100)))
    assert cos.shape == (1, 10, 4)
    np.testing.assert_allclose(np.asarray(cos**2 + sin**2), 1.0, atol=1e-6)

    x = jnp.asarray(rng.normal(size=(1, 10, 2, 8)), jnp.float32)
    xr = apply_rotary(x, cos, sin)
    # rotation is norm-preserving per pair
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(xr), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )
    # dot products between two tokens with the SAME position are invariant
    y = jnp.asarray(rng.normal(size=(1, 10, 2, 8)), jnp.float32)
    yr = apply_rotary(y, cos, sin)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(xr * yr, -1)), np.asarray(jnp.sum(x * y, -1)), atol=1e-4
    )


def test_normalize_keypoints_centering():
    from mlis_tpu.models.lightglue import normalize_keypoints
    import jax.numpy as jnp

    c = jnp.asarray([[[0.0, 0.0], [720.0, 540.0], [360.0, 270.0]]])
    out = np.asarray(normalize_keypoints(c, (540, 720)))
    np.testing.assert_allclose(out[0, 2], [0, 0], atol=1e-6)  # center -> 0
    np.testing.assert_allclose(out[0, 1], [1.0, 0.75], atol=1e-6)
