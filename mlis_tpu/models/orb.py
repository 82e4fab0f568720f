"""TPU-native ORB: batched FAST-9 corners + steered BRIEF-256 + Hamming
cross-check matching.

Re-designs the reference's classical fallback matcher (cv2.ORB_create +
BFMatcher(NORM_HAMMING, crossCheck=True), geometric_verification.py:243-250
and :314-350) as fully vectorized XLA programs:

  * FAST-9: the 16-pixel Bresenham ring materializes as 16 shifted image
    copies; the contiguous-arc test and the margin score are fused
    elementwise ops over the whole batch at once (no per-pixel loop).
  * Orientation: intensity-centroid atan2 over a radius-15 disc, gathered
    per keypoint.
  * Steered BRIEF: a fixed seeded 256-pair pattern rotated by the patch
    orientation, sampled from a box-blurred image; bits pack into
    (K, 8) uint32 words.
  * Matching: Hamming distance = popcount(XOR) over the packed words,
    mutual-nearest (cross-check) filtering, confidences 1 - d/max_d as in
    the reference (:345-349).

Static shapes throughout: top-K corners with validity masks, so the whole
detect+describe+match path jits once per image shape. No learned weights —
this matcher works without any checkpoint, unlike the deep matchers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 16-point Bresenham circle of radius 3 (dy, dx), clockwise from 12 o'clock
FAST_RING = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
_PATCH_R = 15  # orientation / BRIEF sampling radius
_MARGIN = _PATCH_R + 3


def _brief_pattern(seed: int = 7, n: int = 256) -> np.ndarray:
    """(n, 2, 2) int test-point pairs ~ N(0, (R/5)^2), clipped to the patch.

    The official ORB pattern is learned offline; any fixed well-spread
    pattern preserves the descriptor's invariances (the reference relies on
    whatever OpenCV ships). Deterministic seed => reproducible descriptors.
    """
    rng = np.random.default_rng(seed)
    pts = np.clip(
        np.round(rng.normal(scale=_PATCH_R / 5.0, size=(n, 2, 2))),
        -(_PATCH_R - 2),
        _PATCH_R - 2,
    )
    return pts.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("max_keypoints", "threshold"))
def fast_detect(
    images: jnp.ndarray,  # (B, H, W) float32 grayscale in [0, 1]
    max_keypoints: int = 512,
    threshold: float = 0.08,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """FAST-9 corners with 3x3 non-max suppression.

    Returns (coords (B, K, 2) float32 xy, scores (B, K), valid (B, K)).
    """
    B, H, W = images.shape
    c = images
    ring = jnp.stack(
        [jnp.roll(c, (-dy, -dx), axis=(1, 2)) for dy, dx in FAST_RING]
    )  # (16, B, H, W): ring[i] holds I(p + offset_i)
    bright = ring > c + threshold
    dark = ring < c - threshold

    def arc9(flags):
        ext = jnp.concatenate([flags, flags[:8]], axis=0)  # wrap the ring
        runs = jnp.stack([
            jnp.all(ext[i : i + 9], axis=0) for i in range(16)
        ])
        return jnp.any(runs, axis=0)

    corner = arc9(bright) | arc9(dark)
    score = (
        jnp.where(bright, ring - c - threshold, 0.0)
        + jnp.where(dark, c - threshold - ring, 0.0)
    ).sum(axis=0)
    score = jnp.where(corner, score, 0.0)

    # 3x3 non-max suppression via shifted maxima
    neigh = jnp.stack(
        [
            jnp.roll(score, (dy, dx), axis=(1, 2))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if (dy, dx) != (0, 0)
        ]
    ).max(axis=0)
    score = jnp.where(score >= neigh, score, 0.0)

    # kill the border (ring wrap + BRIEF patch margin)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    interior = (
        (ys >= _MARGIN) & (ys < H - _MARGIN) & (xs >= _MARGIN) & (xs < W - _MARGIN)
    )
    score = jnp.where(interior, score, 0.0)

    flat = score.reshape(B, H * W)
    top, idx = jax.lax.top_k(flat, max_keypoints)
    coords = jnp.stack(
        [(idx % W).astype(jnp.float32), (idx // W).astype(jnp.float32)], axis=-1
    )  # xy
    valid = top > 0.0
    return coords, top, valid


def _box_blur(images: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(2r+1)^2 separable box blur (stands in for OpenCV's pre-BRIEF
    Gaussian smoothing)."""
    out = images
    for axis in (1, 2):
        acc = out
        for d in range(1, r + 1):
            acc = acc + jnp.roll(out, d, axis=axis) + jnp.roll(out, -d, axis=axis)
        out = acc / (2 * r + 1)
    return out


@functools.partial(jax.jit, static_argnames=("max_keypoints", "threshold"))
def orb_detect_describe(
    images: jnp.ndarray,  # (B, H, W) float32 [0, 1]
    max_keypoints: int = 512,
    threshold: float = 0.08,
):
    """Full ORB front end: FAST-9 -> intensity-centroid orientation ->
    steered BRIEF-256 packed into (B, K, 8) uint32.

    Returns (coords (B, K, 2) xy, desc (B, K, 8) uint32, valid (B, K)).
    """
    B, H, W = images.shape
    coords, _, valid = fast_detect(images, max_keypoints, threshold)
    K = max_keypoints
    blur = _box_blur(images)
    flat = blur.reshape(B, H * W)

    def gather(img_flat, yy, xx):
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        return img_flat[(yy * W + xx).astype(jnp.int32)]

    # orientation: intensity centroid over a radius-15 disc
    dd = jnp.arange(-_PATCH_R, _PATCH_R + 1)
    dy, dx = jnp.meshgrid(dd, dd, indexing="ij")
    disc = (dy**2 + dx**2) <= _PATCH_R**2
    dyf, dxf = dy.reshape(-1), dx.reshape(-1)
    discf = disc.reshape(-1).astype(jnp.float32)

    kx = coords[..., 0].astype(jnp.int32)  # (B, K)
    ky = coords[..., 1].astype(jnp.int32)

    def per_image(img_flat, kx_i, ky_i):
        yy = ky_i[:, None] + dyf[None, :]  # (K, P)
        xx = kx_i[:, None] + dxf[None, :]
        patch = gather(img_flat, yy, xx) * discf  # (K, P)
        m01 = (patch * dyf).sum(axis=1)
        m10 = (patch * dxf).sum(axis=1)
        return jnp.arctan2(m01, m10)  # (K,)

    theta = jax.vmap(per_image)(flat, kx, ky)  # (B, K)

    # steered BRIEF: rotate the fixed pattern by theta, sample nearest
    pat = jnp.asarray(_brief_pattern())  # (256, 2, 2) float (y, x)? -> (dy, dx)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)  # (B, K)

    def sample_bits(img_flat, kx_i, ky_i, c_i, s_i):
        # rotate pattern points: [dy', dx'] = R(theta) [dy, dx]
        py, px = pat[:, :, 0], pat[:, :, 1]  # (256, 2)
        ry = (
            c_i[:, None, None] * py[None] + s_i[:, None, None] * px[None]
        )  # (K, 256, 2)
        rx = (
            -s_i[:, None, None] * py[None] + c_i[:, None, None] * px[None]
        )
        yy = ky_i[:, None, None] + jnp.round(ry).astype(jnp.int32)
        xx = kx_i[:, None, None] + jnp.round(rx).astype(jnp.int32)
        vals = gather(img_flat, yy, xx)  # (K, 256, 2)
        bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (K, 256)
        words = bits.reshape(-1, 8, 32) << jnp.arange(32, dtype=jnp.uint32)
        return words.sum(axis=-1, dtype=jnp.uint32)  # (K, 8)

    desc = jax.vmap(sample_bits)(flat, kx, ky, cos_t, sin_t)  # (B, K, 8)
    return coords, desc, valid


@jax.jit
def hamming_mutual_match(
    d0: jnp.ndarray,  # (K, 8) uint32
    v0: jnp.ndarray,  # (K,) bool
    d1: jnp.ndarray,
    v1: jnp.ndarray,
):
    """Brute-force Hamming + cross-check (BFMatcher crossCheck=True
    semantics). Returns (match_idx (K,) int32 with -1 for unmatched,
    distance (K,) int32)."""
    BIG = jnp.int32(1 << 24)
    x = d0[:, None, :] ^ d1[None, :, :]
    dist = jax.lax.population_count(x).astype(jnp.int32).sum(axis=-1)
    dist = jnp.where(v0[:, None] & v1[None, :], dist, BIG)
    nn0 = jnp.argmin(dist, axis=1).astype(jnp.int32)  # (K0,)
    nn1 = jnp.argmin(dist, axis=0).astype(jnp.int32)  # (K1,)
    d_best = jnp.take_along_axis(dist, nn0[:, None], axis=1)[:, 0]
    mutual = (jnp.take(nn1, nn0) == jnp.arange(d0.shape[0])) & (d_best < BIG)
    return jnp.where(mutual, nn0, -1), d_best


from mlis_tpu.gating.verification import BaseFeatureMatcher  # noqa: E402


class ORBMatcher(BaseFeatureMatcher):
    """Classical weight-free matcher with the reference fallback's API:
    `detect_and_match(img0, img1) -> (mkpts0, mkpts1, confidences)`,
    matches sorted by ascending Hamming distance, confidence 1 - d/max_d
    (geometric_verification.py:338-350)."""

    def __init__(self, max_keypoints: int = 512, fast_threshold: float = 0.08):
        self.max_keypoints = max_keypoints
        self.fast_threshold = fast_threshold

    @staticmethod
    def _gray_batch(images) -> np.ndarray:
        """uint8 or float, color or mono -> (B, H, W) float32 in [0, 1]
        (BT.601 luma, BGR channel order like the reference's cv2 path)."""
        from mlis_tpu.ops.image import BT601_BGR

        imgs = np.asarray(images)
        if imgs.ndim >= 3 and imgs.shape[-1] == 3:
            imgs = imgs.astype(np.float32) @ np.asarray(BT601_BGR, np.float32)
        elif imgs.ndim >= 3 and imgs.shape[-1] == 1:
            imgs = imgs[..., 0]
        imgs = imgs.astype(np.float32)
        if imgs.size and imgs.max() > 1.5:  # integer-range input
            imgs = imgs / 255.0
        return imgs

    def _to_gray(self, image: np.ndarray) -> np.ndarray:
        img = self._gray_batch(image)
        return img[None] if img.ndim == 2 else img

    def detect_and_describe(self, images) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched front end on (B, H, W[, C]) images."""
        coords, desc, valid = orb_detect_describe(
            jnp.asarray(self._gray_batch(images)),
            self.max_keypoints,
            self.fast_threshold,
        )
        return np.asarray(coords), np.asarray(desc), np.asarray(valid)

    def detect_and_match(
        self, image1: np.ndarray, image2: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        g1, g2 = self._to_gray(image1), self._to_gray(image2)
        if g1.shape == g2.shape:
            gray = jnp.asarray(np.concatenate([g1, g2]), jnp.float32)
            coords, desc, valid = orb_detect_describe(
                gray, self.max_keypoints, self.fast_threshold
            )
            c1, c2 = coords[0], coords[1]
            d1, d2 = desc[0], desc[1]
            v1, v2 = valid[0], valid[1]
        else:
            c1, d1, v1 = (
                a[0]
                for a in orb_detect_describe(
                    jnp.asarray(g1, jnp.float32),
                    self.max_keypoints,
                    self.fast_threshold,
                )
            )
            c2, d2, v2 = (
                a[0]
                for a in orb_detect_describe(
                    jnp.asarray(g2, jnp.float32),
                    self.max_keypoints,
                    self.fast_threshold,
                )
            )
        n1, n2 = int(np.asarray(v1).sum()), int(np.asarray(v2).sum())
        self.last_detector_counts = (n1, n2)
        if n1 < 5 or n2 < 5:
            return np.array([]), np.array([]), np.array([])
        midx, mdist = hamming_mutual_match(d1, v1, d2, v2)
        midx = np.asarray(midx)
        mdist = np.asarray(mdist)
        c1 = np.asarray(c1)
        c2 = np.asarray(c2)
        keep = np.nonzero(midx >= 0)[0]
        if len(keep) == 0:
            return np.array([]), np.array([]), np.array([])
        order = keep[np.argsort(mdist[keep], kind="stable")]
        mk1 = c1[order]
        mk2 = c2[midx[order]]
        dists = mdist[order].astype(np.float64)
        max_d = dists.max() if dists.max() > 0 else 1.0
        conf = 1.0 - dists / max_d
        return mk1, mk2, conf
