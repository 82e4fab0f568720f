"""Self-supervised homography training for the LightGlue matcher.

The official LightGlue is pretrained on synthetic homographies of single
images before any real-scene finetuning (LightGlue paper §4; the reference
consumes the resulting checkpoint via torch hub,
geometric_verification.py:216-242). This module reproduces that recipe
TPU-natively so the matcher can be trained from scratch in a zero-checkpoint
environment:

  1. sample a random perspective homography H per image;
  2. warp the image on-device (inverse-map bilinear gather);
  3. detect keypoints in BOTH views with the (frozen) SuperPoint front end;
  4. build ground-truth correspondences: keypoint pairs whose H-projected
     positions agree within a pixel threshold, mutual-nearest;
  5. minimize the dual-softmax negative log-likelihood of the ground-truth
     assignment plus a matchability BCE — the LightGlue training loss.

Everything jits: fixed keypoint counts, masked GT assignment matrices, one
fused train step over a pair batch. DP over the batch axis scales it on a
mesh exactly like the VPR trainer (train/trainer.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def random_homography(
    key, H: int, W: int, max_corner_jitter: float = 0.15
) -> jnp.ndarray:
    """Random perspective warp: jitter the four corners by up to
    max_corner_jitter x image size and solve the 8-DoF DLT exactly."""
    src = jnp.asarray(
        [[0.0, 0.0], [W - 1, 0.0], [W - 1, H - 1], [0.0, H - 1]]
    )
    jit = jax.random.uniform(
        key, (4, 2), minval=-max_corner_jitter, maxval=max_corner_jitter
    ) * jnp.asarray([W, H])
    dst = src + jit

    # DLT: for each correspondence two rows of the 8x8 system A h = b
    def rows(s, d):
        x, y = s
        u, v = d
        return jnp.asarray(
            [
                [x, y, 1, 0, 0, 0, -u * x, -u * y],
                [0, 0, 0, x, y, 1, -v * x, -v * y],
            ]
        ), jnp.asarray([u, v])

    A, b = jax.vmap(rows)(src, dst)
    h = jnp.linalg.solve(A.reshape(8, 8), b.reshape(8))
    return jnp.concatenate([h, jnp.ones(1)]).reshape(3, 3)


def apply_homography(Hm: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """(K, 2) xy points through a 3x3 homography."""
    p = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    q = p @ Hm.T
    return q[..., :2] / (q[..., 2:3] + 1e-9)


def warp_image(img: jnp.ndarray, Hm: jnp.ndarray) -> jnp.ndarray:
    """(H, W) image warped by Hm (inverse-map bilinear gather: output
    pixel p samples the source at H^-1 p)."""
    H, W = img.shape
    Hinv = jnp.linalg.inv(Hm)
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)  # (HW, 2) xy
    src = apply_homography(Hinv, grid)
    sx = jnp.clip(src[:, 0], 0.0, W - 1.001)
    sy = jnp.clip(src[:, 1], 0.0, H - 1.001)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    fx = sx - x0
    fy = sy - y0
    flat = img.reshape(-1)

    def at(yi, xi):
        return flat[yi * W + xi]

    out = (
        at(y0, x0) * (1 - fx) * (1 - fy)
        + at(y0, x0 + 1) * fx * (1 - fy)
        + at(y0 + 1, x0) * (1 - fx) * fy
        + at(y0 + 1, x0 + 1) * fx * fy
    )
    return out.reshape(H, W)


def gt_assignment(
    kp0: jnp.ndarray,  # (K, 2) xy in image0
    m0: jnp.ndarray,  # (K,) valid
    kp1: jnp.ndarray,
    m1: jnp.ndarray,
    Hm: jnp.ndarray,
    threshold_px: float = 3.0,
) -> jnp.ndarray:
    """(K, K) bool ground-truth matches: H-projected kp0 within threshold
    of kp1, mutual nearest, both valid."""
    proj = apply_homography(Hm, kp0)
    d = jnp.linalg.norm(proj[:, None, :] - kp1[None, :, :], axis=-1)
    d = jnp.where(m0[:, None] & m1[None, :], d, jnp.inf)
    nn0 = jnp.argmin(d, axis=1)
    nn1 = jnp.argmin(d, axis=0)
    K = kp0.shape[0]
    mutual = jnp.take(nn1, nn0) == jnp.arange(K)
    close = jnp.take_along_axis(d, nn0[:, None], axis=1)[:, 0] < threshold_px
    gt = jnp.zeros((K, K), bool)
    rows = jnp.arange(K)
    return gt.at[rows, nn0].set(mutual & close)


def matcher_loss(
    scores: jnp.ndarray,  # (B, K, K) assignment scores in [0, 1]
    gt: jnp.ndarray,  # (B, K, K) bool
) -> jnp.ndarray:
    """Negative log-likelihood of the ground-truth assignment under the
    dual-softmax scores (LightGlue's correspondence loss, simplified: the
    matchability factors ride inside `scores` already)."""
    eps = 1e-6
    pos = -jnp.log(scores + eps) * gt
    n_pos = jnp.maximum(gt.sum(), 1)
    return pos.sum() / n_pos


class MatcherTrainer:
    """Homography self-supervision for a LightGlue instance.

    The SuperPoint front end stays FROZEN (its random/converted filters act
    as a fixed feature extractor); only the matcher transformer trains.
    """

    def __init__(
        self,
        matcher,  # models.lightglue.LightGlue
        image_hw: Tuple[int, int],
        learning_rate: float = 1e-4,
        threshold_px: float = 3.0,
        max_corner_jitter: float = 0.15,
        seed: int = 0,
    ):
        self.matcher = matcher
        self.image_hw = (int(image_hw[0]), int(image_hw[1]))
        self.threshold_px = float(threshold_px)
        self.max_corner_jitter = float(max_corner_jitter)
        self.optimizer = optax.adam(learning_rate)
        matcher._init(
            matcher.sp.cfg.max_keypoints, matcher.sp.cfg.max_keypoints,
            self.image_hw,
        )
        matcher.sp.init_params(self.image_hw)
        self.opt_state = self.optimizer.init(matcher.params)
        self._key = jax.random.PRNGKey(seed)
        self._step = None

    def _build_step(self):
        from mlis_tpu.models.superpoint import (
            Keypoints,
            nms_heatmap,
            sample_descriptors,
            topk_keypoints,
        )

        matcher = self.matcher
        sp_params = matcher.sp.params
        sp_net, sp_cfg = matcher.sp.net, matcher.sp.cfg
        hw = self.image_hw
        thr = self.threshold_px
        jitter = self.max_corner_jitter
        H, W = hw

        def step(m_params, opt_state, images, key):
            B = images.shape[0]
            hkeys = jax.random.split(key, B)
            Hms = jax.vmap(
                lambda k: random_homography(k, H, W, jitter)
            )(hkeys)
            warped = jax.vmap(warp_image)(images, Hms)

            def detect(imgs):
                heat, desc_map = sp_net.apply(sp_params, imgs[..., None])
                heat = nms_heatmap(heat, sp_cfg.nms_radius)
                coords, scores, mask = topk_keypoints(
                    heat, sp_cfg.max_keypoints, sp_cfg.detection_threshold
                )
                descs = sample_descriptors(desc_map, coords)
                return Keypoints(coords, scores, descs, mask)

            kp0 = jax.lax.stop_gradient(detect(images))
            kp1 = jax.lax.stop_gradient(detect(warped))
            gt = jax.vmap(
                lambda c0, v0, c1, v1, Hm: gt_assignment(
                    c0, v0, c1, v1, Hm, thr
                )
            )(kp0.coords, kp0.mask, kp1.coords, kp1.mask, Hms)

            def loss_fn(p):
                scores = matcher.net.apply(
                    p,
                    kp0.descriptors, kp0.coords, kp0.mask,
                    kp1.descriptors, kp1.coords, kp1.mask,
                    hw,
                )
                return matcher_loss(scores, gt), gt.sum()

            (loss, n_gt), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(m_params)
            updates, opt_state = self.optimizer.update(grads, opt_state, m_params)
            m_params = optax.apply_updates(m_params, updates)
            return m_params, opt_state, loss, n_gt

        return jax.jit(step, donate_argnums=(0, 1))

    def train_batch(self, images: np.ndarray) -> Tuple[float, int]:
        """One step on a (B, H, W) float [0,1] grayscale batch.
        Returns (loss, number of GT correspondences in the batch)."""
        if self._step is None:
            self._step = self._build_step()
        self._key, sub = jax.random.split(self._key)
        params, self.opt_state, loss, n_gt = self._step(
            self.matcher.params, self.opt_state, jnp.asarray(images), sub
        )
        self.matcher.params = params
        return float(loss), int(n_gt)

    def match_recall(self, images: np.ndarray, key=None) -> float:
        """Held-out diagnostic: fraction of GT correspondences the current
        matcher recovers on fresh homography pairs."""
        from mlis_tpu.models.lightglue import extract_matches

        key = key if key is not None else jax.random.PRNGKey(999)
        H, W = self.image_hw
        imgs = jnp.asarray(images)
        B = imgs.shape[0]
        hkeys = jax.random.split(key, B)
        Hms = jax.vmap(
            lambda k: random_homography(k, H, W, self.max_corner_jitter)
        )(hkeys)
        warped = jax.vmap(warp_image)(imgs, Hms)
        kp0 = self.matcher.sp.detect(imgs[..., None])
        kp1 = self.matcher.sp.detect(warped[..., None])
        gt = jax.vmap(
            lambda c0, v0, c1, v1, Hm: gt_assignment(
                c0, v0, c1, v1, Hm, self.threshold_px
            )
        )(kp0.coords, kp0.mask, kp1.coords, kp1.mask, Hms)
        matches = self.matcher.match_keypoints(kp0, kp1, self.image_hw)
        K = kp0.coords.shape[1]
        pred = jnp.zeros((B, K, K), bool)
        rows = jnp.arange(K)
        idx = jnp.clip(matches.idx0, 0, K - 1)
        pred = jax.vmap(
            lambda p, i, v: p.at[rows, i].set(v)
        )(pred, idx, matches.valid)
        hits = (pred & gt).sum()
        total = jnp.maximum(gt.sum(), 1)
        return float(hits / total)
