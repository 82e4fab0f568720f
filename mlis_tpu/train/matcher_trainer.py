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
    pixel p samples the source at H^-1 p). Output pixels whose source
    coordinate falls outside the image are ZERO-filled — border
    replication would paint streaked fake texture there, SuperPoint would
    detect keypoints on it, and gt_assignment would mint false
    'ground-truth' correspondences near borders (label noise)."""
    H, W = img.shape
    Hinv = jnp.linalg.inv(Hm)
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)  # (HW, 2) xy
    src = apply_homography(Hinv, grid)
    in_view = (
        (src[:, 0] >= 0.0)
        & (src[:, 0] <= W - 1)
        & (src[:, 1] >= 0.0)
        & (src[:, 1] <= H - 1)
    )
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
    return jnp.where(in_view, out, 0.0).reshape(H, W)


def gt_assignment(
    kp0: jnp.ndarray,  # (K, 2) xy in image0
    m0: jnp.ndarray,  # (K,) valid
    kp1: jnp.ndarray,
    m1: jnp.ndarray,
    Hm: jnp.ndarray,
    threshold_px: float = 3.0,
    image_hw: Tuple[int, int] | None = None,
) -> jnp.ndarray:
    """(K, K) bool ground-truth matches: H-projected kp0 within threshold
    of kp1, mutual nearest, both valid. When image_hw is given, kp0 whose
    projection lands outside the valid image region are excluded (their
    true correspondence is unobservable in the warped view)."""
    proj = apply_homography(Hm, kp0)
    v0 = m0
    if image_hw is not None:
        Hh, Ww = image_hw
        v0 = v0 & (
            (proj[:, 0] >= 0.0)
            & (proj[:, 0] <= Ww - 1)
            & (proj[:, 1] >= 0.0)
            & (proj[:, 1] <= Hh - 1)
        )
    d = jnp.linalg.norm(proj[:, None, :] - kp1[None, :, :], axis=-1)
    d = jnp.where(v0[:, None] & m1[None, :], d, jnp.inf)
    nn0 = jnp.argmin(d, axis=1)
    nn1 = jnp.argmin(d, axis=0)
    K = kp0.shape[0]
    mutual = jnp.take(nn1, nn0) == jnp.arange(K)
    close = jnp.take_along_axis(d, nn0[:, None], axis=1)[:, 0] < threshold_px
    gt = jnp.zeros((K, K), bool)
    rows = jnp.arange(K)
    return gt.at[rows, nn0].set(mutual & close)


def render_layered_pair(
    key,
    H: int,
    W: int,
    depths=(4.0, 7.0, 12.0),
    layer_coverage=(0.22, 0.40),
    max_rot_deg: float = 5.0,
    max_trans: float = 0.45,
    max_trans_z: float = 1.2,
    brightness: float = 0.08,
):
    """One layered piecewise-planar place (eval/quality.
    make_quality_scene_v2's render model) observed canonically (view 0)
    and from a random SE(3) camera pose (view 1) — TRUE two-view
    geometry with parallax, occlusion boundaries and scale change, and
    EXACT per-pixel ground truth: each pixel's depth layer is known, so
    its correspondence is its layer's plane-induced homography, and its
    visibility in view 1 is whether the same layer is on top there.

    Returns (img0, img1, layer_id0 (H, W) int32, layer_id1, Hs (L, 3, 3))
    — layer_id1 is -1 where view 1 sees nothing (outside every warped
    layer, including the full-support background's frame border).
    """
    from mlis_tpu.eval.quality import (
        _blob_mask,
        _plane_homography,
        _rotation_matrix,
    )

    L = len(depths)
    kt, km, kp, kb = jax.random.split(key, 4)
    tex = synthetic_textures(kt, L, H, W)
    mkeys = jax.random.split(km, max(L - 1, 1))
    masks = [
        _blob_mask(mkeys[l], H, W, layer_coverage[l]) for l in range(L - 1)
    ] + [jnp.ones((H, W))]

    f = 200.0 * (W / 360.0)
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    Kinv = jnp.linalg.inv(K)
    ka, ktr = jax.random.split(kp)
    rot = jnp.deg2rad(max_rot_deg)
    angles = jax.random.uniform(ka, (3,), minval=-rot, maxval=rot)
    t3 = jax.random.uniform(ktr, (3,), minval=-1.0, maxval=1.0) * (
        jnp.asarray([max_trans, max_trans, max_trans_z])
    )
    R = _rotation_matrix(angles)
    Hs = jnp.stack(
        [_plane_homography(K, Kinv, R, t3, d) for d in depths]
    )

    img0 = jnp.zeros((H, W))
    lid0 = jnp.full((H, W), L - 1, jnp.int32)
    img1 = jnp.zeros((H, W))
    lid1 = jnp.full((H, W), -1, jnp.int32)
    for l in range(L - 1, -1, -1):
        on0 = masks[l] > 0.5
        img0 = jnp.where(on0, tex[l], img0)
        lid0 = jnp.where(on0, l, lid0)
        iw = warp_image(tex[l], Hs[l])
        mw = warp_image(masks[l], Hs[l])
        on1 = mw > 0.5
        img1 = jnp.where(on1, iw, img1)
        lid1 = jnp.where(on1, l, lid1)
    b0, b1 = jax.random.uniform(
        kb, (2,), minval=-brightness, maxval=brightness
    )
    img0 = jnp.clip(img0 + b0, 0.0, 1.0)
    img1 = jnp.clip(img1 + b1, 0.0, 1.0)
    return img0, img1, lid0, lid1, Hs


def gt_assignment_parallax(
    kp0: jnp.ndarray,  # (K, 2) xy in view 0
    m0: jnp.ndarray,
    kp1: jnp.ndarray,
    m1: jnp.ndarray,
    lid0: jnp.ndarray,  # (H, W) int32 per-pixel layer in view 0
    lid1: jnp.ndarray,  # (H, W) int32 per-pixel layer in view 1 (-1=none)
    Hs: jnp.ndarray,  # (L, 3, 3) per-layer plane-induced homographies
    threshold_px: float = 3.0,
    image_hw: Tuple[int, int] | None = None,
) -> jnp.ndarray:
    """(K, K) bool GT matches for a layered two-view pair: each keypoint
    projects through ITS OWN layer's homography, and counts only when
    the same layer is visible (not occluded by a nearer layer, not out
    of view) at the projected pixel — occlusion-aware supervision that a
    single-homography gt_assignment cannot express."""
    Hh, Ww = lid0.shape
    xi0 = jnp.clip(jnp.round(kp0[:, 0]).astype(jnp.int32), 0, Ww - 1)
    yi0 = jnp.clip(jnp.round(kp0[:, 1]).astype(jnp.int32), 0, Hh - 1)
    l0 = lid0[yi0, xi0]  # (K,)
    Hsel = Hs[l0]  # (K, 3, 3)
    p = jnp.concatenate([kp0, jnp.ones_like(kp0[:, :1])], axis=-1)
    q = jnp.einsum("kij,kj->ki", Hsel, p)
    proj = q[:, :2] / (q[:, 2:3] + 1e-9)
    in_view = (
        (proj[:, 0] >= 0.0)
        & (proj[:, 0] <= Ww - 1)
        & (proj[:, 1] >= 0.0)
        & (proj[:, 1] <= Hh - 1)
    )
    xi1 = jnp.clip(jnp.round(proj[:, 0]).astype(jnp.int32), 0, Ww - 1)
    yi1 = jnp.clip(jnp.round(proj[:, 1]).astype(jnp.int32), 0, Hh - 1)
    visible = lid1[yi1, xi1] == l0  # same layer on top at the projection
    v0 = m0 & in_view & visible

    d = jnp.linalg.norm(proj[:, None, :] - kp1[None, :, :], axis=-1)
    d = jnp.where(v0[:, None] & m1[None, :], d, jnp.inf)
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
    m0: jnp.ndarray = None,  # (B, K) valid kpts in image0
    m1: jnp.ndarray = None,
    mp0: jnp.ndarray = None,  # (B, K) matchable probabilities
    mp1: jnp.ndarray = None,
) -> jnp.ndarray:
    """LightGlue's training loss: NLL of the ground-truth assignment under
    the dual-softmax scores, plus (when matchability probabilities are
    given) a BCE pushing matchability DOWN for valid keypoints with no
    ground-truth correspondence — without it the sigmoid gates saturate at
    1 and every spurious mutual-argmax passes the match threshold
    (precision collapse; the paper's eq. 8 negative term)."""
    eps = 1e-6
    pos = -jnp.log(scores + eps) * gt
    n_pos = jnp.maximum(gt.sum(), 1)
    loss = pos.sum() / n_pos
    if mp0 is not None:
        un0 = m0 & ~gt.any(axis=2)
        un1 = m1 & ~gt.any(axis=1)
        neg0 = -jnp.log1p(-jnp.clip(mp0, 0.0, 1.0 - eps)) * un0
        neg1 = -jnp.log1p(-jnp.clip(mp1, 0.0, 1.0 - eps)) * un1
        loss = loss + 0.5 * (
            neg0.sum() / jnp.maximum(un0.sum(), 1)
            + neg1.sum() / jnp.maximum(un1.sum(), 1)
        )
    return loss


def synthetic_textures(key, n: int, H: int, W: int) -> jnp.ndarray:
    """(n, H, W) float [0,1] procedural training images, generated ON
    DEVICE (zero host->device upload in the training loop — the TPU here
    sits behind a ~22 MB/s tunnel). Multi-scale block noise gives hard
    edges and corners at several frequencies — what SuperPoint's detector
    responds to — plus a random low-frequency illumination ramp."""
    k1, k2 = jax.random.split(key)
    scale_keys = jax.random.split(k1, 4)
    img = jnp.zeros((n, H, W))
    total = 0.0
    for i, s in enumerate((8, 16, 32, 64)):
        g = jax.random.uniform(
            scale_keys[i], (n, H // s + 1, W // s + 1)
        )
        up = jnp.repeat(jnp.repeat(g, s, axis=1), s, axis=2)[:, :H, :W]
        w = 0.55**i
        img = img + w * up
        total += w
    img = img / total
    # illumination ramp (keeps the matcher from keying on absolute value)
    gk = jax.random.normal(k2, (n, 2)) * 0.15
    yy = jnp.linspace(-1, 1, H)[None, :, None]
    xx = jnp.linspace(-1, 1, W)[None, None, :]
    ramp = gk[:, 0, None, None] * yy + gk[:, 1, None, None] * xx
    return jnp.clip(img + ramp, 0.0, 1.0)


class MatcherTrainer:
    """Homography self-supervision for a LightGlue instance.

    The SuperPoint front end stays FROZEN (its random/converted filters act
    as a fixed feature extractor); only the matcher transformer trains.
    """

    def __init__(
        self,
        matcher,  # models.lightglue.LightGlue
        image_hw: Tuple[int, int],
        learning_rate=1e-4,  # float or optax schedule
        threshold_px: float = 3.0,
        max_corner_jitter: float = 0.15,
        seed: int = 0,
        optimizer: optax.GradientTransformation | None = None,
        pair_mode: str = "homography",  # or "parallax": layered-scene
        # SE(3) pairs with occlusion-aware GT (render_layered_pair +
        # gt_assignment_parallax) — the v2 GT scene's distribution
    ):
        self.matcher = matcher
        self.image_hw = (int(image_hw[0]), int(image_hw[1]))
        self.threshold_px = float(threshold_px)
        self.max_corner_jitter = float(max_corner_jitter)
        self.pair_mode = pair_mode
        self.optimizer = optimizer or optax.chain(
            optax.clip_by_global_norm(1.0), optax.adam(learning_rate)
        )
        matcher._init(
            matcher.sp.cfg.max_keypoints, matcher.sp.cfg.max_keypoints,
            self.image_hw,
        )
        matcher.sp.init_params(self.image_hw)
        self.opt_state = self.optimizer.init(matcher.params)
        self._key = jax.random.PRNGKey(seed)
        self._step = None
        self._chunk = {}

    def _make_step_fn(self):
        """Pure (m_params, opt_state, images, key) -> (params, opt, loss,
        n_gt): homography pair synthesis + frozen detection + matcher
        fwd/bwd + optimizer update. Shared by the per-batch jit path and
        the scanned multi-step chunk path."""
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

        parallax = self.pair_mode == "parallax"

        def step(m_params, opt_state, images, key):
            B = images.shape[0]
            hkeys = jax.random.split(key, B)
            if parallax:
                # images arg only sets the batch size: the layered pairs
                # synthesize their own textures (fresh every step)
                img0, img1, lid0, lid1, Hs_all = jax.vmap(
                    lambda k: render_layered_pair(k, H, W)
                )(hkeys)
            else:
                Hms = jax.vmap(
                    lambda k: random_homography(k, H, W, jitter)
                )(hkeys)
                img0 = images
                img1 = jax.vmap(warp_image)(images, Hms)

            def detect(imgs):
                heat, desc_map = sp_net.apply(sp_params, imgs[..., None])
                heat = nms_heatmap(heat, sp_cfg.nms_radius)
                coords, scores, mask = topk_keypoints(
                    heat, sp_cfg.max_keypoints, sp_cfg.detection_threshold
                )
                descs = sample_descriptors(desc_map, coords)
                return Keypoints(coords, scores, descs, mask)

            kp0 = jax.lax.stop_gradient(detect(img0))
            kp1 = jax.lax.stop_gradient(detect(img1))
            if parallax:
                gt = jax.vmap(
                    lambda c0, v0, c1, v1, l0, l1, Hl: gt_assignment_parallax(
                        c0, v0, c1, v1, l0, l1, Hl, thr, image_hw=hw
                    )
                )(
                    kp0.coords, kp0.mask, kp1.coords, kp1.mask,
                    lid0, lid1, Hs_all,
                )
            else:
                gt = jax.vmap(
                    lambda c0, v0, c1, v1, Hm: gt_assignment(
                        c0, v0, c1, v1, Hm, thr, image_hw=hw
                    )
                )(kp0.coords, kp0.mask, kp1.coords, kp1.mask, Hms)

            def loss_fn(p):
                scores, mp0, mp1 = matcher.net.apply(
                    p,
                    kp0.descriptors, kp0.coords, kp0.mask,
                    kp1.descriptors, kp1.coords, kp1.mask,
                    hw,
                    return_matchability=True,
                )
                return (
                    matcher_loss(scores, gt, kp0.mask, kp1.mask, mp0, mp1),
                    gt.sum(),
                )

            (loss, n_gt), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(m_params)
            updates, opt_state = self.optimizer.update(grads, opt_state, m_params)
            m_params = optax.apply_updates(m_params, updates)
            return m_params, opt_state, loss, n_gt

        return step

    def train_batch(self, images: np.ndarray) -> Tuple[float, int]:
        """One step on a (B, H, W) float [0,1] grayscale batch.
        Returns (loss, number of GT correspondences in the batch)."""
        if self._step is None:
            self._step = jax.jit(self._make_step_fn(), donate_argnums=(0, 1))
        self._key, sub = jax.random.split(self._key)
        params, self.opt_state, loss, n_gt = self._step(
            self.matcher.params, self.opt_state, jnp.asarray(images), sub
        )
        self.matcher.params = params
        return float(loss), int(n_gt)

    def train_chunk(self, steps: int, batch_size: int = 8) -> np.ndarray:
        """Run `steps` training steps as ONE device dispatch (lax.scan),
        with images generated on device (synthetic_textures). Returns the
        (steps,) loss trace. Through a high-RTT tunnel this amortizes the
        per-dispatch round trip over the whole chunk."""
        key_shape = (steps, batch_size)
        if key_shape not in self._chunk:
            step_fn = self._make_step_fn()
            H, W = self.image_hw

            def chunk(m_params, opt_state, key):
                def body(carry, i):
                    p, o = carry
                    k = jax.random.fold_in(key, i)
                    k_img, k_step = jax.random.split(k)
                    images = synthetic_textures(k_img, batch_size, H, W)
                    p, o, loss, n_gt = step_fn(p, o, images, k_step)
                    return (p, o), loss

                (p, o), losses = jax.lax.scan(
                    body, (m_params, opt_state), jnp.arange(steps)
                )
                return p, o, losses

            self._chunk[key_shape] = jax.jit(chunk, donate_argnums=(0, 1))
        self._key, sub = jax.random.split(self._key)
        params, self.opt_state, losses = self._chunk[key_shape](
            self.matcher.params, self.opt_state, sub
        )
        self.matcher.params = params
        return np.asarray(losses)

    def save_checkpoint(self, path: str) -> None:
        """Ship matcher + frozen SuperPoint weights as one npz."""
        self.matcher.save_weights(path)

    def match_recall(self, images: np.ndarray, key=None) -> float:
        return self.match_metrics(images, key)["recall"]

    def parallax_match_metrics(self, n_pairs: int = 16, key=None) -> dict:
        """Held-out diagnostics on fresh LAYERED SE(3) pairs (parallax +
        occlusion GT via gt_assignment_parallax)."""
        key = key if key is not None else jax.random.PRNGKey(991)
        H, W = self.image_hw
        img0, img1, lid0, lid1, Hs_all = jax.vmap(
            lambda k: render_layered_pair(k, H, W)
        )(jax.random.split(key, n_pairs))
        kp0 = self.matcher.sp.detect(img0[..., None])
        kp1 = self.matcher.sp.detect(img1[..., None])
        gt = jax.vmap(
            lambda c0, v0, c1, v1, l0, l1, Hl: gt_assignment_parallax(
                c0, v0, c1, v1, l0, l1, Hl, self.threshold_px,
                image_hw=self.image_hw,
            )
        )(kp0.coords, kp0.mask, kp1.coords, kp1.mask, lid0, lid1, Hs_all)
        matches = self.matcher.match_keypoints(kp0, kp1, self.image_hw)
        K = kp0.coords.shape[1]
        pred = jnp.zeros((n_pairs, K, K), bool)
        rows = jnp.arange(K)
        idx = jnp.clip(matches.idx0, 0, K - 1)
        pred = jax.vmap(
            lambda p, i, v: p.at[rows, i].set(v)
        )(pred, idx, matches.valid)
        hits = (pred & gt).sum()
        return {
            "recall": float(hits / jnp.maximum(gt.sum(), 1)),
            "precision": float(hits / jnp.maximum(pred.sum(), 1)),
            "n_gt": int(gt.sum()),
            "n_pred": int(pred.sum()),
        }

    def match_metrics(self, images: np.ndarray, key=None) -> dict:
        """Held-out diagnostics on fresh pairs from the TRAINING pair
        distribution (homography by default; layered SE(3) pairs in
        parallax mode): recall = fraction of GT correspondences
        recovered, precision = fraction of predicted matches that are
        GT."""
        if self.pair_mode == "parallax":
            return self.parallax_match_metrics(
                n_pairs=int(len(images)), key=key
            )
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
                c0, v0, c1, v1, Hm, self.threshold_px,
                image_hw=self.image_hw,
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
        n_pred = jnp.maximum(pred.sum(), 1)
        return {
            "recall": float(hits / total),
            "precision": float(hits / n_pred),
            "n_gt": int(gt.sum()),
            "n_pred": int(pred.sum()),
        }
