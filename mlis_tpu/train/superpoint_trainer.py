"""Self-supervised SuperPoint training: synthetic corners + homography
descriptors, fully on-device.

The reference consumes magicleap's pretrained SuperPoint through the
LightGlue wrapper (geometric_verification.py:216-242). In this
zero-checkpoint environment the detector+descriptor are trained from
scratch with the official recipe's two ingredients, TPU-natively:

  1. MAGICPOINT STAGE (detector): render synthetic scenes of geometric
     primitives — quads, triangles, line segments, checker quads — with
     EXACT corner ground truth, entirely on device (half-plane tests, no
     host rendering). The detector head minimizes the 65-way cell
     softmax cross-entropy against the known corner cells (SuperPoint
     paper §3.1 / eq. 1-2).
  2. DESCRIPTOR STAGE: warp each scene by a random homography
     (train/matcher_trainer.py machinery) and minimize the dense hinge
     descriptor loss over all cell pairs (paper eq. 4): positive margin
     for cells that correspond under H, negative margin otherwise —
     one (cells x cells) GEMM per pair, MXU-friendly.

Both losses train jointly on mixed batches (shapes for the detector,
textured warps for the descriptors). The result feeds
train/pretrain_matcher.py --sp-weights so LightGlue pretrains on a
TRAINED front end, and ships in the same npz checkpoint.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


# ---------------------------------------------------------------------------
# on-device synthetic-shape rendering with exact corner GT
# ---------------------------------------------------------------------------

def _render_polygon(
    yy: jnp.ndarray, xx: jnp.ndarray, verts: jnp.ndarray, shade: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fill a convex polygon given CCW-ordered (V, 2) xy vertices via
    half-plane tests. Returns (mask (H, W), corner coords (V, 2))."""
    V = verts.shape[0]
    nxt = jnp.roll(verts, -1, axis=0)
    # inside test: cross((b - a), (p - a)) >= 0 for all edges (CCW)
    ex = nxt[:, 0] - verts[:, 0]
    ey = nxt[:, 1] - verts[:, 1]
    px = xx[None] - verts[:, 0, None, None]
    py = yy[None] - verts[:, 1, None, None]
    cross = ex[:, None, None] * py - ey[:, None, None] * px
    inside = jnp.all(cross >= 0.0, axis=0)
    return inside.astype(jnp.float32) * shade, verts


def _ccw_sort(verts: jnp.ndarray) -> jnp.ndarray:
    c = verts.mean(axis=0, keepdims=True)
    ang = jnp.arctan2(verts[:, 1] - c[0, 1], verts[:, 0] - c[0, 0])
    return verts[jnp.argsort(ang)]


def render_shapes(
    key, n: int, H: int, W: int, shapes_per_image: int = 6
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(n, H, W) images of random convex quads over a noise background,
    with exact corner ground truth.

    Returns (images, corners (n, S*4, 2) xy, corner_valid (n, S*4)).
    Quads are the work-horse (4 corners each, random convex via CCW sort
    of 4 random points); tiny quads degenerate gracefully (valid mask
    keeps every vertex — a degenerate sliver still has its corners).
    """
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    S = shapes_per_image

    def one(k):
        k_bg, k_v, k_s = jax.random.split(k, 3)
        # low-frequency background
        bg = jax.image.resize(
            jax.random.uniform(k_bg, (H // 32 + 1, W // 32 + 1)) * 0.3,
            (H, W),
            method="linear",
        )
        vkeys = jax.random.split(k_v, S)
        shades = jax.random.uniform(k_s, (S,), minval=0.35, maxval=1.0)

        def shape(i, carry):
            img = carry
            kv = vkeys[i]
            k_c, k_r = jax.random.split(kv)
            center = jax.random.uniform(
                k_c, (2,), minval=0.12, maxval=0.88
            ) * jnp.asarray([W, H])
            radii = jax.random.uniform(k_r, (4, 2), minval=6.0, maxval=0.18 * W)
            angles = jnp.asarray([0.25, 1.8, 3.4, 5.0]) + jax.random.uniform(
                kv, (4,), maxval=1.2
            )
            pts = center + radii * jnp.stack(
                [jnp.cos(angles), jnp.sin(angles)], axis=1
            )
            pts = jnp.clip(
                pts, jnp.zeros(2) + 1.0, jnp.asarray([W - 2.0, H - 2.0])
            )
            pts = _ccw_sort(pts)
            m, vs = _render_polygon(yy, xx, pts, shades[i])
            img = jnp.where(m > 0, m, img)
            return img, vs

        img = bg
        corners = []
        for i in range(S):
            img, vs = shape(i, img)
            corners.append(vs)
        return img, jnp.concatenate(corners, axis=0)

    keys = jax.random.split(key, n)
    imgs, corners = jax.vmap(one)(keys)
    valid = jnp.ones(corners.shape[:2], bool)
    return imgs, corners, valid


def corner_cell_labels(
    corners: jnp.ndarray,  # (B, C, 2) xy
    valid: jnp.ndarray,  # (B, C)
    H: int,
    W: int,
) -> jnp.ndarray:
    """(B, H/8, W/8) int labels in [0, 64]: the in-cell position index of
    a corner in each 8x8 cell, or 64 (dustbin) for cornerless cells —
    the target of SuperPoint's 65-way detector softmax. When several
    corners land in one cell, the last one wins (paper behavior:
    one corner per cell)."""
    B, C, _ = corners.shape
    hc, wc = H // 8, W // 8
    cx = jnp.clip(corners[..., 0], 0, W - 1)
    cy = jnp.clip(corners[..., 1], 0, H - 1)
    ix = cx.astype(jnp.int32)
    iy = cy.astype(jnp.int32)
    cell = (iy // 8) * wc + ix // 8  # (B, C)
    pos = (iy % 8) * 8 + ix % 8  # in-cell index 0..63
    labels = jnp.full((B, hc * wc), 64, jnp.int32)
    bidx = jnp.arange(B)[:, None].repeat(C, 1)
    cell = jnp.where(valid, cell, 0)
    pos_w = jnp.where(valid, pos, labels[0, 0])  # dustbin for invalid
    labels = labels.at[bidx, cell].set(
        jnp.where(valid, pos_w, labels[bidx, cell])
    )
    return labels.reshape(B, hc, wc)


def detector_loss(
    logits: jnp.ndarray,  # (B, hc, wc, 65) raw head output
    labels: jnp.ndarray,  # (B, hc, wc) int in [0, 64]
) -> jnp.ndarray:
    """65-way cell softmax cross-entropy (SuperPoint eq. 1-2), with the
    corner cells up-weighted to balance the dustbin majority."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    is_corner = labels < 64
    n_pos = jnp.maximum(is_corner.sum(), 1)
    n_neg = jnp.maximum((~is_corner).sum(), 1)
    return (
        jnp.where(is_corner, nll, 0.0).sum() / n_pos
        + jnp.where(~is_corner, nll, 0.0).sum() / n_neg
    )


def descriptor_loss(
    desc0: jnp.ndarray,  # (B, hc, wc, D) L2-normalized cell descriptors
    desc1: jnp.ndarray,
    Hms: jnp.ndarray,  # (B, 3, 3) homography image0 -> image1
    H: int,
    W: int,
    pos_margin: float = 1.0,
    neg_margin: float = 0.2,
    neg_weight: float = 0.25,
) -> jnp.ndarray:
    """Dense hinge loss over all cell pairs (SuperPoint eq. 4): cells
    whose centers correspond under H within 8 px are positives."""
    from mlis_tpu.train.matcher_trainer import apply_homography

    B, hc, wc, D = desc0.shape
    centers_y, centers_x = jnp.meshgrid(
        jnp.arange(hc) * 8.0 + 3.5, jnp.arange(wc) * 8.0 + 3.5, indexing="ij"
    )
    centers = jnp.stack(
        [centers_x.ravel(), centers_y.ravel()], axis=-1
    )  # (hc*wc, 2)

    def per_image(d0, d1, Hm):
        warped = apply_homography(Hm, centers)  # centers of img0 in img1
        dist = jnp.linalg.norm(
            warped[:, None, :] - centers[None, :, :], axis=-1
        )
        s = (dist <= 8.0).astype(jnp.float32)
        # out-of-view centers have no correspondence
        in_view = (
            (warped[:, 0] >= 0)
            & (warped[:, 0] <= W - 1)
            & (warped[:, 1] >= 0)
            & (warped[:, 1] <= H - 1)
        ).astype(jnp.float32)
        s = s * in_view[:, None]
        dot = (
            d0.reshape(-1, D) @ d1.reshape(-1, D).T
        )  # (cells, cells) one GEMM
        pos = s * jnp.maximum(0.0, pos_margin - dot)
        neg = (1.0 - s) * jnp.maximum(0.0, dot - neg_margin)
        n_pos = jnp.maximum(s.sum(), 1.0)
        n_neg = jnp.maximum((1.0 - s).sum(), 1.0)
        return pos.sum() / n_pos + neg_weight * neg.sum() / n_neg

    return jax.vmap(per_image)(desc0, desc1, Hms).mean()


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

class SuperPointTrainer:
    """Joint detector (synthetic corners) + descriptor (homography pairs)
    training of models/superpoint.SuperPointNet."""

    def __init__(
        self,
        sp,  # models.superpoint.SuperPoint
        image_hw: Tuple[int, int],
        learning_rate=1e-3,
        desc_weight: float = 1.0,
        max_corner_jitter: float = 0.15,
        seed: int = 0,
        optimizer: optax.GradientTransformation | None = None,
    ):
        self.sp = sp
        self.image_hw = (int(image_hw[0]), int(image_hw[1]))
        self.desc_weight = float(desc_weight)
        self.max_corner_jitter = float(max_corner_jitter)
        self.optimizer = optimizer or optax.chain(
            optax.clip_by_global_norm(1.0), optax.adam(learning_rate)
        )
        sp.init_params(self.image_hw)
        self.opt_state = self.optimizer.init(sp.params)
        self._key = jax.random.PRNGKey(seed)
        self._chunk = {}

    def _raw_head_apply(self):
        """Apply returning RAW detector logits (B, hc, wc, 65) and the
        cell descriptor map — the net's public apply folds the softmax,
        so rebuild the head output from the module's intermediates."""
        sp_net = self.sp.net

        def apply(params, imgs):
            # capture the detector head's pre-softmax output
            _, inter = sp_net.apply(
                params, imgs, capture_intermediates=lambda m, n: True
            )
            inter = inter["intermediates"]
            logits = inter["det_out"]["__call__"][0]
            desc = inter["desc_out"]["__call__"][0]
            desc = desc.astype(jnp.float32)
            desc = desc / (
                jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8
            )
            return logits, desc

        return apply

    def _make_step_fn(self, batch_size: int):
        from mlis_tpu.train.matcher_trainer import (
            random_homography,
            synthetic_textures,
            warp_image,
        )

        H, W = self.image_hw
        apply = self._raw_head_apply()
        desc_w = self.desc_weight
        jitter = self.max_corner_jitter

        def step(params, opt_state, key):
            k_shape, k_tex, k_hom = jax.random.split(key, 3)
            # detector batch: synthetic shapes with exact corners
            shape_imgs, corners, cvalid = render_shapes(
                k_shape, batch_size, H, W
            )
            labels = corner_cell_labels(corners, cvalid, H, W)
            # descriptor batch: textured scenes + shapes, homography pairs
            tex = synthetic_textures(k_tex, batch_size, H, W)
            mix = 0.5 * tex + 0.5 * shape_imgs
            hkeys = jax.random.split(k_hom, batch_size)
            Hms = jax.vmap(
                lambda k: random_homography(k, H, W, jitter)
            )(hkeys)
            warped = jax.vmap(warp_image)(mix, Hms)

            def loss_fn(p):
                logits, _ = apply(p, shape_imgs[..., None])
                det = detector_loss(logits, labels)
                _, d0 = apply(p, mix[..., None])
                _, d1 = apply(p, warped[..., None])
                desc = descriptor_loss(d0, d1, Hms, H, W)
                return det + desc_w * desc, (det, desc)

            (loss, (det, desc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, det, desc

        return step

    def train_chunk(self, steps: int, batch_size: int = 8) -> np.ndarray:
        """`steps` joint steps as one scanned dispatch; returns the
        (steps, 3) [total, detector, descriptor] loss trace."""
        cache_key = (steps, batch_size)
        if cache_key not in self._chunk:
            step_fn = self._make_step_fn(batch_size)

            def chunk(params, opt_state, key):
                def body(carry, i):
                    p, o = carry
                    p, o, loss, det, desc = step_fn(
                        p, o, jax.random.fold_in(key, i)
                    )
                    return (p, o), jnp.stack([loss, det, desc])

                (p, o), traces = jax.lax.scan(
                    body, (params, opt_state), jnp.arange(steps)
                )
                return p, o, traces

            self._chunk[cache_key] = jax.jit(chunk, donate_argnums=(0, 1))
        self._key, sub = jax.random.split(self._key)
        params, self.opt_state, traces = self._chunk[cache_key](
            self.sp.params, self.opt_state, sub
        )
        self.sp.params = params
        return np.asarray(traces)

    # -- evaluation ---------------------------------------------------------
    def corner_metrics(
        self, key=None, n: int = 8, dist_px: float = 4.0
    ) -> dict:
        """Detector quality on fresh synthetic shapes: precision/recall of
        detected keypoints against the exact corner GT."""
        key = key if key is not None else jax.random.PRNGKey(4242)
        H, W = self.image_hw
        imgs, corners, cvalid = render_shapes(key, n, H, W)
        kp = self.sp.detect(np.asarray(imgs)[..., None])
        coords = np.asarray(kp.coords)
        mask = np.asarray(kp.mask)
        corners = np.asarray(corners)
        hits = 0
        n_gt = 0
        n_det = int(mask.sum())
        matched_det = 0
        for b in range(n):
            det = coords[b][mask[b]]
            gt = corners[b]
            n_gt += len(gt)
            if len(det) == 0:
                continue
            d = np.linalg.norm(gt[:, None, :] - det[None, :, :], axis=-1)
            hits += int((d.min(axis=1) <= dist_px).sum())
            matched_det += int((d.min(axis=0) <= dist_px).sum())
        return {
            "corner_recall": hits / max(n_gt, 1),
            "detector_precision": matched_det / max(n_det, 1),
            "n_detections": n_det,
            "n_gt": n_gt,
        }

    def repeatability(
        self, key=None, n: int = 8, dist_px: float = 3.0
    ) -> float:
        """Detector repeatability under homography warps of textured
        scenes (the classic detector metric): fraction of keypoints in
        the warped view that land within dist_px of an H-projected
        keypoint from the original view."""
        from mlis_tpu.train.matcher_trainer import (
            apply_homography,
            random_homography,
            synthetic_textures,
            warp_image,
        )

        key = key if key is not None else jax.random.PRNGKey(777)
        H, W = self.image_hw
        k_img, k_hom = jax.random.split(key)
        imgs = synthetic_textures(k_img, n, H, W)
        Hms = jax.vmap(
            lambda k: random_homography(k, H, W, self.max_corner_jitter)
        )(jax.random.split(k_hom, n))
        warped = jax.vmap(warp_image)(imgs, Hms)
        kp0 = self.sp.detect(np.asarray(imgs)[..., None])
        kp1 = self.sp.detect(np.asarray(warped)[..., None])
        proj = jax.vmap(apply_homography)(Hms, kp0.coords)
        proj, c1 = np.asarray(proj), np.asarray(kp1.coords)
        m0, m1 = np.asarray(kp0.mask), np.asarray(kp1.mask)
        hits = total = 0
        for b in range(n):
            p = proj[b][m0[b]]
            in_view = (
                (p[:, 0] >= 0) & (p[:, 0] <= W - 1)
                & (p[:, 1] >= 0) & (p[:, 1] <= H - 1)
            )
            p = p[in_view]
            q = c1[b][m1[b]]
            if len(p) == 0 or len(q) == 0:
                continue
            d = np.linalg.norm(p[:, None] - q[None, :], axis=-1)
            hits += int((d.min(axis=1) <= dist_px).sum())
            total += len(p)
        return hits / max(total, 1)

    def save_checkpoint(self, path: str) -> None:
        from mlis_tpu.models.weights import save_params_npz

        save_params_npz(path, superpoint=self.sp.params["params"])
