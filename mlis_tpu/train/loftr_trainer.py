"""Homography self-supervision for the (lite) LoFTR dense matcher.

The reference consumes kornia's pretrained LoFTR checkpoint
(geometric_verification.py:469-526); in this zero-egress environment we
train our linear-attention LoFTR (models/loftr.py::LoFTRNet) the same way
the official model was supervised, but on procedural textures generated
ON DEVICE (zero upload through the TPU tunnel — the same recipe that
trained the shipped LightGlue checkpoint, train/matcher_trainer.py):

  * sample a random homography, warp the texture -> an exact dense GT;
  * COARSE supervision (LoFTR paper Sec. 3.4): every 1/8-grid cell of
    image0 whose center projects inside image1 has a known target cell;
    the loss is the NLL of that target under the dual-softmax matching
    distribution over coarse features — identical normalization to
    inference-time `coarse_match` (l2 + temperature);
  * FINE supervision: for supervisable cells (GT point within the
    fine-window's +-4 px reach of the target cell center), the
    spatial-expectation refinement (`fine_refine`) must land on the
    exact projected point — an L2 loss in pixel units. This is the only
    gradient path into the backbone's fine 1/2-res features.

Both streams train jointly end-to-end (backbone + coarse transformer);
there is no frozen front end — LoFTR is detector-free.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mlis_tpu.models.loftr import LoFTR, fine_refine
from mlis_tpu.train.matcher_trainer import (
    apply_homography,
    random_homography,
    render_layered_pair,
    synthetic_textures,
    warp_image,
)


def coarse_gt_cells(
    Hm: jnp.ndarray, hc: int, wc: int, image_hw: Tuple[int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ground-truth coarse assignment for one homography.

    Cell centers of image0 (full-res px x = 8*cx + 3.5 — the lite
    matcher's grid convention, models/loftr.py match_batch) are projected
    through Hm into image1. Returns
      idx1   (N,) int32: target flat cell index in image1 per image0 cell,
      valid  (N,) bool:  center lands inside image1,
      target (N, 2) f32: the exact projected pixel (fine supervision GT).
    """
    H, W = image_hw
    cy, cx = jnp.meshgrid(jnp.arange(hc), jnp.arange(wc), indexing="ij")
    centers = jnp.stack(
        [cx.reshape(-1) * 8.0 + 3.5, cy.reshape(-1) * 8.0 + 3.5], axis=-1
    )  # (N, 2) xy
    proj = apply_homography(Hm, centers)  # (N, 2) in image1 px
    tx = jnp.round((proj[:, 0] - 3.5) / 8.0).astype(jnp.int32)
    ty = jnp.round((proj[:, 1] - 3.5) / 8.0).astype(jnp.int32)
    inb = (
        (proj[:, 0] >= 0.0) & (proj[:, 0] <= W - 1.0)
        & (proj[:, 1] >= 0.0) & (proj[:, 1] <= H - 1.0)
        & (tx >= 0) & (tx < wc) & (ty >= 0) & (ty < hc)
    )
    idx1 = jnp.clip(ty, 0, hc - 1) * wc + jnp.clip(tx, 0, wc - 1)
    return idx1, inb, proj


def coarse_gt_cells_parallax(
    lid0: jnp.ndarray,  # (H, W) int32 per-pixel layer in view 0
    lid1: jnp.ndarray,  # (H, W) int32 per-pixel layer in view 1 (-1=none)
    Hs: jnp.ndarray,  # (L, 3, 3) per-layer plane-induced homographies
    hc: int,
    wc: int,
    image_hw: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense coarse GT for a layered SE(3) pair (render_layered_pair):
    each image0 cell center projects through ITS OWN layer's plane
    homography and is supervisable only where that layer is on top
    (unoccluded, in view) at the projection — the dense analogue of
    matcher_trainer.gt_assignment_parallax. Same returns as
    coarse_gt_cells."""
    H, W = image_hw
    cy, cx = jnp.meshgrid(jnp.arange(hc), jnp.arange(wc), indexing="ij")
    centers = jnp.stack(
        [cx.reshape(-1) * 8.0 + 3.5, cy.reshape(-1) * 8.0 + 3.5], axis=-1
    )  # (N, 2) xy
    xi0 = jnp.clip(jnp.round(centers[:, 0]).astype(jnp.int32), 0, W - 1)
    yi0 = jnp.clip(jnp.round(centers[:, 1]).astype(jnp.int32), 0, H - 1)
    layer = lid0[yi0, xi0]  # (N,)
    proj = jax.vmap(lambda Hm, p: apply_homography(Hm, p[None])[0])(
        Hs[layer], centers
    )  # (N, 2) in image1 px
    tx = jnp.round((proj[:, 0] - 3.5) / 8.0).astype(jnp.int32)
    ty = jnp.round((proj[:, 1] - 3.5) / 8.0).astype(jnp.int32)
    inb = (
        (proj[:, 0] >= 0.0) & (proj[:, 0] <= W - 1.0)
        & (proj[:, 1] >= 0.0) & (proj[:, 1] <= H - 1.0)
        & (tx >= 0) & (tx < wc) & (ty >= 0) & (ty < hc)
    )
    xi1 = jnp.clip(jnp.round(proj[:, 0]).astype(jnp.int32), 0, W - 1)
    yi1 = jnp.clip(jnp.round(proj[:, 1]).astype(jnp.int32), 0, H - 1)
    visible = lid1[yi1, xi1] == layer  # occlusion-aware
    idx1 = jnp.clip(ty, 0, hc - 1) * wc + jnp.clip(tx, 0, wc - 1)
    return idx1, inb & visible, proj


def loftr_loss(
    t0: jnp.ndarray,  # (B, N, D) coarse features image0
    t1: jnp.ndarray,  # (B, N, D)
    f0: jnp.ndarray,  # (B, hf, wf, Df) fine features
    f1: jnp.ndarray,
    idx1: jnp.ndarray,  # (B, N) GT target cells
    valid: jnp.ndarray,  # (B, N)
    target_px: jnp.ndarray,  # (B, N, 2)
    grid_hw: Tuple[int, int],
    temperature: float,
    fine_window: int,
    fine_weight: float = 0.25,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(loss, n_gt). Coarse NLL under dual-softmax + fine L2 (px units)."""
    hc, wc = grid_hw
    n0 = t0 / (jnp.linalg.norm(t0.astype(jnp.float32), axis=-1, keepdims=True) + 1e-8)
    n1 = t1 / (jnp.linalg.norm(t1.astype(jnp.float32), axis=-1, keepdims=True) + 1e-8)
    sim = jnp.einsum(
        "bnd,bmd->bnm", n0.astype(jnp.float32), n1.astype(jnp.float32)
    ) / temperature
    # dual-softmax probability of the GT cell (log-space for stability)
    logp = jax.nn.log_softmax(sim, axis=2) + jax.nn.log_softmax(sim, axis=1)
    gt_logp = jnp.take_along_axis(logp, idx1[..., None], axis=2)[..., 0]
    n_gt = jnp.maximum(valid.sum(), 1)
    coarse = -(gt_logp * valid).sum() / n_gt

    # fine refinement on the GT cells: start from the TARGET cell center
    # (teacher forcing — inference starts from the predicted cell) and
    # require the soft-argmax to recover the exact projected point
    tx = (idx1 % wc).astype(jnp.float32)
    ty = (idx1 // wc).astype(jnp.float32)
    fine_xy1 = jnp.stack([tx * 4 + 1.5, ty * 4 + 1.5], axis=-1)  # fine grid
    cy, cx = jnp.meshgrid(jnp.arange(hc), jnp.arange(wc), indexing="ij")
    fine_xy0 = jnp.broadcast_to(
        jnp.stack(
            [cx.reshape(-1) * 4.0 + 1.5, cy.reshape(-1) * 4.0 + 1.5], axis=-1
        )[None],
        fine_xy1.shape,
    )

    def centers(fm, xy):
        def per_image(m, c):
            return m[c[:, 1].astype(jnp.int32), c[:, 0].astype(jnp.int32)]

        return jax.vmap(per_image)(fm.astype(jnp.float32), xy)

    feat0 = centers(f0, fine_xy0)
    refined1 = fine_refine(f1, fine_xy1, feat0, fine_window, 2)
    pred_px = refined1 * 2.0 + 0.5
    # only supervise where the true point is within the window's reach
    # (+- (window//2) fine cells = +-2*(window//2) full-res px per axis)
    reach = 2.0 * (fine_window // 2)
    cell_center = jnp.stack([tx * 8 + 3.5, ty * 8 + 3.5], axis=-1)
    reachable = valid & jnp.all(
        jnp.abs(target_px - cell_center) <= reach, axis=-1
    )
    err2 = jnp.sum((pred_px - target_px) ** 2, axis=-1)
    fine = (err2 * reachable).sum() / jnp.maximum(reachable.sum(), 1)
    return coarse + fine_weight * fine, n_gt


class LoFTRTrainer:
    """End-to-end homography self-supervision for a lite LoFTR instance."""

    def __init__(
        self,
        matcher: LoFTR,
        image_hw: Tuple[int, int],
        learning_rate=1e-4,  # float or optax schedule
        max_corner_jitter: float = 0.15,
        fine_weight: float = 0.25,
        seed: int = 0,
        optimizer: optax.GradientTransformation | None = None,
        pair_mode: str = "homography",  # or "parallax": layered SE(3)
        # pairs with occlusion-aware dense GT (render_layered_pair +
        # coarse_gt_cells_parallax — the v2 GT scene's distribution)
    ):
        H, W = int(image_hw[0]), int(image_hw[1])
        if H % 8 or W % 8:
            raise ValueError("LoFTR training size must be a multiple of 8")
        if matcher.cfg.official:
            raise ValueError(
                "official-architecture LoFTR is inference-only (its net "
                "returns DenseMatches, not feature maps); train the lite "
                "LoFTRNet (LoFTRConfig(official=False)) instead"
            )
        self.matcher = matcher
        self.image_hw = (H, W)
        self.pair_mode = pair_mode
        self.max_corner_jitter = float(max_corner_jitter)
        self.fine_weight = float(fine_weight)
        self.optimizer = optimizer or optax.chain(
            optax.clip_by_global_norm(1.0), optax.adam(learning_rate)
        )
        matcher._init(self.image_hw)
        self.opt_state = self.optimizer.init(matcher.params)
        self._key = jax.random.PRNGKey(seed)
        self._chunk = {}

    def _make_step_fn(self):
        matcher = self.matcher
        cfg = matcher.cfg
        H, W = self.image_hw
        jitter = self.max_corner_jitter
        fine_weight = self.fine_weight

        parallax = self.pair_mode == "parallax"

        def step(params, opt_state, images, key):
            B = images.shape[0]
            hkeys = jax.random.split(key, B)
            if parallax:
                # images arg only sets the batch size: the layered pairs
                # synthesize their own textures (fresh every step)
                img0, warped, lid0, lid1, Hs_all = jax.vmap(
                    lambda k: render_layered_pair(k, H, W)
                )(hkeys)
            else:
                Hms = jax.vmap(
                    lambda k: random_homography(k, H, W, jitter)
                )(hkeys)
                img0 = images
                warped = jax.vmap(warp_image)(images, Hms)

            def loss_fn(p):
                t0, t1, f0, f1, (hc, wc) = matcher.net.apply(
                    p, img0[..., None], warped[..., None]
                )
                if parallax:
                    idx1, valid, target = jax.vmap(
                        lambda l0, l1, Hl: coarse_gt_cells_parallax(
                            l0, l1, Hl, hc, wc, (H, W)
                        )
                    )(lid0, lid1, Hs_all)
                else:
                    idx1, valid, target = jax.vmap(
                        lambda Hm: coarse_gt_cells(Hm, hc, wc, (H, W))
                    )(Hms)
                return loftr_loss(
                    t0, t1, f0, f1, idx1, valid, target,
                    (hc, wc), cfg.temperature, cfg.fine_window, fine_weight,
                )

            (loss, n_gt), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, n_gt

        return step

    def train_chunk(self, steps: int, batch_size: int = 4) -> np.ndarray:
        """`steps` optimizer steps as ONE device dispatch (lax.scan) with
        on-device synthetic textures. Returns the (steps,) loss trace."""
        key_shape = (steps, batch_size)
        if key_shape not in self._chunk:
            step_fn = self._make_step_fn()
            H, W = self.image_hw

            def chunk(params, opt_state, key):
                def body(carry, i):
                    p, o = carry
                    k = jax.random.fold_in(key, i)
                    k_img, k_step = jax.random.split(k)
                    images = synthetic_textures(k_img, batch_size, H, W)
                    p, o, loss, _ = step_fn(p, o, images, k_step)
                    return (p, o), loss

                (p, o), losses = jax.lax.scan(
                    body, (params, opt_state), jnp.arange(steps)
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
        self.matcher.save_weights(path)

    def parallax_match_metrics(
        self, n_pairs: int = 8, key=None, threshold_px: float = 4.0
    ) -> dict:
        """Held-out diagnostics on fresh LAYERED SE(3) pairs through the
        full inference path: a prediction is correct when it lands within
        threshold_px of the point projected through its OWN layer's
        homography AND that layer is visible (on top) there."""
        key = key if key is not None else jax.random.PRNGKey(991)
        H, W = self.image_hw
        img0, img1, lid0, lid1, Hs_all = jax.vmap(
            lambda k: render_layered_pair(k, H, W)
        )(jax.random.split(key, n_pairs))
        m = self.matcher.match_batch(img0[..., None], img1[..., None])

        def per_image(k0, l0, l1, Hs):
            xi = jnp.clip(jnp.round(k0[:, 0]).astype(jnp.int32), 0, W - 1)
            yi = jnp.clip(jnp.round(k0[:, 1]).astype(jnp.int32), 0, H - 1)
            layer = l0[yi, xi]
            proj = jax.vmap(
                lambda Hm, p: apply_homography(Hm, p[None])[0]
            )(Hs[layer], k0)
            xp = jnp.clip(jnp.round(proj[:, 0]).astype(jnp.int32), 0, W - 1)
            yp = jnp.clip(jnp.round(proj[:, 1]).astype(jnp.int32), 0, H - 1)
            vis = (
                (proj[:, 0] >= 0) & (proj[:, 0] <= W - 1)
                & (proj[:, 1] >= 0) & (proj[:, 1] <= H - 1)
                & (l1[yp, xp] == layer)
            )
            return proj, vis

        proj, vis = jax.vmap(per_image)(m.kpts0, lid0, lid1, Hs_all)
        err = jnp.linalg.norm(m.kpts1 - proj, axis=-1)
        correct = m.valid & vis & (err <= threshold_px)
        hc, wc = H // 8, W // 8
        _, gt_vis, _ = jax.vmap(
            lambda l0, l1, Hl: coarse_gt_cells_parallax(
                l0, l1, Hl, hc, wc, (H, W)
            )
        )(lid0, lid1, Hs_all)
        n_pred = jnp.maximum((m.valid & vis).sum(), 1)
        n_vis = jnp.maximum(gt_vis.sum(), 1)
        return {
            "precision": float(correct.sum() / n_pred),
            "recall": float(correct.sum() / n_vis),
            "n_pred": int((m.valid & vis).sum()),
            "n_gt": int(gt_vis.sum()),
        }

    def match_metrics(
        self, images: np.ndarray, key=None, threshold_px: float = 4.0
    ) -> dict:
        """Held-out diagnostics through the FULL inference path
        (match_batch: coarse dual-softmax -> mutual top-M -> fine refine):
        precision = predicted matches within threshold_px of the GT
        projection; recall = correct predictions / visible coarse cells.
        In parallax mode, evaluates on the training pair distribution
        (layered SE(3) pairs) instead."""
        if self.pair_mode == "parallax":
            return self.parallax_match_metrics(
                n_pairs=int(len(images)), key=key, threshold_px=threshold_px
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
        m = self.matcher.match_batch(imgs[..., None], warped[..., None])
        proj = jax.vmap(apply_homography)(Hms, m.kpts0)
        inb = (
            (proj[..., 0] >= 0) & (proj[..., 0] <= W - 1)
            & (proj[..., 1] >= 0) & (proj[..., 1] <= H - 1)
        )
        err = jnp.linalg.norm(m.kpts1 - proj, axis=-1)
        correct = m.valid & inb & (err <= threshold_px)
        hc, wc = H // 8, W // 8
        _, vis, _ = jax.vmap(
            lambda Hm: coarse_gt_cells(Hm, hc, wc, (H, W))
        )(Hms)
        n_pred = jnp.maximum((m.valid & inb).sum(), 1)
        n_vis = jnp.maximum(vis.sum(), 1)
        return {
            "precision": float(correct.sum() / n_pred),
            "recall": float(correct.sum() / n_vis),
            "n_pred": int((m.valid & inb).sum()),
            "n_gt": int(vis.sum()),
        }
