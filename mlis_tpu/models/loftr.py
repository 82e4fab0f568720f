"""LoFTR: detector-free coarse-to-fine dense matching, batched for TPU.

Reference slot (geometric_verification.py:424-526): kornia LoFTR with
resize-to-multiple-of-8 and keypoint rescaling. TPU re-design:
  * conv backbone yields coarse (1/8) and fine (1/2) feature maps;
  * the coarse transformer uses linear (kernelized) attention — the actual
    LoFTR formulation — which is O(N d^2) matmuls, MXU-friendly, and avoids
    materializing the (Hc*Wc)^2 score matrix;
  * coarse matching is dual-softmax + mutual-max, then a static top-M
    selection replaces dynamic thresholding;
  * fine refinement gathers a 5x5 window around each coarse match in the
    fine map of image2 and soft-argmaxes the correlation with the center
    feature of image1 — one batched gather + GEMM.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mlis_tpu.gating.verification import BaseFeatureMatcher
from mlis_tpu.ops.image import to_grayscale


@dataclasses.dataclass(frozen=True)
class LoFTRConfig:
    coarse_dim: int = 128
    fine_dim: int = 64
    depth: int = 4
    num_heads: int = 4
    temperature: float = 0.1
    match_threshold: float = 0.2
    max_matches: int = 1024
    fine_window: int = 5
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny_test(**kw) -> "LoFTRConfig":
        kw.setdefault("coarse_dim", 32)
        kw.setdefault("fine_dim", 16)
        kw.setdefault("depth", 1)
        kw.setdefault("num_heads", 2)
        kw.setdefault("max_matches", 64)
        return LoFTRConfig(**kw)


class DenseMatches(NamedTuple):
    kpts0: jnp.ndarray  # (B, M, 2) xy pixels in image0
    kpts1: jnp.ndarray  # (B, M, 2) refined xy pixels in image1
    scores: jnp.ndarray  # (B, M)
    valid: jnp.ndarray  # (B, M)


def _conv_block(x, ch, dtype, name, stride=1):
    x = nn.Conv(ch, (3, 3), strides=(stride, stride), padding="SAME", dtype=dtype, name=name)(x)
    return nn.relu(x)


class LoFTRBackbone(nn.Module):
    cfg: LoFTRConfig

    @nn.compact
    def __call__(self, images):  # (B, H, W, 1)
        c = self.cfg
        x = images.astype(c.dtype)
        x1 = _conv_block(x, 32, c.dtype, "c1a")
        x1 = _conv_block(x1, 32, c.dtype, "c1b", stride=2)  # /2
        fine = nn.Conv(c.fine_dim, (3, 3), padding="SAME", dtype=c.dtype, name="fine_out")(x1)
        x2 = _conv_block(x1, 64, c.dtype, "c2", stride=2)  # /4
        x3 = _conv_block(x2, 128, c.dtype, "c3", stride=2)  # /8
        coarse = nn.Conv(c.coarse_dim, (3, 3), padding="SAME", dtype=c.dtype, name="coarse_out")(x3)
        return coarse, fine


def linear_attention(q, k, v):
    """Kernelized attention: phi(q) (phi(k)^T v) with phi = elu + 1.
    q: (B, S, H, Dh), k/v: (B, T, H, Dh)."""
    qf = jax.nn.elu(q.astype(jnp.float32)) + 1.0
    kf = jax.nn.elu(k.astype(jnp.float32)) + 1.0
    kv = jnp.einsum("bthd,bthe->bhde", kf, v.astype(jnp.float32))
    z = 1.0 / (jnp.einsum("bshd,bhd->bsh", qf, kf.sum(axis=1)) + 1e-6)
    out = jnp.einsum("bshd,bhde,bsh->bshe", qf, kv, z)
    return out


class LinearAttnLayer(nn.Module):
    dim: int
    num_heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x, source):
        B, S, _ = x.shape
        T = source.shape[1]
        Dh = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x).reshape(B, S, self.num_heads, Dh)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(source).reshape(B, T, self.num_heads, Dh)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(source).reshape(B, T, self.num_heads, Dh)
        msg = linear_attention(q, k, v).reshape(B, S, self.dim).astype(self.dtype)
        msg = nn.Dense(self.dim, dtype=self.dtype, name="proj")(msg)
        h = jnp.concatenate([x, msg], axis=-1)
        h = nn.Dense(2 * self.dim, dtype=self.dtype, name="ffn1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(h)
        return x + h


class LoFTRNet(nn.Module):
    cfg: LoFTRConfig

    @nn.compact
    def __call__(self, images0, images1):
        c = self.cfg
        backbone = LoFTRBackbone(c, name="backbone")
        c0, f0 = backbone(images0)
        c1, f1 = backbone(images1)
        B, hc, wc, D = c0.shape
        t0 = c0.reshape(B, hc * wc, D)
        t1 = c1.reshape(B, hc * wc, D)
        for i in range(c.depth):
            t0 = LinearAttnLayer(c.coarse_dim, c.num_heads, c.dtype, name=f"self{i}_0")(t0, t0)
            t1 = LinearAttnLayer(c.coarse_dim, c.num_heads, c.dtype, name=f"self{i}_1")(t1, t1)
            t0n = LinearAttnLayer(c.coarse_dim, c.num_heads, c.dtype, name=f"cross{i}_0")(t0, t1)
            t1 = LinearAttnLayer(c.coarse_dim, c.num_heads, c.dtype, name=f"cross{i}_1")(t1, t0)
            t0 = t0n
        return t0, t1, f0, f1, (hc, wc)


def coarse_match(t0, t1, temperature, threshold, max_matches):
    """Dual-softmax mutual matching over coarse grids -> static top-M."""
    n0 = t0 / (jnp.linalg.norm(t0.astype(jnp.float32), axis=-1, keepdims=True) + 1e-8)
    n1 = t1 / (jnp.linalg.norm(t1.astype(jnp.float32), axis=-1, keepdims=True) + 1e-8)
    sim = jnp.einsum("bnd,bmd->bnm", n0.astype(jnp.float32), n1.astype(jnp.float32))
    sim = sim / temperature
    p = jax.nn.softmax(sim, axis=2) * jax.nn.softmax(sim, axis=1)
    best1 = jnp.argmax(p, axis=2)  # (B, N)
    best0 = jnp.argmax(p, axis=1)  # (B, M)
    n_idx = jnp.arange(p.shape[1])
    mutual = jnp.take_along_axis(best0, best1, axis=1) == n_idx[None]
    conf = jnp.take_along_axis(p, best1[..., None], axis=2)[..., 0]
    conf = jnp.where(mutual & (conf > threshold), conf, 0.0)
    scores, sel = jax.lax.top_k(conf, max_matches)  # (B, M)
    idx1 = jnp.take_along_axis(best1, sel, axis=1)
    return sel, idx1, scores, scores > 0


def fine_refine(f1, coarse_xy1, center_feat0, window: int, scale: int):
    """Refine image-1 positions: correlate f0 center feature against a
    window x window fine-map patch around each coarse location; soft-argmax.

    f1: (B, hf, wf, D); coarse_xy1: (B, M, 2) in fine-grid coords;
    center_feat0: (B, M, D). Returns refined (B, M, 2) in fine-grid coords.
    """
    B, hf, wf, D = f1.shape
    r = window // 2
    offs = jnp.arange(-r, r + 1)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    ox = ox.reshape(-1)
    oy = oy.reshape(-1)  # (W2,)

    gx = jnp.clip(coarse_xy1[..., 0, None] + ox[None, None], 0, wf - 1)
    gy = jnp.clip(coarse_xy1[..., 1, None] + oy[None, None], 0, hf - 1)

    def per_image(fm, gx_, gy_):
        return fm[gy_.astype(jnp.int32), gx_.astype(jnp.int32)]  # (M, W2, D)

    patches = jax.vmap(per_image)(f1.astype(jnp.float32), gx, gy)
    corr = jnp.einsum("bmwd,bmd->bmw", patches, center_feat0.astype(jnp.float32))
    w = jax.nn.softmax(corr / (D**0.5), axis=-1)
    dx = jnp.sum(w * ox[None, None], axis=-1)
    dy = jnp.sum(w * oy[None, None], axis=-1)
    return coarse_xy1 + jnp.stack([dx, dy], axis=-1)


class LoFTR(BaseFeatureMatcher):
    """Batched dense matcher with the reference's resize/rescale contract."""

    def __init__(self, cfg: Optional[LoFTRConfig] = None, seed: int = 0):
        self.cfg = cfg or LoFTRConfig()
        self.net = LoFTRNet(self.cfg)
        self.params = None
        self._seed = seed
        self._jit = {}

    def _init(self, shape):
        if self.params is None:
            d = jnp.zeros((1, *shape, 1), jnp.float32)
            self.params = self.net.init(jax.random.PRNGKey(self._seed), d, d)

    def match_batch(self, images0: jnp.ndarray, images1: jnp.ndarray) -> DenseMatches:
        """(B, H, W, 1) grayscale in [0,1]; H, W multiples of 8."""
        H, W = int(images0.shape[1]), int(images0.shape[2])
        self._init((H, W))
        key = (H, W)
        if key not in self._jit:
            cfg = self.cfg

            def _run(params, im0, im1):
                t0, t1, f0, f1, (hc, wc) = self.net.apply(params, im0, im1)
                sel0, sel1, scores, valid = coarse_match(
                    t0, t1, cfg.temperature, cfg.match_threshold, cfg.max_matches
                )
                # coarse grid coords
                x0 = (sel0 % wc).astype(jnp.float32)
                y0 = (sel0 // wc).astype(jnp.float32)
                x1 = (sel1 % wc).astype(jnp.float32)
                y1 = (sel1 // wc).astype(jnp.float32)
                # fine grid is 1/2 res; coarse is 1/8 -> factor 4
                fine_xy1 = jnp.stack([x1 * 4 + 1.5, y1 * 4 + 1.5], axis=-1)
                fine_xy0 = jnp.stack([x0 * 4 + 1.5, y0 * 4 + 1.5], axis=-1)

                def centers(fm, xy):
                    def per_image(m, c):
                        return m[
                            c[:, 1].astype(jnp.int32), c[:, 0].astype(jnp.int32)
                        ]

                    return jax.vmap(per_image)(fm.astype(jnp.float32), xy)

                feat0 = centers(f0, fine_xy0)
                refined1 = fine_refine(f1, fine_xy1, feat0, cfg.fine_window, 2)
                # to full-res pixels: fine grid stride 2, +0.5 cell center
                kpts0 = (x0 * 8 + 3.5), (y0 * 8 + 3.5)
                kpts0 = jnp.stack(kpts0, axis=-1)
                kpts1 = refined1 * 2.0 + 0.5
                return DenseMatches(kpts0, kpts1, scores, valid)

            self._jit[key] = jax.jit(_run)
        return self._jit[key](self.params, images0, images1)

    def detect_and_match(
        self, image1: np.ndarray, image2: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """uint8 images -> matched point arrays (reference resize contract:
        round down to multiple of 8, rescale keypoints back :469-526)."""
        h, w = image1.shape[:2]
        h8, w8 = (h // 8) * 8, (w // 8) * 8
        g1 = to_grayscale(jnp.asarray(image1)[None], size=(h8, w8))
        g2 = to_grayscale(jnp.asarray(image2)[None], size=(h8, w8))
        m = self.match_batch(g1, g2)
        valid = np.asarray(m.valid[0])
        sx, sy = w / w8, h / h8
        k0 = np.asarray(m.kpts0[0])[valid] * [sx, sy]
        k1 = np.asarray(m.kpts1[0])[valid] * [sx, sy]
        # detector-free method: "detected" keypoints == matched points
        self.last_detector_counts = (len(k0), len(k1))
        return k0, k1, np.asarray(m.scores[0])[valid]
