"""SuperPoint keypoint detector + descriptor in Flax, fully batched.

The reference runs SuperPoint through torch/CUDA inside LightGlue
(geometric_verification.py:216-242: max 2048 keypoints, detection
threshold 0.001). TPU re-design: the VGG encoder + detector/descriptor
heads are standard convs; keypoint selection is reformulated for static
shapes — max-pool NMS, then one global top-K over the heatmap instead
of data-dependent threshold filtering. Scores below the detection
threshold are masked out of the validity mask rather than dropped, so
every image yields exactly (K, 2) coordinates + a boolean mask.

Descriptors are sampled at keypoint locations with bilinear interpolation
from the 1/8-resolution descriptor map, L2-normalized.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SuperPointConfig:
    channels: Tuple[int, ...] = (64, 64, 128, 128)
    descriptor_dim: int = 256
    max_keypoints: int = 2048
    detection_threshold: float = 0.001
    nms_radius: int = 4
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny_test(**kw) -> "SuperPointConfig":
        kw.setdefault("channels", (8, 8, 16, 16))
        kw.setdefault("descriptor_dim", 32)
        kw.setdefault("max_keypoints", 128)
        return SuperPointConfig(**kw)


class Keypoints(NamedTuple):
    coords: jnp.ndarray  # (B, K, 2) xy pixel coords
    scores: jnp.ndarray  # (B, K)
    descriptors: jnp.ndarray  # (B, K, D) L2-normalized
    mask: jnp.ndarray  # (B, K) bool — above-threshold keypoints


def _vgg_block(x, ch, dtype, name_prefix, n=2):
    for i in range(n):
        x = nn.Conv(ch, (3, 3), padding="SAME", dtype=dtype, name=f"{name_prefix}_{i}")(x)
        x = nn.relu(x)
    return x


class SuperPointNet(nn.Module):
    cfg: SuperPointConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images: (B, H, W, 1) grayscale [0,1]. H, W divisible by 8.

        Returns (heatmap (B, H, W), desc_map (B, H/8, W/8, D))."""
        c = self.cfg
        x = images.astype(c.dtype)
        x = _vgg_block(x, c.channels[0], c.dtype, "conv1")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _vgg_block(x, c.channels[1], c.dtype, "conv2")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _vgg_block(x, c.channels[2], c.dtype, "conv3")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _vgg_block(x, c.channels[3], c.dtype, "conv4")

        # detector head: 65 channels = 8x8 cell + dustbin
        det = nn.Conv(256, (3, 3), padding="SAME", dtype=c.dtype, name="det_conv")(x)
        det = nn.relu(det)
        det = nn.Conv(65, (1, 1), dtype=c.dtype, name="det_out")(det)
        prob = jax.nn.softmax(det.astype(jnp.float32), axis=-1)[..., :64]
        B, hc, wc, _ = prob.shape
        heat = prob.reshape(B, hc, wc, 8, 8)
        heat = heat.transpose(0, 1, 3, 2, 4).reshape(B, hc * 8, wc * 8)

        # descriptor head
        desc = nn.Conv(256, (3, 3), padding="SAME", dtype=c.dtype, name="desc_conv")(x)
        desc = nn.relu(desc)
        desc = nn.Conv(c.descriptor_dim, (1, 1), dtype=c.dtype, name="desc_out")(desc)
        desc = desc.astype(jnp.float32)
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
        return heat, desc


@functools.partial(jax.jit, static_argnames=("radius",))
def nms_heatmap(heat: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
    """Keep local maxima: zero scores that are not the max in a
    (2r+1)^2 window. (B, H, W) -> (B, H, W)."""
    w = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        heat,
        -jnp.inf,
        jax.lax.max,
        (1, w, w),
        (1, 1, 1),
        "SAME",
    )
    return jnp.where(heat >= pooled, heat, 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_keypoints(heat: jnp.ndarray, k: int, threshold: float):
    """(B, H, W) -> coords (B, K, 2) xy, scores (B, K), mask (B, K)."""
    B, H, W = heat.shape
    flat = heat.reshape(B, H * W)
    scores, idx = jax.lax.top_k(flat, k)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    coords = jnp.stack([xs, ys], axis=-1)
    mask = scores > threshold
    return coords, scores, mask


@jax.jit
def sample_descriptors(
    desc_map: jnp.ndarray,  # (B, hc, wc, D) at 1/8 resolution
    coords: jnp.ndarray,  # (B, K, 2) full-res xy
) -> jnp.ndarray:
    """Bilinear sampling of descriptors at keypoint locations."""
    B, hc, wc, D = desc_map.shape
    # map pixel coords to descriptor-grid coords (cell centers at 8i+3.5)
    gx = jnp.clip((coords[..., 0] - 3.5) / 8.0, 0, wc - 1)
    gy = jnp.clip((coords[..., 1] - 3.5) / 8.0, 0, hc - 1)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = jnp.minimum(x0 + 1, wc - 1)
    y1 = jnp.minimum(y0 + 1, hc - 1)
    wx = gx - x0
    wy = gy - y0

    def gather(b_map, yy, xx):
        return b_map[yy.astype(jnp.int32), xx.astype(jnp.int32)]

    def per_image(m, x0_, x1_, y0_, y1_, wx_, wy_):
        d00 = gather(m, y0_, x0_)
        d01 = gather(m, y0_, x1_)
        d10 = gather(m, y1_, x0_)
        d11 = gather(m, y1_, x1_)
        return (
            d00 * ((1 - wx_) * (1 - wy_))[..., None]
            + d01 * (wx_ * (1 - wy_))[..., None]
            + d10 * ((1 - wx_) * wy_)[..., None]
            + d11 * (wx_ * wy_)[..., None]
        )

    out = jax.vmap(per_image)(desc_map, x0, x1, y0, y1, wx, wy)
    return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-8)


class SuperPoint:
    """Batched detector: uint8/float grayscale images -> fixed-K keypoints."""

    def __init__(self, cfg: SuperPointConfig | None = None, seed: int = 0):
        self.cfg = cfg or SuperPointConfig()
        self.net = SuperPointNet(self.cfg)
        self._params = None
        self._seed = seed
        self._jit_detect = None

    def init_params(self, image_hw: Tuple[int, int]):
        if self._params is None:
            dummy = jnp.zeros((1, image_hw[0], image_hw[1], 1), jnp.float32)
            self._params = self.net.init(jax.random.PRNGKey(self._seed), dummy)
        return self._params

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, p):
        self._params = p
        self._jit_detect = None

    def detect(self, images: jnp.ndarray) -> Keypoints:
        """(B, H, W, 1) float grayscale in [0,1] -> Keypoints (static K)."""
        self.init_params(images.shape[1:3])
        if self._jit_detect is None:
            cfg = self.cfg

            def _detect(params, imgs):
                heat, desc_map = self.net.apply(params, imgs)
                heat = nms_heatmap(heat, cfg.nms_radius)
                coords, scores, mask = topk_keypoints(
                    heat, cfg.max_keypoints, cfg.detection_threshold
                )
                descs = sample_descriptors(desc_map, coords)
                return Keypoints(coords, scores, descs, mask)

            self._jit_detect = jax.jit(_detect)
        return self._jit_detect(self._params, images)
