"""ResNet-50 backbone in Flax (MixVPR's feature extractor; also the
reference's last-resort VPR fallback — place_recognition.py:248-306).

TPU notes: NHWC layout, bfloat16 activations, float32 batch-norm stats.
Inference-mode batch norm (running stats are parameters; no mutable state)
— this framework runs the backbone frozen, as the reference does.
`crop_stage` mirrors MixVPR's truncation of ResNet-50 after layer 3
(1024 channels at stride 16).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    width: int = 64
    crop_stage: int = 4  # 4 = full network; 3 = stop after layer3 (MixVPR)
    dtype: Any = jnp.bfloat16

    @staticmethod
    def resnet50(**kw) -> "ResNetConfig":
        return ResNetConfig(**kw)

    @staticmethod
    def tiny_test(**kw) -> "ResNetConfig":
        return ResNetConfig(stage_sizes=(1, 1), width=8, crop_stage=2, **kw)


class FrozenBatchNorm(nn.Module):
    """Inference-only batch norm: y = (x - mean) / sqrt(var + eps) * g + b."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = (scale * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        return x * inv + (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(
            x.dtype
        )


class Bottleneck(nn.Module):
    features: int
    strides: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        needs_proj = x.shape[-1] != self.features * 4 or self.strides != 1
        residual = x
        y = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = FrozenBatchNorm(self.features * 4, name="bn3")(y)
        if needs_proj:
            residual = nn.Conv(
                self.features * 4,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = FrozenBatchNorm(self.features * 4, name="downsample_bn")(
                residual
            )
        return nn.relu(y + residual)


class ResNet(nn.Module):
    cfg: ResNetConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) preprocessed float -> (B, h, w, C) feature map."""
        c = self.cfg
        x = nn.Conv(
            c.width,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=c.dtype,
            name="stem_conv",
        )(images.astype(c.dtype))
        x = FrozenBatchNorm(c.width, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for stage, n_blocks in enumerate(c.stage_sizes[: c.crop_stage]):
            feats = c.width * (2**stage)
            for b in range(n_blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                x = Bottleneck(
                    feats, strides, c.dtype, name=f"layer{stage + 1}_{b}"
                )(x)
        return x


def global_avg_pool(feat: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(feat.astype(jnp.float32), axis=(1, 2))


def init_resnet(cfg: ResNetConfig, image_size: Tuple[int, int], seed: int = 0):
    model = ResNet(cfg)
    dummy = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), dummy)
    return model, params
