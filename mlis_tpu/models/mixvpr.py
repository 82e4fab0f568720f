"""MixVPR: ResNet-50 features + MLP-Mixer aggregation -> 4096-d descriptor.

Architecture per the MixVPR paper and the reference's configuration
(place_recognition.py:193-332): ResNet-50 cropped after layer3 (1024
channels, stride 16), 320x320 input -> 20x20 map, L=4 FeatureMixer blocks
over the flattened spatial axis, then channel projection to 1024 and row
projection to 4, flattened to a 4096-d descriptor.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mlis_tpu.models.base import JaxEncoderVPR, fit_descriptor_dim
from mlis_tpu.models.resnet import ResNet, ResNetConfig


class FeatureMixerLayer(nn.Module):
    hw: int
    dtype: Any

    @nn.compact
    def __call__(self, x):  # (B, C, HW)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(x.dtype)
        h = nn.Dense(self.hw, dtype=self.dtype, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.hw, dtype=self.dtype, name="fc2")(h)
        return x + h


class MixVPRHead(nn.Module):
    hw: int
    mix_depth: int = 4
    out_channels: int = 1024
    out_rows: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feat):  # (B, h, w, C)
        B, h, w, C = feat.shape
        x = feat.reshape(B, h * w, C).transpose(0, 2, 1)  # (B, C, HW)
        for i in range(self.mix_depth):
            x = FeatureMixerLayer(self.hw, self.dtype, name=f"mix{i}")(x)
        # channel projection: (B, C, HW) -> (B, out_channels, HW)
        x = x.transpose(0, 2, 1)  # (B, HW, C)
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="channel_proj")(x)
        # row projection over spatial axis -> out_rows
        x = x.transpose(0, 2, 1)  # (B, out_channels, HW)
        x = nn.Dense(self.out_rows, dtype=self.dtype, name="row_proj")(x)
        x = x.reshape(B, self.out_channels * self.out_rows)
        x = x.astype(jnp.float32)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)


class MixVPRModule(nn.Module):
    backbone_cfg: ResNetConfig
    mix_depth: int = 4
    out_channels: int = 1024
    out_rows: int = 4

    @nn.compact
    def __call__(self, images):
        feat = ResNet(self.backbone_cfg, name="backbone")(images)
        hw = feat.shape[1] * feat.shape[2]
        return MixVPRHead(
            hw,
            self.mix_depth,
            self.out_channels,
            self.out_rows,
            self.backbone_cfg.dtype,
            name="aggregator",
        )(feat)


class MixVPR(JaxEncoderVPR):
    """4096-d MixVPR encoder (320x320 input, reference :308-332)."""

    input_size = (320, 320)

    def __init__(
        self,
        descriptor_dim: int = 4096,
        seed: int = 0,
        backbone_cfg: ResNetConfig | None = None,
        input_size=None,
        **kw,
    ):
        super().__init__(descriptor_dim=descriptor_dim, seed=seed)
        if input_size is not None:
            self.input_size = tuple(input_size)
        cfg = backbone_cfg or ResNetConfig(crop_stage=3)
        out_rows = 4
        out_channels = descriptor_dim // out_rows
        self.module = MixVPRModule(cfg, out_channels=out_channels, out_rows=out_rows)
        dummy = jnp.zeros((1, *self.input_size, 3), jnp.float32)
        self.params = self.module.init(jax.random.PRNGKey(seed), dummy)

    def _forward(self, params, images):
        desc = self.module.apply(params, images)
        return fit_descriptor_dim(desc, self.descriptor_dim)

    def load_torch_state_dict(self, state_dict) -> None:
        from mlis_tpu.models.convert import convert_resnet_torch

        backbone = convert_resnet_torch(state_dict, self.params["params"]["backbone"])
        self.params["params"]["backbone"] = backbone
        self._jit_forward = None
