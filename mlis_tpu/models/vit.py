"""Vision Transformer backbone (DINOv2-style) in Flax, TPU-first.

Serves the DINOv2 ViT-B/14 role the reference loads via torch.hub for
SALAD / AnyLoc / CricaVPR (place_recognition.py:413-505, 508-803): patch-14
embedding, cls + optional register tokens, pre-norm blocks with LayerScale,
learned position embeddings with bicubic grid interpolation for variable
input sizes.

Attention runs through the fused Pallas kernel (ops/attention.py) on TPU.
All shapes are static under jit; bfloat16 activations with float32
layernorm/softmax accumulation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mlis_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 14
    pos_grid: int = 37  # pretrain grid (518 / 14 for DINOv2)
    num_register_tokens: int = 0
    layerscale_init: float = 1e-5
    dtype: Any = jnp.bfloat16

    @staticmethod
    def dinov2_vitb14(**kw) -> "ViTConfig":
        return ViTConfig(dim=768, depth=12, num_heads=12, **kw)

    @staticmethod
    def dinov2_vits14(**kw) -> "ViTConfig":
        return ViTConfig(dim=384, depth=12, num_heads=6, **kw)

    @staticmethod
    def tiny_test(**kw) -> "ViTConfig":
        return ViTConfig(dim=64, depth=2, num_heads=2, pos_grid=8, **kw)


class LayerScale(nn.Module):
    dim: int
    init: float

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", lambda k, s: jnp.full(s, self.init, jnp.float32), (self.dim,)
        )
        return x * gamma.astype(x.dtype)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        B, S, _ = x.shape
        Dh = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, S, 3, self.num_heads, Dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = multi_head_attention(q, k, v, use_pallas=self.use_pallas)
        out = out.reshape(B, S, self.dim).astype(self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    cfg: ViTConfig
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(c.dtype)
        h = Attention(c.dim, c.num_heads, c.dtype, self.use_pallas, name="attn")(h)
        x = x + LayerScale(c.dim, c.layerscale_init, name="ls1")(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(c.dtype)
        h = Mlp(c.dim, int(c.dim * c.mlp_ratio), c.dtype, name="mlp")(h)
        x = x + LayerScale(c.dim, c.layerscale_init, name="ls2")(h)
        return x


def _interpolate_pos_embed(pos: jnp.ndarray, grid: Tuple[int, int]) -> jnp.ndarray:
    """Resize the (1, G*G, D) patch position table to an (h, w) grid."""
    G2, D = pos.shape[1], pos.shape[2]
    G = int(round(G2**0.5))
    if (G, G) == grid:
        return pos
    p = pos.reshape(1, G, G, D)
    p = jax.image.resize(p, (1, grid[0], grid[1], D), method="bicubic")
    return p.reshape(1, grid[0] * grid[1], D)


class ViT(nn.Module):
    """DINOv2-style ViT. Input (B, H, W, 3) float (preprocessed); H, W must
    be multiples of patch_size. Returns dict with cls/register/patch tokens.

    `remat=True` rematerializes each block's activations on the backward
    pass (jax.checkpoint) — trades ~30% extra FLOPs for depth-independent
    activation memory during VPR fine-tuning."""

    cfg: ViTConfig
    use_pallas: Optional[bool] = None
    remat: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        B, H, W, _ = images.shape
        gh, gw = H // c.patch_size, W // c.patch_size

        x = nn.Conv(
            c.dim,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            dtype=c.dtype,
            name="patch_embed",
        )(images.astype(c.dtype))
        x = x.reshape(B, gh * gw, c.dim)

        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, c.dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, c.pos_grid * c.pos_grid + 1, c.dim),
        )
        pos_patch = _interpolate_pos_embed(pos[:, 1:], (gh, gw)).astype(c.dtype)
        pos_cls = pos[:, :1].astype(c.dtype)
        x = x + pos_patch
        cls_tok = jnp.broadcast_to(cls.astype(c.dtype) + pos_cls, (B, 1, c.dim))

        toks = [cls_tok]
        n_reg = c.num_register_tokens
        if n_reg:
            reg = self.param(
                "register_tokens",
                nn.initializers.truncated_normal(0.02),
                (1, n_reg, c.dim),
            )
            toks.append(jnp.broadcast_to(reg.astype(c.dtype), (B, n_reg, c.dim)))
        toks.append(x)
        x = jnp.concatenate(toks, axis=1)

        block_cls = nn.remat(Block) if self.remat else Block
        for i in range(c.depth):
            x = block_cls(c, self.use_pallas, name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)

        return {
            "cls": x[:, 0],
            "registers": x[:, 1 : 1 + n_reg],
            "patches": x[:, 1 + n_reg :],
            "grid": (gh, gw),
        }


def init_vit(
    cfg: ViTConfig, image_size: Tuple[int, int], seed: int = 0, use_pallas=None
):
    """Convenience: build module + params for a given input size."""
    model = ViT(cfg, use_pallas=use_pallas)
    dummy = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), dummy)
    return model, params
