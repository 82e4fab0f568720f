"""SALAD: DINOv2 + Sinkhorn optimal-transport aggregation -> 8448-d.

Per the SALAD paper and the reference's slot for it
(place_recognition.py:335-410): patch tokens are softly assigned to m=64
learned clusters via a score map regularized by optimal transport (with a
dustbin for non-informative patches), features are reduced to l=128 dims,
aggregated per cluster, and concatenated with a 256-d global token
projection: 64*128 + 256 = 8448. The OT solve is a fixed-iteration
log-space Sinkhorn scan (ops/sinkhorn.py) — TPU-friendly static shapes.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mlis_tpu.models.base import JaxEncoderVPR, fit_descriptor_dim
from mlis_tpu.models.vit import ViT, ViTConfig
from mlis_tpu.ops.sinkhorn import sinkhorn_log


class SALADHead(nn.Module):
    num_clusters: int = 64
    cluster_dim: int = 128
    token_dim: int = 256
    sinkhorn_iters: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, patches, cls):  # (B, N, D), (B, D)
        B, N, D = patches.shape
        x = patches.astype(self.dtype)
        # score map s(f_i, c_k) + dustbin column
        feats = nn.Dense(self.cluster_dim, dtype=self.dtype, name="feat_proj")(
            nn.relu(nn.Dense(512, dtype=self.dtype, name="feat_hidden")(x))
        )  # (B, N, l)
        scores = nn.Dense(self.num_clusters, dtype=self.dtype, name="score_proj")(
            nn.relu(nn.Dense(512, dtype=self.dtype, name="score_hidden")(x))
        ).astype(jnp.float32)  # (B, N, m)
        dust = self.param("dustbin", nn.initializers.ones, ())
        dust_col = jnp.broadcast_to(dust, (B, N, 1))
        aug = jnp.concatenate([scores, dust_col], axis=-1)  # (B, N, m+1)

        # OT assignment over (patches x clusters+dustbin)
        log_p = sinkhorn_log(aug, num_iters=self.sinkhorn_iters)
        p = jnp.exp(log_p)[..., : self.num_clusters]  # drop dustbin (B, N, m)

        agg = jnp.einsum(
            "bnm,bnl->bml", p, feats.astype(jnp.float32)
        )  # (B, m, l)
        # intra-L2 then flatten (SALAD normalizes the concatenated vector)
        agg = agg.reshape(B, -1)

        g = nn.relu(nn.Dense(512, dtype=self.dtype, name="token_hidden")(cls.astype(self.dtype)))
        g = nn.Dense(self.token_dim, dtype=self.dtype, name="token_proj")(g)
        out = jnp.concatenate([g.astype(jnp.float32), agg], axis=-1)
        return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-8)


class SALADModule(nn.Module):
    vit_cfg: ViTConfig
    num_clusters: int = 64
    cluster_dim: int = 128
    token_dim: int = 256
    # None = Pallas fused attention on TPU (inference). Training must
    # pass False: pallas_call has no VJP rule, so differentiating the
    # backbone under grad raises "Linearization failed ..." — the same
    # reason _build_model builds the tiny/cricavpr ViTs with
    # use_pallas=False (XLA's fused attention is used for the bwd pass).
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, images):
        out = ViT(self.vit_cfg, use_pallas=self.use_pallas,
                  name="backbone")(images)
        return SALADHead(
            self.num_clusters, self.cluster_dim, self.token_dim, name="head"
        )(out["patches"], out["cls"])


class SALAD(JaxEncoderVPR):
    input_size = (476, 644)  # 14-divisible stand-in for the 480x640 reference input

    def __init__(
        self,
        descriptor_dim: Optional[int] = None,
        seed: int = 0,
        vit_cfg: Optional[ViTConfig] = None,
        input_size=None,
        num_clusters: int = 64,
        cluster_dim: int = 128,
        token_dim: int = 256,
        **kw,
    ):
        native = num_clusters * cluster_dim + token_dim  # 8448 at defaults
        super().__init__(descriptor_dim=descriptor_dim or native, seed=seed)
        if input_size is not None:
            self.input_size = tuple(input_size)
        cfg = vit_cfg or ViTConfig.dinov2_vitb14()
        self.module = SALADModule(cfg, num_clusters, cluster_dim, token_dim)
        dummy = jnp.zeros((1, *self.input_size, 3), jnp.float32)
        self.params = self.module.init(jax.random.PRNGKey(seed), dummy)

    def _forward(self, params, images):
        return fit_descriptor_dim(
            self.module.apply(params, images), self.descriptor_dim
        )

    def load_torch_state_dict(self, state_dict) -> None:
        from mlis_tpu.models.convert import convert_dinov2_torch

        new_backbone = convert_dinov2_torch(
            state_dict, self.params["params"]["backbone"]
        )
        self.params["params"]["backbone"] = new_backbone
        self._jit_forward = None
