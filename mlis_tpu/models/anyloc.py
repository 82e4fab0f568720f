"""AnyLoc: DINOv2 patch features + VLAD aggregation.

The reference intends DINOv2 ViT-B/14 at 518x518 with 64-cluster VLAD
(place_recognition.py:427-434) but ships a patch-mean GAP fallback
(:479-487). Here VLAD is the real path (ops/pooling.vlad_aggregate —
hard assignment as one GEMM + one-hot matmul), with the GAP fallback kept
as an option for parity testing. The vocabulary is a learned/loaded
(K, D) center matrix; without a fitted vocabulary a seeded random one is
used (fit with `fit_vocabulary` over a feature sample, one k-means step
per call — enough for indoor-domain adaptation).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlis_tpu.models.base import JaxEncoderVPR, fit_descriptor_dim
from mlis_tpu.models.vit import ViT, ViTConfig
from mlis_tpu.ops.pooling import vlad_aggregate


class AnyLoc(JaxEncoderVPR):
    input_size = (518, 518)  # 37x37 patch grid (DINOv2 native)

    def __init__(
        self,
        descriptor_dim: Optional[int] = None,
        seed: int = 0,
        num_clusters: int = 64,
        vit_cfg: Optional[ViTConfig] = None,
        aggregation: str = "vlad",  # 'vlad' | 'gap' (reference fallback)
        input_size=None,
        **kw,
    ):
        cfg = vit_cfg or ViTConfig.dinov2_vitb14()
        dim = descriptor_dim or (
            num_clusters * cfg.dim if aggregation == "vlad" else cfg.dim
        )
        super().__init__(descriptor_dim=dim, seed=seed)
        if input_size is not None:
            self.input_size = tuple(input_size)
        self.aggregation = aggregation
        self.num_clusters = num_clusters
        self.module = ViT(cfg)
        dummy = jnp.zeros((1, *self.input_size, 3), jnp.float32)
        self.params = self.module.init(jax.random.PRNGKey(seed), dummy)
        self.centers = jnp.asarray(
            jax.random.normal(jax.random.PRNGKey(seed + 1), (num_clusters, cfg.dim))
        )

    def _forward(self, params, images):
        out = self.module.apply(params, images)
        patches = out["patches"].astype(jnp.float32)
        if self.aggregation == "gap":
            desc = jnp.mean(patches, axis=1)
            desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
        else:
            desc = vlad_aggregate(patches, self.centers)
        return fit_descriptor_dim(desc, self.descriptor_dim)

    def fit_vocabulary(self, images: np.ndarray, iters: int = 10) -> None:
        """K-means the vocabulary on patch features from a sample batch."""
        from mlis_tpu.ops.image import preprocess_imagenet

        x = preprocess_imagenet(jnp.asarray(images), self.input_size)
        out = self.module.apply(self.params, x)
        feats = out["patches"].astype(jnp.float32).reshape(-1, self.centers.shape[1])

        @jax.jit
        def kmeans_step(centers, f):
            d2 = (
                jnp.sum(f**2, 1, keepdims=True)
                - 2 * f @ centers.T
                + jnp.sum(centers**2, 1)
            )
            a = jax.nn.one_hot(jnp.argmin(d2, 1), centers.shape[0])
            sums = a.T @ f
            counts = jnp.sum(a, 0)[:, None]
            return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centers)

        c = self.centers
        for _ in range(iters):
            c = kmeans_step(c, feats)
        self.centers = c
        self._jit_forward = None

    def load_torch_state_dict(self, state_dict) -> None:
        from mlis_tpu.models.convert import convert_dinov2_torch

        self.params = {"params": convert_dinov2_torch(state_dict, self.params["params"])}
        self._jit_forward = None
