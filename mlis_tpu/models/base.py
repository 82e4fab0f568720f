"""Shared encoder scaffolding for the VPR model family.

Each encoder owns a Flax backbone + aggregation head, a jitted batched
forward (uint8 images in, descriptors out — preprocessing fused on device),
and plugs into the BasePlaceRecognition database API.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlis_tpu.gating.place_recognition import BasePlaceRecognition
from mlis_tpu.ops.image import preprocess_imagenet


class JaxEncoderVPR(BasePlaceRecognition):
    """VPR database whose encoder is a jitted JAX forward function.

    Subclasses set `input_size`, build `self.params`, and implement
    `_forward(params, images_f32) -> (B, D) descriptors`.
    """

    input_size: Tuple[int, int] = (224, 224)

    def __init__(self, descriptor_dim: int, seed: int = 0, **_ignored):
        super().__init__(descriptor_dim=descriptor_dim, encoder=self)
        self.seed = seed
        self.params = None  # set by subclass
        self._jit_forward = None

    # -- interface -------------------------------------------------------------
    def _forward(self, params, images: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def encode_batch_device(self, images) -> jnp.ndarray:
        """uint8 BGR (B, H, W, 3) -> DEVICE-resident float32 (B, D).

        The retrieval path consumes descriptors on-device; downloading
        them (np.asarray) costs ~0.3 s per 128 frames through the TPU
        tunnel for data the gate never needs on the host."""
        if self._jit_forward is None:
            self._jit_forward = jax.jit(self._forward)
        x = preprocess_imagenet(jnp.asarray(images), self.input_size)
        return self._jit_forward(self.params, x)

    def encode_batch(self, images: np.ndarray) -> np.ndarray:
        """uint8 BGR (B, H, W, 3) -> float32 (B, D)."""
        return np.asarray(self.encode_batch_device(images), dtype=np.float32)

    # -- weight IO ---------------------------------------------------------------
    def load_torch_state_dict(self, state_dict) -> None:
        """Replace backbone params converted from a torch checkpoint."""
        raise NotImplementedError(f"{type(self).__name__} has no converter")


def fit_descriptor_dim(desc: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Truncate or zero-pad (B, D') to (B, dim) — the reference's fallback
    behavior when a backbone's native width differs from the declared
    descriptor dim (place_recognition.py:296-306)."""
    d = desc.shape[-1]
    if d == dim:
        return desc
    if d > dim:
        return desc[..., :dim]
    pad = [(0, 0)] * (desc.ndim - 1) + [(0, dim - d)]
    return jnp.pad(desc, pad)
