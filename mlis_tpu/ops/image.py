"""Image preprocessing as jittable jax ops (no OpenCV dependency).

Replaces the reference's cv2.resize + torch tensor conversions
(place_recognition.py:308-332, geometric_verification.py:263-312) with
`jax.image.resize` pipelines that run on-device, batched.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# ITU-R BT.601 luma weights in BGR channel order (cv2.cvtColor convention)
BT601_BGR = (0.114, 0.587, 0.299)


@functools.partial(jax.jit, static_argnames=("size", "bgr", "antialias"))
def preprocess_imagenet(
    images: jnp.ndarray,  # (B, H, W, 3) / (B, H, W, 1) / (B, H, W) uint8 or float
    size: Tuple[int, int],
    bgr: bool = True,
    antialias: bool = True,
) -> jnp.ndarray:
    """uint8 (BGR/RGB/mono) -> resized, ImageNet-normalized float32 (B,h,w,3).

    Mono input (NUFR's FLIR array publishes mono8 frames) is replicated to
    3 channels on-device — the reference does the same conversion host-side
    with cv2.COLOR_GRAY2RGB (place_recognition.py:316-322) before its
    encoders."""
    x = images.astype(jnp.float32) / 255.0
    if x.ndim == 3:
        x = x[..., None]
    if x.shape[-1] == 1:
        x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
    elif bgr:
        x = x[..., ::-1]
    B = x.shape[0]
    x = jax.image.resize(
        x, (B, size[0], size[1], 3), method="bilinear", antialias=antialias
    )
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


@functools.partial(jax.jit, static_argnames=("size",))
def to_grayscale(
    images: jnp.ndarray, size: Tuple[int, int] | None = None, bgr: bool = True
) -> jnp.ndarray:
    """uint8 color -> float32 grayscale in [0, 1], optionally resized.

    Uses the ITU-R BT.601 weights (cv2.cvtColor convention the reference's
    matchers rely on)."""
    x = images.astype(jnp.float32) / 255.0
    if x.ndim == 3:
        x = x[..., None] if x.shape[-1] not in (1, 3) else x[None]
    if x.shape[-1] == 3:
        weights = jnp.asarray(BT601_BGR, jnp.float32)
        if not bgr:
            weights = weights[::-1]
        x = jnp.einsum("...c,c->...", x, weights)[..., None]
    if size is not None:
        B = x.shape[0]
        x = jax.image.resize(x, (B, size[0], size[1], 1), method="bilinear")
    return x
