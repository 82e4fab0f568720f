"""VPR fine-tuning demonstration: contrastive training reduces
cross-floor perceptual aliasing.

Round-2 verdict #3: the NT-Xent trainer (train/trainer.py) existed but
was never shown to HELP. This experiment constructs an image-level
analogue of the planar-aliasing testbed (tests/test_vpr_scale.py):

  * two floors share the same set of plan-position textures (the NUFR
    repeated-floor-layout geometry) — a random-init encoder retrieves
    cross-floor aliases because appearance is dominated by the shared
    texture;
  * each floor carries a SUBTLE floor-specific appearance cue (amplitude
    `floor_cue` — think signage, lighting, carpet color) that an
    untrained encoder under-weights;
  * supervised NT-Xent over (floor, place) labels makes cross-floor
    same-plan views NEGATIVES, so training teaches the encoder to amplify
    the floor cue: cross-floor false-retrieval falls and same-floor
    recall rises.

This is the reason CricaVPR exists in the reference
(place_recognition.py:508-803) — made measurable.

Run: python -m mlis_tpu.train.vpr_finetune_demo
"""

from __future__ import annotations

import json
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_aliasing_images(
    n_places: int = 8,
    n_views: int = 4,
    hw: Tuple[int, int] = (64, 96),
    floor_cue: float = 0.12,
    corner_jitter: float = 0.06,
    seed: int = 0,
):
    """(N, H, W, 3) float images, place_ids (floor-specific), floors.

    N = 2 floors * n_places * n_views. Cross-floor pairs at the same plan
    position share their base texture; each floor adds a low-frequency
    cue pattern at small amplitude.
    """
    from mlis_tpu.train.matcher_trainer import (
        random_homography,
        synthetic_textures,
        warp_image,
    )

    H, W = hw
    key = jax.random.PRNGKey(seed)
    k_tex, k_cue, k_warp, k_b = jax.random.split(key, 4)
    textures = synthetic_textures(k_tex, n_places, H, W)
    # per-floor cue: smooth random pattern (upsampled 4x6 noise)
    cues = jax.image.resize(
        jax.random.uniform(k_cue, (2, 4, 6), minval=-1.0, maxval=1.0),
        (2, H, W),
        method="linear",
    )

    N = 2 * n_places * n_views
    wkeys = jax.random.split(k_warp, N)
    bright = jax.random.uniform(k_b, (N,), minval=-0.05, maxval=0.05)
    imgs, place_ids, floors = [], [], []
    i = 0
    for fi in range(2):
        for p in range(n_places):
            for v in range(n_views):
                base = textures[p] + floor_cue * cues[fi]
                Hm = random_homography(wkeys[i], H, W, corner_jitter)
                obs = jnp.clip(warp_image(base, Hm) + bright[i], 0.0, 1.0)
                imgs.append(np.asarray(obs))
                place_ids.append(fi * n_places + p)
                floors.append(5 if fi == 0 else 2)
                i += 1
    images = np.stack(imgs)[..., None].repeat(3, axis=-1)  # mono -> rgb
    return (
        images.astype(np.float32),
        np.asarray(place_ids, np.int32),
        np.asarray(floors, np.int32),
    )


def retrieval_metrics(
    desc: np.ndarray, place_ids: np.ndarray, floors: np.ndarray, k: int = 5
) -> Dict[str, float]:
    """cross_floor_false_rate: fraction of top-k hits from the other
    floor; same_floor_recall: queries with >= 1 same-place same-floor
    co-view in top-k."""
    d = desc / (np.linalg.norm(desc, axis=1, keepdims=True) + 1e-8)
    sims = d @ d.T
    np.fill_diagonal(sims, -np.inf)
    topk = np.argsort(-sims, axis=1)[:, :k]
    cross = floors[topk] != floors[:, None]
    same_place = place_ids[topk] == place_ids[:, None]
    return {
        "cross_floor_false_rate": float(cross.mean()),
        "same_floor_recall": float(same_place.any(axis=1).mean()),
    }


def run_demo(
    steps: int = 150,
    n_places: int = 8,
    n_views: int = 4,
    hw: Tuple[int, int] = (64, 96),
    floor_cue: float = 0.12,
    learning_rate: float = 3e-4,
    seed: int = 0,
    n_data: int = -1,
) -> Dict:
    """Train a tiny ViT encoder with supervised NT-Xent on the aliasing
    set; return before/after retrieval metrics."""
    from mlis_tpu.models.vit import ViT, ViTConfig
    from mlis_tpu.ops.pooling import gem_pool
    from mlis_tpu.train.trainer import VPRTrainer

    images, place_ids, floors = make_aliasing_images(
        n_places=n_places, n_views=n_views, hw=hw, floor_cue=floor_cue,
        seed=seed,
    )

    cfg = ViTConfig(dim=64, depth=2, num_heads=2, pos_grid=8, patch_size=8)
    model = ViT(cfg, use_pallas=False)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.asarray(images[:1])
    )

    def apply_fn(p, x):
        out = model.apply(p, x)
        d = gem_pool(out["patches"], p=3.0)
        return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)

    def encode(p):
        return np.asarray(apply_fn(p, jnp.asarray(images)))

    before = retrieval_metrics(encode(params), place_ids, floors)

    trainer = VPRTrainer(
        apply_fn, params, learning_rate=learning_rate, n_data=n_data
    )
    losses = []
    for _ in range(steps):
        losses.append(trainer.train_batch(images, place_ids))
    after = retrieval_metrics(
        np.asarray(apply_fn(trainer.params, jnp.asarray(images))),
        place_ids,
        floors,
    )
    return {
        "steps": steps,
        "n_images": int(len(images)),
        "floor_cue": floor_cue,
        "loss_first": losses[0],
        "loss_last": losses[-1],
        "before": before,
        "after": after,
    }


if __name__ == "__main__":
    print(json.dumps(run_demo(), indent=2))
