"""Warp-invariant VPR encoder pretraining for the quality benchmark.

The gate decision-quality benchmark (eval/quality.py) retrieves loop-
closure candidates with a deterministic pixel encoder whose recall on the
synthetic scene tops out at ~0.875: a strongly warped revisit drifts too
far in downsampled-pixel space. This driver trains a tiny ViT descriptor
encoder to be HOMOGRAPHY-INVARIANT — the exact invariance the scene
demands — with supervised NT-Xent (train/trainer.nt_xent_loss) over
procedurally generated places:

  * every step samples FRESH textures on device (zero tunnel upload,
    like train/pretrain_matcher.py), so the encoder can only learn the
    invariance, never the test scene's textures (which come from a
    disjoint key range);
  * each texture is observed `--views` times under random homographies +
    brightness jitter (the same corruption family the scene applies);
  * steps run in scanned chunks: one device dispatch per `--chunk` steps
    (per-dispatch RTT through the TPU tunnel is up to ~1 s);
  * held-out eval: recall@1 on warped-pair retrieval over unseen
    textures; best checkpoint lands at --out (npz via save_params_npz).

This closes the retrieval-recall gap the same way the matcher checkpoint
closed verification (reference capability anchor: the frozen VPR
encoders at scripts/semantic_gating/place_recognition.py:220-272, which
the reference never adapts to its domain).

Run: python -m mlis_tpu.train.pretrain_vpr
"""

from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial
from pathlib import Path
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

# encoder input resolution (scene keyframes are resized down to this
# inside the apply fn, so the encoder is resolution-agnostic)
ENC_HW = (64, 96)
DEFAULT_CKPT = "checkpoints/vpr_tiny.npz"


def _build_model(seed: int = 0):
    from mlis_tpu.models.vit import ViT, ViTConfig

    cfg = ViTConfig.tiny_test(patch_size=8)
    model = ViT(cfg, use_pallas=False)
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, ENC_HW[0], ENC_HW[1], 3), jnp.float32),
    )
    return model, params


def _make_apply(model) -> Callable:
    from mlis_tpu.ops.pooling import gem_pool

    def apply_fn(p, x):
        """x: (B, H, W) float [0,1] mono -> (B, D) L2-normalized."""
        x = jax.image.resize(
            x, (x.shape[0],) + ENC_HW, method="linear"
        )
        rgb = jnp.repeat(x[..., None], 3, axis=-1).astype(jnp.float32)
        out = model.apply(p, rgb)
        d = gem_pool(out["patches"], p=3.0)
        return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)

    return apply_fn


def _sample_batch(key, n_places: int, views: int, hw: Tuple[int, int],
                  corner_jitter: float, brightness: float):
    """Fresh on-device batch: (P*V, H, W) warped views + place ids."""
    from mlis_tpu.train.matcher_trainer import (
        random_homography,
        synthetic_textures,
        warp_image,
    )

    H, W = hw
    kt, kw, kb = jax.random.split(key, 3)
    tex = synthetic_textures(kt, n_places, H, W)
    B = n_places * views
    place = jnp.repeat(jnp.arange(n_places), views)
    wkeys = jax.random.split(kw, B)
    Hms = jax.vmap(
        lambda k: random_homography(k, H, W, corner_jitter)
    )(wkeys)
    bright = jax.random.uniform(
        kb, (B,), minval=-brightness, maxval=brightness
    )
    imgs = jax.vmap(warp_image)(tex[place], Hms)
    imgs = jnp.clip(imgs + bright[:, None, None], 0.0, 1.0)
    return imgs, place


def make_train_chunk(apply_fn, optimizer, n_places, views, hw,
                     corner_jitter, brightness):
    """One jitted dispatch = `n` scanned NT-Xent steps on fresh data."""
    from mlis_tpu.train.trainer import nt_xent_loss

    def step(carry, key):
        params, opt_state = carry

        def loss_fn(p):
            imgs, place = _sample_batch(
                key, n_places, views, hw, corner_jitter, brightness
            )
            return nt_xent_loss(apply_fn(p, imgs), place)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @partial(jax.jit, static_argnums=2, donate_argnums=(0, 1))
    def chunk(state, key, n):
        keys = jax.random.split(key, n)
        state, losses = jax.lax.scan(step, state, keys)
        return state, losses

    return chunk


def heldout_recall(apply_fn, params, n_places: int = 32,
                   hw: Tuple[int, int] = (270, 360),
                   corner_jitter: float = 0.08, seed: int = 0) -> float:
    """recall@1: two warped views per unseen texture; a query scores when
    its nearest neighbour is its sibling view. Key range disjoint from the
    training stream AND from eval/quality.make_quality_scene (seed 0-ish
    PRNGKeys there; 77_000+ here)."""
    imgs, place = _sample_batch(
        jax.random.PRNGKey(77_000 + seed), n_places, 2, hw,
        corner_jitter, 0.08,
    )
    d = np.asarray(apply_fn(params, imgs))
    sims = d @ d.T
    np.fill_diagonal(sims, -np.inf)
    nn1 = np.argmax(sims, axis=1)
    place = np.asarray(place)
    return float((place[nn1] == place).mean())


def load_encoder(path: Optional[str] = None, seed: int = 0):
    """Trained-encoder loader for eval/quality.py: returns a jitted
    (B, H, W)|(B, H, W, C) uint8/float -> (B, D) descriptor fn, or None
    when no checkpoint exists."""
    from mlis_tpu.models.convert import _match_dtypes
    from mlis_tpu.models.weights import load_params_npz

    root = Path(__file__).resolve().parents[2]
    p = Path(path) if path else root / DEFAULT_CKPT
    if not p.exists():
        return None
    model, params = _build_model(seed)
    params = _match_dtypes(load_params_npz(str(p))["vpr"], params)
    params = jax.device_put(params)
    apply_fn = _make_apply(model)

    @jax.jit
    def encode(imgs):
        x = imgs.astype(jnp.float32)
        if x.ndim == 4:
            x = x.mean(-1)
        return apply_fn(params, x / 255.0)

    return encode


def main(argv=None) -> dict:
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--places", type=int, default=16)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--width", type=int, default=360)
    ap.add_argument("--corner-jitter", type=float, default=0.08)
    ap.add_argument("--brightness", type=float, default=0.08)
    ap.add_argument("--peak-lr", type=float, default=3e-4)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=DEFAULT_CKPT)
    ap.add_argument("--tiny", action="store_true",
                    help="few steps + small textures (CPU smoke test)")
    args = ap.parse_args(argv)
    if args.tiny:
        args.steps, args.chunk = 30, 10
        args.height, args.width = 96, 128
        args.places, args.views = 6, 3

    from mlis_tpu.models.weights import save_params_npz

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    log_path = out.with_name(out.stem + "_log.json")

    model, params = _build_model(args.seed)
    apply_fn = _make_apply(model)
    hw = (args.height, args.width)

    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=args.peak_lr,
        warmup_steps=max(args.steps // 10, 1),
        decay_steps=args.steps, end_value=1e-6,
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(schedule)
    )
    opt_state = optimizer.init(params)
    chunk_fn = make_train_chunk(
        apply_fn, optimizer, args.places, args.views, hw,
        args.corner_jitter, args.brightness,
    )

    history = {
        "config": vars(args).copy(),
        "loss": [],
        "eval": [],
    }
    r0 = heldout_recall(apply_fn, params, hw=hw,
                        corner_jitter=args.corner_jitter, seed=args.seed)
    history["eval"].append((0, r0))
    print(f"step 0: heldout recall@1={r0:.4f}", flush=True)
    best = r0
    saved = False

    state = (params, opt_state)
    key = jax.random.PRNGKey(1_000_000 + args.seed)
    done = 0
    t0 = time.time()
    next_eval = args.eval_every
    while done < args.steps:
        n = min(args.chunk, args.steps - done)
        key, sub = jax.random.split(key)
        state, losses = chunk_fn(state, sub, n)
        losses = np.asarray(losses)
        done += n
        history["loss"].append((done, float(losses.mean())))
        rate = done / (time.time() - t0)
        print(f"step {done}/{args.steps}: loss={losses.mean():.4f} "
              f"{rate:.2f} steps/s", flush=True)
        if done >= next_eval or done >= args.steps:
            next_eval += args.eval_every
            r = heldout_recall(apply_fn, state[0], hw=hw,
                               corner_jitter=args.corner_jitter,
                               seed=args.seed)
            history["eval"].append((done, r))
            print(f"  eval@{done}: heldout recall@1={r:.4f}", flush=True)
            if r > best or not saved:
                best = max(best, r)
                save_params_npz(str(out), vpr=jax.device_get(state[0]))
                saved = True
                print(f"  saved best checkpoint (recall@1 {best:.4f})",
                      flush=True)
        log_path.write_text(json.dumps(history))

    history["best_recall_at_1"] = best
    history["wall_s"] = time.time() - t0
    log_path.write_text(json.dumps(history))
    print(f"done: best heldout recall@1 {best:.4f} "
          f"in {history['wall_s']:.0f}s", flush=True)
    return history


if __name__ == "__main__":
    main()
