"""Full-size LoFTR homography pretraining driver.

The reference's LoFTR rows run kornia's pretrained indoor checkpoint
(geometric_verification.py:469-526); this driver produces the in-env
equivalent for the lite (linear-attention) LoFTR — the same procedural-
texture homography self-supervision that trained the shipped LightGlue
checkpoint (train/pretrain_matcher.py), with LoFTR's own coarse
dual-softmax + fine spatial-expectation losses (train/loftr_trainer.py).

Run: python -m mlis_tpu.train.pretrain_loftr --steps 4000
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import jax
import numpy as np
import optax


def main(argv=None) -> dict:
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--peak-lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--eval-every", type=int, default=200)
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--eval-batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--init-from", help="warm-start from a save_weights npz")
    ap.add_argument(
        "--tiny", action="store_true",
        help="tiny model + small images (CPU smoke test of the driver)",
    )
    ap.add_argument(
        "--parallax", action="store_true",
        help="train on layered-scene SE(3) pairs with occlusion-aware "
        "dense GT (coarse_gt_cells_parallax) instead of single "
        "homographies — the v2 GT scene's two-view distribution",
    )
    args = ap.parse_args(argv)
    if args.out is None:
        args.out = (
            "checkpoints/loftr_parallax.npz"
            if args.parallax
            else "checkpoints/loftr_homog.npz"
        )
    if args.tiny:
        args.height, args.width = 64, 96
        args.eval_batch = 4

    from mlis_tpu.models.loftr import LoFTR, LoFTRConfig
    from mlis_tpu.train.loftr_trainer import LoFTRTrainer
    from mlis_tpu.train.matcher_trainer import synthetic_textures

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    log_path = out.with_name(out.stem + "_log.json")

    lf = LoFTR(
        LoFTRConfig.tiny_test() if args.tiny else LoFTRConfig(), seed=args.seed
    )
    if args.init_from:
        lf.load_weights(args.init_from, image_hw=(args.height, args.width))
        print(f"warm-started from {args.init_from}", flush=True)
    warmup = min(args.warmup, max(args.steps // 4, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=args.peak_lr,
        warmup_steps=warmup,
        decay_steps=args.steps,
        end_value=1e-6,
    )
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    trainer = LoFTRTrainer(
        lf, (args.height, args.width), optimizer=optimizer, seed=args.seed,
        pair_mode="parallax" if args.parallax else "homography",
    )

    eval_imgs = np.asarray(
        synthetic_textures(
            jax.random.PRNGKey(10_000 + args.seed),
            args.eval_batch, args.height, args.width,
        )
    )

    history = {
        "config": {k: getattr(args, k.replace("-", "_")) for k in (
            "steps", "chunk", "batch", "height", "width",
            "peak_lr", "warmup", "seed", "parallax",
        )},
    }

    from mlis_tpu.train.driver import run_chunked_training

    return run_chunked_training(
        trainer, eval_imgs, out, log_path, history,
        steps=args.steps, chunk=args.chunk, batch=args.batch,
        eval_every=args.eval_every, save_every=args.save_every,
    )


if __name__ == "__main__":
    main()
