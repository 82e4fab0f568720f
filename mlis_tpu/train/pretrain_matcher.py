"""Full-size LightGlue homography pretraining driver.

Reproduces the official LightGlue pretraining stage (synthetic
homographies of single images; the reference consumes the resulting
torch-hub checkpoint, geometric_verification.py:216-242) entirely in-env
on one TPU chip:

  * images: procedural multi-scale block-noise textures generated ON
    DEVICE (synthetic_textures) — zero upload through the TPU tunnel;
  * steps run in scanned chunks (MatcherTrainer.train_chunk): one device
    dispatch per `--chunk` steps;
  * LR: linear warmup + cosine decay (BENCH_NOTES round-2: fixed-LR
    convergence is schedule-sensitive);
  * held-out match recall/precision every `--eval-every` steps on fresh
    homography pairs; best-recall checkpoint + periodic checkpoints to
    --out (npz: matcher + frozen SuperPoint weights together).

Run: python -m mlis_tpu.train.pretrain_matcher --steps 6000
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import jax
import numpy as np
import optax


def main(argv=None) -> dict:
    # sitecustomize pins jax_platforms=axon,cpu in every process; honour an
    # explicit JAX_PLATFORMS=cpu request (CPU smoke tests) the documented way
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--kpts", type=int, default=512)
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--width", type=int, default=360)
    ap.add_argument("--peak-lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=200)
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--eval-batch", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--arch", choices=("lightglue", "superglue"), default="lightglue",
        help="matcher head: dual-softmax LightGlue (default) or the "
        "Sinkhorn-dustbin SuperGlue variant (models/lightglue.py:598); "
        "the homography self-supervision is identical — the sinkhorn "
        "path's 1-dustbin-mass matchability feeds the same BCE term",
    )
    ap.add_argument(
        "--out", default=None,
        help="checkpoint path (best held-out recall); default "
        "checkpoints/<arch>_homog.npz",
    )
    ap.add_argument(
        "--init-from",
        help="warm-start from an existing save_weights npz (e.g. finetune "
        "the 512-kpt checkpoint at a larger keypoint budget)",
    )
    ap.add_argument(
        "--sp-init",
        help="load TRAINED SuperPoint weights (pretrain_superpoint.py npz) "
        "as the frozen detector front end instead of random filters",
    )
    ap.add_argument(
        "--tiny", action="store_true",
        help="tiny model + small images (CPU smoke test of the driver)",
    )
    ap.add_argument(
        "--depth", type=int, default=9,
        help="matcher transformer depth (default 9, the official "
        "LightGlue depth); smaller = throughput-pruned variant (the "
        "static-shape analogue of official LightGlue's adaptive early "
        "exit). Checkpoints are self-describing — "
        "models/weights.matcher_arch_from_npz recovers the architecture",
    )
    ap.add_argument(
        "--dim", type=int, default=256,
        help="matcher feature width (default 256)",
    )
    ap.add_argument(
        "--parallax", action="store_true",
        help="train on layered-scene SE(3) pairs with occlusion-aware "
        "GT (render_layered_pair) instead of single homographies — the "
        "v2 GT scene's two-view distribution",
    )
    args = ap.parse_args(argv)
    if args.tiny:
        args.kpts, args.height, args.width = 48, 64, 96
        args.eval_batch = 4

    from mlis_tpu.models.lightglue import LightGlue, MatcherConfig, SuperGlue
    from mlis_tpu.models.superpoint import SuperPointConfig
    from mlis_tpu.train.matcher_trainer import MatcherTrainer, synthetic_textures

    if args.out is None:
        suffix = "parallax" if args.parallax else "homog"
        args.out = f"checkpoints/{args.arch}_{suffix}.npz"
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    log_path = out.with_name(out.stem + "_log.json")

    # seed 0 everywhere: bench.py / FullGatePipeline build LightGlue with
    # the default seed, so the frozen SuperPoint filters in the checkpoint
    # match what an unadorned LightGlue() would initialize (the npz ships
    # them regardless, so this is belt-and-braces).
    cls = SuperGlue if args.arch == "superglue" else LightGlue
    lg = cls(
        sp_cfg=(
            SuperPointConfig.tiny_test(max_keypoints=args.kpts)
            if args.tiny
            else SuperPointConfig(max_keypoints=args.kpts)
        ),
        matcher_cfg=(
            MatcherConfig.tiny_test(
                assignment="sinkhorn" if args.arch == "superglue" else "dual_softmax"
            )
            if args.tiny
            else (
                None  # __init__ falls back to cls.matcher_cfg_factory
                if args.depth == 9 and args.dim == 256
                else cls.matcher_cfg_factory(depth=args.depth, dim=args.dim)
            )
        ),
        seed=args.seed,
    )
    if args.init_from:
        lg.load_weights(args.init_from, image_hw=(args.height, args.width))
        print(f"warm-started from {args.init_from}", flush=True)
    if args.sp_init:
        from mlis_tpu.models.convert import _match_dtypes
        from mlis_tpu.models.weights import load_params_npz

        trees = load_params_npz(args.sp_init)
        lg.sp.init_params((args.height, args.width))
        lg.sp.params = _match_dtypes(
            {"params": trees["superpoint"]}, lg.sp.params
        )
        print(f"frozen SuperPoint loaded from {args.sp_init}", flush=True)
    warmup = min(args.warmup, max(args.steps // 4, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=args.peak_lr,
        warmup_steps=warmup,
        decay_steps=args.steps,
        end_value=1e-6,
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adam(schedule)
    )
    trainer = MatcherTrainer(
        lg, (args.height, args.width), optimizer=optimizer, seed=args.seed,
        pair_mode="parallax" if args.parallax else "homography",
    )

    # fixed held-out textures (key disjoint from the training stream,
    # which folds from trainer._key seeded with args.seed)
    eval_imgs = np.asarray(
        synthetic_textures(
            jax.random.PRNGKey(10_000 + args.seed),
            args.eval_batch, args.height, args.width,
        )
    )

    history = {
        "config": {k: getattr(args, k.replace("-", "_")) for k in (
            "steps", "chunk", "batch", "kpts", "height", "width",
            "peak_lr", "warmup", "seed", "depth", "dim", "parallax",
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
