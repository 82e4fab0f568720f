"""Flat-npz weight IO for flax param pytrees.

The reference ships pretrained torch checkpoints baked into its Docker
images (Dockerfile.semantic-tools:71-101). In this zero-egress
environment the repo trains its own weights in-env
(train/matcher_trainer.py, train/trainer.py) and ships them as a single
compressed npz: nested param dicts flattened with '/'-joined keys,
stored float16 (the models run bf16/f32-accum, so f16 storage loses
nothing material) and restored float32.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def flatten_params(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(flatten_params(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params_npz(path: str, dtype=np.float16, **trees: Any) -> None:
    """Save named param trees (e.g. params=..., sp_params=...) to one npz.
    Keys are '<name>:<slash/path>'. Float arrays are downcast to `dtype`."""
    flat: Dict[str, np.ndarray] = {}
    for name, tree in trees.items():
        for k, v in flatten_params(tree).items():
            if np.issubdtype(v.dtype, np.floating):
                v = v.astype(dtype)
            flat[f"{name}:{k}"] = v
    np.savez_compressed(path, **flat)


def _shipped_checkpoint(*names: str) -> str | None:
    """First existing repo-root checkpoints/<name>, or None."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))
    for name in names:
        p = os.path.join(root, "checkpoints", name)
        if os.path.exists(p):
            return p
    return None


def default_matcher_checkpoint() -> str | None:
    """Path of the shipped in-env-trained LightGlue checkpoint, or None.

    Preference order (both are save_weights npzs carrying the matcher AND
    its frozen SuperPoint front end together):
      1. lightglue_homog_sp.npz — matcher trained ON the self-supervised
         trained SuperPoint detector (train/pretrain_superpoint.py), so
         detector and matcher are consistent end-to-end;
      2. lightglue_homog.npz — matcher trained on the random-filter
         detector (round-3 first milestone).
    """
    return _shipped_checkpoint("lightglue_homog_sp.npz", "lightglue_homog.npz")


def default_fullres_matcher_checkpoint() -> str | None:
    """Path of the shipped matcher checkpoint for the FULLRES protocol
    (540x720 / detect-2048 / match-1024), or the half-res default.

    lightglue_homog_sp_fullres.npz is trained at 540x720 with a
    1024-keypoint budget (`pretrain_matcher --height 540 --width 720
    --kpts 1024 --init-from lightglue_homog_sp.npz --sp-init ...`);
    on the GT quality scene at 540x720 it measures mean F1 0.955 over
    seeds 0-5 vs 0.794 for the half-res-trained default (BENCH_NOTES
    "Fullres-trained matcher"), closing the same train/eval resolution
    gap LoFTR v2 closed at 256x320."""
    return _shipped_checkpoint(
        "lightglue_homog_sp_fullres.npz"
    ) or default_matcher_checkpoint()


def default_parallax_matcher_checkpoint() -> str | None:
    """Path of the shipped PARALLAX-trained LightGlue checkpoint
    (`pretrain_matcher --parallax`: layered SE(3) pairs with
    occlusion-aware GT — the v2 GT scene's two-view distribution,
    train/matcher_trainer.render_layered_pair), or the homography-trained
    default. The v2 decision-quality bench (bench.py quality2) prefers
    this checkpoint; the v1 homography scene keeps the homography-trained
    default."""
    return _shipped_checkpoint(
        "lightglue_parallax_sp.npz"
    ) or default_matcher_checkpoint()


def default_loftr_checkpoint() -> str | None:
    """Path of the shipped in-env-trained LoFTR checkpoint
    (train/pretrain_loftr.py homography self-supervision), or None.

    Preference order:
      1. loftr_homog_v3.npz — chip-trained at the 272x360 protocol
         resolution (5000 steps warm-started from v2; held-out dense
         recall 0.696/precision 0.996): GT-scene mean F1 0.929 at the
         in-env coarse threshold (seeds 0-3) vs v2's 0.749;
      2. loftr_homog_v2.npz — chip-trained at 256x320 (4000 steps);
      3. loftr_homog.npz — the CPU-trained 128x160 fallback.
    """
    return _shipped_checkpoint(
        "loftr_homog_v3.npz", "loftr_homog_v2.npz", "loftr_homog.npz"
    )


def default_superglue_checkpoint() -> str | None:
    """Path of the shipped in-env-trained SuperGlue (Sinkhorn-dustbin
    head) checkpoint (`pretrain_matcher --arch superglue`), or None."""
    return _shipped_checkpoint("superglue_homog.npz")


def default_parallax_superglue_checkpoint() -> str | None:
    """Path of the shipped PARALLAX-trained SuperGlue checkpoint
    (`pretrain_matcher --arch superglue --parallax`), or the
    homography-trained default. Used by the v2 decision-quality bench
    (parallax scene distribution); the v1 scene keeps the homography
    checkpoint."""
    return _shipped_checkpoint(
        "superglue_parallax.npz"
    ) or default_superglue_checkpoint()


def default_parallax_loftr_checkpoint() -> str | None:
    """Path of the shipped PARALLAX-trained LoFTR checkpoint
    (`pretrain_loftr --parallax`: layered SE(3) pairs with
    occlusion-aware dense coarse GT), or the homography-trained default.
    Used by the v2 decision-quality bench; the v1 scene keeps the
    homography checkpoint."""
    return _shipped_checkpoint(
        "loftr_parallax.npz"
    ) or default_loftr_checkpoint()


def matcher_arch_from_npz(path: str) -> Dict[str, int]:
    """Infer the MatcherConfig structural fields (depth, dim,
    descriptor_dim, num_heads) from a save_weights npz.

    The matcher blocks are an nn.scan stack (params carry a leading depth
    axis), in_proj's kernel is (descriptor_dim, dim), and the rotary
    posenc kernel is (2, head_dim // 2) — so a checkpoint fully
    determines its own architecture and callers (bench.py,
    eval/quality.py) can build a matching model for ANY shipped variant
    (e.g. a depth-pruned throughput checkpoint) without metadata
    side-channels."""
    with np.load(path) as z:
        in_proj = z["matcher:in_proj/kernel"]
        depth = int(z["matcher:blocks/self/q/kernel"].shape[0])
        head_dim = 2 * int(z["matcher:posenc/Wr"].shape[1])
    descriptor_dim, dim = int(in_proj.shape[0]), int(in_proj.shape[1])
    return {
        "descriptor_dim": descriptor_dim,
        "dim": dim,
        "depth": depth,
        "num_heads": dim // head_dim,
    }


def load_params_npz(path: str) -> Dict[str, Any]:
    """Load a save_params_npz file -> {name: param_tree} with f32 floats."""
    with np.load(path) as z:
        groups: Dict[str, Dict[str, np.ndarray]] = {}
        for key in z.files:
            name, flat_key = key.split(":", 1)
            v = z[key]
            if np.issubdtype(v.dtype, np.floating):
                v = v.astype(np.float32)
            groups.setdefault(name, {})[flat_key] = v
    return {name: unflatten_params(flat) for name, flat in groups.items()}
