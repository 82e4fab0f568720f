"""Gate decision-quality benchmark: loop-closure precision/recall/F1 on a
synthetic multi-floor scene with KNOWN ground-truth loop closures.

The reference's evaluation contract includes loop-closure P/R/F1 and
gating effectiveness (scripts/evaluation/semantic_evaluation.py:23-66)
but it never ships a testbed that can produce them from model outputs.
This module builds one:

  * a two-floor "building" of P places per floor; each place is a
    procedural planar texture (train/matcher_trainer.synthetic_textures)
    observed on two separate passes, the second observation warped by a
    random homography + brightness jitter — the pair of observations of
    the same place is a TRUE loop closure;
  * PERCEPTUAL ALIASING by construction: place j on floor 2 reuses the
    exact texture of place j on floor 5 (the cross-floor repeated-layout
    geometry of the NUFR building, README.md:9-11) — retrieval WILL
    surface these and they even verify geometrically, so only the floor
    gate can reject them;
  * the full gate (FullGatePipeline: encode -> retrieve -> floor gate ->
    match+RANSAC verify) runs end-to-end, and the final geometrically-
    valid accepted pairs are scored against ground truth into
    eval/semantic_eval.LoopClosureMetrics.

This is how "the matcher works" becomes measurable: a random-init
matcher produces no consistent matches, so recall collapses; the in-env
trained checkpoint (train/pretrain_matcher.py) restores it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlis_tpu.eval.semantic_eval import LoopClosureMetrics


@dataclass
class QualityScene:
    images: np.ndarray  # (N, H, W) mono8
    timestamps: np.ndarray  # (N,)
    floors: np.ndarray  # (N,) int
    gt_pairs: Set[Tuple[int, int]]  # true loop closures, (lo, hi)
    aliased_pairs: Set[Tuple[int, int]]  # cross-floor same-texture traps
    K: np.ndarray  # 3x3 intrinsics for the verifier


def make_quality_scene(
    n_places: int = 8,
    hw: Tuple[int, int] = (270, 360),
    corner_jitter: float = 0.08,
    brightness_jitter: float = 0.08,
    frame_dt: float = 6.0,
    seed: int = 0,
) -> QualityScene:
    """Two floors x n_places x two passes -> 4*n_places keyframes.

    Visit order per floor is [pass1 place 0..P-1, pass2 place 0..P-1], so
    a place's revisit is ~P*frame_dt seconds after the first observation
    (outside any sane min_time_gap) while consecutive frames stay inside
    it — mirroring how a loop through a building revisits places.
    """
    from mlis_tpu.train.matcher_trainer import (
        random_homography,
        synthetic_textures,
        warp_image,
    )

    H, W = hw
    P = n_places
    key = jax.random.PRNGKey(seed)
    k_tex, k_warp, k_bright = jax.random.split(key, 3)
    textures = synthetic_textures(k_tex, P, H, W)  # shared by both floors

    N = 4 * P
    wkeys = jax.random.split(k_warp, N)
    bright = jax.random.uniform(
        k_bright, (N,), minval=-brightness_jitter, maxval=brightness_jitter
    )

    frames = []
    floors = []
    for fi, floor in enumerate((5, 2)):
        for pass_i in range(2):
            for p in range(P):
                i = len(frames)
                base = textures[p]
                if pass_i == 0 and fi == 0:
                    obs = base  # canonical first view
                else:
                    Hm = random_homography(wkeys[i], H, W, corner_jitter)
                    obs = warp_image(base, Hm)
                obs = jnp.clip(obs + bright[i], 0.0, 1.0)
                frames.append(np.asarray(obs))
                floors.append(floor)
    images = (np.stack(frames) * 255.0).astype(np.uint8)
    timestamps = np.arange(N) * frame_dt
    floors = np.asarray(floors)

    # ground truth: the two observations of the same place on the SAME
    # floor; aliased traps: any pair of observations of the same texture
    # on DIFFERENT floors
    gt_pairs = set()
    aliased = set()
    for p in range(P):
        f5 = (p, p + P)  # floor-5 pass1/pass2 indices
        f2 = (2 * P + p, 3 * P + p)
        gt_pairs.add(f5)
        gt_pairs.add(f2)
        for a in f5:
            for b in f2:
                aliased.add((min(a, b), max(a, b)))

    f = 200.0 * (W / 360.0)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    return QualityScene(images, timestamps, floors, gt_pairs, aliased, K)


def _pixel_encoder(imgs: jnp.ndarray) -> jnp.ndarray:
    """Deterministic downsample-and-normalize VPR encoder: a texture's
    warped revisit stays nearby in this space, so retrieval is reliable
    and the benchmark isolates the gate + verification decisions. Pass
    encoder='mixvpr' to run the learned encoder instead."""
    x = imgs.astype(jnp.float32)
    if x.ndim == 4:
        x = x.mean(-1)
    pooled = jax.image.resize(
        x, (x.shape[0], 18, 24), method="linear"
    ).reshape(x.shape[0], -1)
    pooled = pooled - pooled.mean(axis=1, keepdims=True)
    return pooled / (jnp.linalg.norm(pooled, axis=1, keepdims=True) + 1e-8)


def score_gate_decisions(
    res,  # FullGateResult
    scene: QualityScene,
) -> LoopClosureMetrics:
    """Score the pipeline's final decisions (accepted AND geometrically
    valid) against the scene's ground-truth loop closures."""
    accepted = {
        (min(r.query_idx, r.match_idx), max(r.query_idx, r.match_idx))
        for r in res.results
        if r.is_valid
    }
    gt = scene.gt_pairs
    tp = len(accepted & gt)
    fp = len(accepted - gt)
    fn = len(gt - accepted)
    fl = scene.floors
    cross_valid = sum(1 for a, b in accepted if fl[a] != fl[b])
    return LoopClosureMetrics(
        total_candidates=res.total_pairs,
        true_positives=tp,
        false_positives=fp,
        false_negatives=fn,
        same_floor_candidates=res.total_pairs - res.cross_floor_rejected - cross_valid,
        cross_floor_candidates=res.cross_floor_rejected + cross_valid,
        cross_floor_rejected=res.cross_floor_rejected,
    )


def retrieval_recall(scene: QualityScene, encoder, top_k=5, threshold=0.5,
                     min_time_gap=10.0) -> float:
    """Fraction of GT pairs surfaced by retrieval (before any gating)."""
    from mlis_tpu.ops.knn import cosine_topk

    db = encoder(jnp.asarray(scene.images))
    t = jnp.asarray(scene.timestamps, jnp.float32)
    scores, idx = cosine_topk(db, db, t, t, k=top_k, min_time_gap=min_time_gap)
    scores, idx = np.asarray(scores), np.asarray(idx)
    found = set()
    for q in range(len(scene.images)):
        for kk in range(scores.shape[1]):
            if np.isfinite(scores[q, kk]) and scores[q, kk] >= threshold:
                m = int(idx[q, kk])
                found.add((min(q, m), max(q, m)))
    hits = len(found & scene.gt_pairs)
    return hits / max(len(scene.gt_pairs), 1)


def run_gate_quality(
    matcher: str = "trained",  # 'trained' | 'random' | 'orb' | 'loftr'
    #                            | 'superglue'
    # 'trained_vpr' (default; falls back to 'pixel' when the shipped
    # checkpoints/vpr_tiny.npz is absent) | 'pixel' | 'mixvpr'
    encoder: str = "trained_vpr",
    n_places: int = 8,
    hw: Tuple[int, int] = (270, 360),
    max_keypoints: int = 512,
    strict_floor: bool = True,
    floor_gate: bool = True,  # False = ablation: NO floor gating at all
    # retrieval defaults picked so candidate generation is NOT the
    # bottleneck being measured (top-5 / thr 0.5 caps retrieval recall at
    # 0.625 on the 8-place scene; top-8 / 0.45 reaches the 0.875 encoder
    # ceiling) — the benchmark isolates gate + verification decisions
    top_k: int = 8,
    similarity_threshold: float = 0.45,
    verify_batch: int = 64,
    seed: int = 0,
    scene: Optional[QualityScene] = None,
    weights_path: Optional[str] = None,  # matcher='trained': explicit ckpt
    # keypoint pruning (FullGatePipeline match_top_k): detect
    # max_keypoints but MATCH only the top-N by detector score — the
    # bench's fullres lever; exposed here so its decision-quality cost
    # can be measured on the GT scene
    match_top_k: Optional[int] = None,
    # two-stage RANSAC hypothesis scoring (ops/epipolar.essential_ransac
    # score_subset); exposed so its decision-quality cost is measurable
    ransac_subset: int = 0,
    # confident-match acceptance cut for the lightglue-family branches
    # (GeometricVerifier min_confident_matches); thr 6 is the validated
    # default for the shipped depth-9 checkpoint — exposed so alternative
    # checkpoints (e.g. depth-pruned variants with different confidence
    # calibration) can be swept on the GT scenes
    min_confident_matches: int = 6,
) -> Dict:
    """Build the scene, run the full gate, score the decisions.

    Returns a flat dict (JSON-ready) with precision/recall/F1, gating
    effectiveness, retrieval recall and the raw counts.
    """
    from types import SimpleNamespace

    from mlis_tpu.gating.full_gate import FullGatePipeline
    from mlis_tpu.gating.verification import GeometricVerifier
    from mlis_tpu.models.lightglue import LightGlue, MatcherConfig
    from mlis_tpu.models.superpoint import SuperPointConfig

    scene = scene or make_quality_scene(n_places=n_places, hw=hw, seed=seed)

    if matcher == "orb":
        verifier = GeometricVerifier(matcher_type="orb")
        weights = "orb_weight_free"
    elif matcher == "loftr":
        # dense detector-free family (reference: kornia LoFTR,
        # geometric_verification.py:469-526); loads the in-env-trained
        # checkpoint when shipped, else reports random_init
        import os

        from mlis_tpu.models.loftr import LoFTR
        from mlis_tpu.models.weights import default_loftr_checkpoint

        lf = LoFTR()
        weights = "random_init"
        path = weights_path or default_loftr_checkpoint()
        if path and os.path.exists(path):
            lf.load_weights(path, image_hw=hw)
            weights = os.path.basename(path)
        verifier = GeometricVerifier(matcher=lf)
    elif matcher == "superglue":
        # Sinkhorn-dustbin head family (reference README.md:41-45 row);
        # loads the in-env-trained checkpoint when shipped
        import os

        from mlis_tpu.models.lightglue import SuperGlue
        from mlis_tpu.models.weights import default_superglue_checkpoint

        sg = SuperGlue(sp_cfg=SuperPointConfig(max_keypoints=max_keypoints))
        weights = "random_init"
        path = weights_path or default_superglue_checkpoint()
        if path and os.path.exists(path):
            sg.load_weights(path, image_hw=hw)
            weights = os.path.basename(path)
        verifier = GeometricVerifier(matcher=sg)
    else:
        weights = "random_init"
        path = None
        if matcher == "trained":
            import os

            from mlis_tpu.models.weights import (
                default_fullres_matcher_checkpoint,
                default_matcher_checkpoint,
            )

            # at fullres, prefer the 540x720-trained checkpoint (mean GT
            # F1 0.93 vs 0.75 for the half-res-trained one — BENCH_NOTES
            # "Fullres-trained matcher")
            default = (
                default_fullres_matcher_checkpoint()
                if hw[0] >= 540
                else default_matcher_checkpoint()
            )
            path = weights_path or default
            if not (path and os.path.exists(path)):
                path = None
        cfg_kw = {}
        if path:
            # checkpoints are self-describing (depth/dim inferred from the
            # npz) so depth-pruned variants A/B through the same runner
            from mlis_tpu.models.weights import matcher_arch_from_npz

            cfg_kw = matcher_arch_from_npz(path)
        lg = LightGlue(
            sp_cfg=SuperPointConfig(max_keypoints=max_keypoints),
            matcher_cfg=MatcherConfig.lightglue(**cfg_kw),
        )
        if path:
            lg.load_weights(path, image_hw=hw)
            weights = os.path.basename(path)
        # confident-match cut: repeated-structure false pairs RANSAC-pass
        # with 20-28 inliers but carry <= 5 confident matches (true loop
        # closures: typically 10-70) — see GeometricVerifier docstring.
        # thr 6 measured precision 1.0 on ALL of seeds 0-7 (incl. 5
        # held-out) while keeping more recall than 8 (BENCH_NOTES.md)
        verifier = GeometricVerifier(
            matcher=lg, min_confident_matches=min_confident_matches
        )

    if encoder == "trained_vpr":
        # in-env warp-invariance-pretrained tiny ViT (train/pretrain_vpr):
        # lifts the pixel encoder's ~0.875 retrieval-recall ceiling on
        # strongly warped revisits; falls back to pixel when the
        # checkpoint isn't shipped
        from mlis_tpu.train.pretrain_vpr import load_encoder

        enc = load_encoder()
        if enc is None:
            encoder = "pixel"

    if encoder in ("pixel", "trained_vpr"):
        enc_fn = _pixel_encoder if encoder == "pixel" else enc
        spr = SimpleNamespace(
            vpr=SimpleNamespace(encode_batch_device=enc_fn)
        )
        pipe = FullGatePipeline(
            vpr=spr,
            verifier=verifier,
            top_k=top_k,
            similarity_threshold=similarity_threshold,
            min_time_gap=10.0,
            verify_batch=verify_batch,
            strict_floor=strict_floor,
            matcher_weights=None,
            match_top_k=match_top_k,
            ransac_subset=ransac_subset,
        )
    else:
        pipe = FullGatePipeline(
            vpr_method=encoder,
            verifier=verifier,
            top_k=top_k,
            similarity_threshold=similarity_threshold,
            min_time_gap=10.0,
            verify_batch=verify_batch,
            strict_floor=strict_floor,
            matcher_weights=None,
            match_top_k=match_top_k,
            ransac_subset=ransac_subset,
        )
        enc_fn = getattr(pipe.spr.vpr, "encode_batch_device", None)

    # no-gate ablation: feed constant floor labels so every candidate
    # reaches verification — the aliased same-texture pairs then verify
    # geometrically and only the decision score reveals the damage
    # (decisions are still scored against the scene's REAL floors/GT)
    fl = scene.floors if floor_gate else np.zeros_like(scene.floors)
    res = pipe.process(
        scene.images, scene.timestamps, fl, scene.K,
        encode_batch_size=64,
    )
    m = score_gate_decisions(res, scene)
    rr = retrieval_recall(
        scene, enc_fn, top_k=top_k, threshold=similarity_threshold
    ) if enc_fn is not None else float("nan")
    return {
        "matcher": matcher,
        "weights": weights,
        "encoder": encoder,
        "strict_floor": strict_floor,
        "n_frames": int(len(scene.images)),
        "gt_pairs": len(scene.gt_pairs),
        "precision": m.precision,
        "recall": m.recall,
        "f1": m.f1_score,
        "retrieval_recall": rr,
        "gating_effectiveness": m.gating_effectiveness,
        "cross_floor_rate": m.cross_floor_rate,
        "total_candidates": m.total_candidates,
        "true_positives": m.true_positives,
        "false_positives": m.false_positives,
        "false_negatives": m.false_negatives,
        "verified": res.verified,
        "geometrically_valid": res.geometrically_valid,
        "elapsed_s": res.elapsed_s,
    }
