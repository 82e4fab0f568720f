"""Geometric verification pipeline: match -> RANSAC -> pose -> validity.

Behavioral contract (reference scripts/semantic_gating/geometric_verification.py):
  * RANSAC threshold 3 px, prob 0.999 (:104-153) — here a fixed 512-
    hypothesis budget (>= the 0.999/8-point requirement at 50% inliers);
  * fewer than 5 matched points -> invalid result with zeroed fields;
  * validity: num_inliers >= 20 AND inlier_ratio >= 0.25; confidence =
    min(1, ratio * inliers / min_inliers) (:616-620);
  * SemanticGeometricVerifier short-circuits cross-floor pairs BEFORE any
    model work and tracks skip/verify/valid stats (:665-744).

TPU-native addition: `verify_pairs_batch` drives the whole candidate list
as fixed-shape device batches (detector + matcher + vmapped RANSAC/pose),
which is what the keyframe-pairs/sec benchmark measures.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlis_tpu.ops.epipolar import (
    essential_ransac,
    essential_ransac_batch,
    recover_pose,
)


@dataclass
class MatchResult:
    """Verification outcome (field parity with reference :55-68)."""

    query_idx: int
    match_idx: int
    num_keypoints_query: int
    num_keypoints_match: int
    num_matches: int
    num_inliers: int
    inlier_ratio: float
    relative_pose: Optional[np.ndarray]
    essential_matrix: Optional[np.ndarray]
    confidence: float
    is_valid: bool
    # count of matches with confidence >= the matcher's confident
    # threshold (0.5); -1 when the path doesn't report it (classical
    # matchers). TPU-native addition: the discriminative signal behind
    # GeometricVerifier(min_confident_matches=...).
    num_confident_matches: int = -1


def _invalid_result(query_idx: int, match_idx: int) -> MatchResult:
    return MatchResult(
        query_idx=query_idx,
        match_idx=match_idx,
        num_keypoints_query=0,
        num_keypoints_match=0,
        num_matches=0,
        num_inliers=0,
        inlier_ratio=0.0,
        relative_pose=None,
        essential_matrix=None,
        confidence=0.0,
        is_valid=False,
    )


class BaseFeatureMatcher:
    """Matcher interface + shared geometric checks (reference :80-188)."""

    def detect_and_match(
        self, image1: np.ndarray, image2: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        raise NotImplementedError

    def verify_geometric_consistency(
        self,
        kpts1: np.ndarray,
        kpts2: np.ndarray,
        K: Optional[np.ndarray] = None,
        ransac_threshold: float = 3.0,
        num_hypotheses: int = 512,
        seed: int = 0,
    ) -> Tuple[np.ndarray, Optional[np.ndarray], float]:
        """RANSAC essential (with K) / fundamental-style check (without K a
        unit-intrinsics essential stands in). Returns (mask, E, ratio)."""
        if len(kpts1) < 5:
            return np.array([]), None, 0.0
        if K is None:
            # no calibration: normalize by image scale so thresholds are
            # meaningful; equivalent role to the reference's F-matrix path
            scale = max(float(np.abs(kpts1).max()), 1.0)
            K = np.array(
                [[scale, 0, 0], [0, scale, 0], [0, 0, 1]], dtype=np.float64
            )
        res = essential_ransac(
            jnp.asarray(kpts1, jnp.float32),
            jnp.asarray(kpts2, jnp.float32),
            jnp.ones(len(kpts1), bool),
            jnp.asarray(K, jnp.float32),
            jax.random.PRNGKey(seed),
            num_hypotheses=num_hypotheses,
            threshold_px=ransac_threshold,
        )
        return (
            np.asarray(res.inlier_mask),
            np.asarray(res.E),
            float(res.inlier_ratio),
        )

    def estimate_relative_pose(
        self,
        kpts1: np.ndarray,
        kpts2: np.ndarray,
        K: np.ndarray,
        inlier_mask: np.ndarray,
        E: np.ndarray,
    ) -> Optional[np.ndarray]:
        if E is None or int(np.sum(inlier_mask)) < 5:
            return None
        T, good, det = recover_pose(
            jnp.asarray(E, jnp.float32),
            jnp.asarray(kpts1, jnp.float32),
            jnp.asarray(kpts2, jnp.float32),
            jnp.asarray(inlier_mask, bool),
            jnp.asarray(K, jnp.float32),
        )
        if int(good) < 1:
            return None
        return np.asarray(T, dtype=np.float64)


def _pad_pairs_pow2(images0, images1):
    """Pad a (P, ...) pair batch to the next power of two (min 8) by
    repeating the first pair, so batched-matcher dispatch shapes are
    bounded (results past the real P are discarded by the caller)."""
    import jax.numpy as jnp

    P = int(len(images0))
    Ppad = 1 << max(3, (P - 1).bit_length())
    im0, im1 = jnp.asarray(images0), jnp.asarray(images1)
    if Ppad == P:
        return im0, im1
    reps = jnp.repeat(im0[:1], Ppad - P, axis=0)
    reps1 = jnp.repeat(im1[:1], Ppad - P, axis=0)
    return jnp.concatenate([im0, reps], 0), jnp.concatenate([im1, reps1], 0)


def _build_matcher(matcher_type: str, **kwargs):
    m = matcher_type.lower()
    if m == "lightglue":
        from mlis_tpu.models.lightglue import LightGlue

        return LightGlue(**kwargs)
    if m == "superglue":
        from mlis_tpu.models.lightglue import SuperGlue

        return SuperGlue(**kwargs)
    if m == "loftr":
        from mlis_tpu.models.loftr import LoFTR

        return LoFTR(**kwargs)
    if m == "orb":
        from mlis_tpu.models.orb import ORBMatcher

        return ORBMatcher(**kwargs)
    raise ValueError(f"Unknown matcher: {matcher_type}")


class GeometricVerifier:
    """match -> RANSAC -> pose -> validity (reference :529-662)."""

    def __init__(
        self,
        matcher_type: str = "lightglue",
        min_inliers: int = 20,
        min_inlier_ratio: float = 0.25,
        ransac_threshold: float = 3.0,
        matcher=None,
        # additional acceptance criterion: require >= this many HIGH-
        # CONFIDENCE matches (matcher score >= 0.5). 0 (default) keeps
        # exact reference-parity acceptance (inliers/ratio only,
        # geometric_verification.py:616-620). Repeated indoor structure
        # produces pairs that pass RANSAC with 20-28 inliers but carry
        # almost no confident matches (0-5 vs typically 10-70 for true
        # loop closures on the quality scenes) — this cut removes them.
        min_confident_matches: int = 0,
        **matcher_kwargs,
    ):
        self.min_inliers = min_inliers
        self.min_inlier_ratio = min_inlier_ratio
        self.min_confident_matches = min_confident_matches
        self.ransac_threshold = ransac_threshold
        self.matcher = (
            matcher if matcher is not None else _build_matcher(matcher_type, **matcher_kwargs)
        )

    def _result_from_counts(
        self,
        query_idx,
        match_idx,
        n1,
        n2,
        n_matches,
        num_inliers,
        inlier_ratio,
        pose,
        E,
        n_confident: int = -1,
    ) -> MatchResult:
        is_valid = (
            num_inliers >= self.min_inliers and inlier_ratio >= self.min_inlier_ratio
        )
        # confident-match cut: only when configured AND the path reports
        # the count (classical matchers pass -1 and are exempt)
        if self.min_confident_matches > 0 and n_confident >= 0:
            is_valid = is_valid and n_confident >= self.min_confident_matches
        confidence = min(1.0, inlier_ratio * (num_inliers / self.min_inliers))
        return MatchResult(
            query_idx=query_idx,
            match_idx=match_idx,
            num_keypoints_query=n1,
            num_keypoints_match=n2,
            num_matches=n_matches,
            num_inliers=num_inliers,
            inlier_ratio=inlier_ratio,
            relative_pose=pose,
            essential_matrix=E,
            confidence=confidence,
            is_valid=is_valid,
            num_confident_matches=n_confident,
        )

    def verify(
        self,
        image1: np.ndarray,
        image2: np.ndarray,
        K: Optional[np.ndarray] = None,
        query_idx: int = 0,
        match_idx: int = 0,
    ) -> MatchResult:
        """Single-pair verification.

        Field semantics: `num_keypoints_*` are DETECTOR totals and
        `num_matches` is the matched-pair count — consistent with
        `verify_pairs_batch`. (The reference collapses all three to the
        matched count at geometric_verification.py:625-627; we keep the
        dataclass's declared meaning instead.)
        """
        kpts1, kpts2, conf = self.matcher.detect_and_match(image1, image2)
        if len(kpts1) < 5:
            return _invalid_result(query_idx, match_idx)
        n_kp1, n_kp2 = getattr(
            self.matcher, "last_detector_counts", (len(kpts1), len(kpts2))
        )

        mask, E, ratio = self.matcher.verify_geometric_consistency(
            kpts1, kpts2, K, self.ransac_threshold
        )
        num_inliers = int(mask.sum()) if len(mask) else 0

        pose = None
        if K is not None and E is not None and num_inliers >= 5:
            pose = self.matcher.estimate_relative_pose(kpts1, kpts2, K, mask, E)

        # confident-match count only for matchers whose confidences share
        # the fused path's dual-softmax scale (ORB's Hamming similarity
        # does not -> -1, exempt from the cut)
        n_conf = (
            int((np.asarray(conf) >= 0.5).sum())
            if getattr(self.matcher, "confidence_is_calibrated", False)
            else -1
        )

        return self._result_from_counts(
            query_idx,
            match_idx,
            n_kp1,
            n_kp2,
            len(kpts1),
            num_inliers,
            float(ratio),
            pose,
            E,
            n_conf,
        )

    def verify_batch(
        self,
        image_pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
        K: Optional[np.ndarray] = None,
        indices: Optional[Sequence[Tuple[int, int]]] = None,
    ) -> List[MatchResult]:
        out = []
        for i, (im1, im2) in enumerate(image_pairs):
            q, m = indices[i] if indices is not None else (i, i)
            out.append(self.verify(im1, im2, K, q, m))
        return out

    # -- TPU-native batched path --------------------------------------------------
    def verify_pairs_batch(
        self,
        images0: np.ndarray,  # (P, H, W, 1) grayscale float [0,1]
        images1: np.ndarray,
        K: np.ndarray,
        indices: Optional[Sequence[Tuple[int, int]]] = None,
        seed: int = 0,
        batch_size: Optional[int] = None,
    ) -> List[MatchResult]:
        """Device-resident batch: detector + matcher + vmapped RANSAC/pose
        as ONE fused jitted dispatch when the matcher supports it
        (per-dispatch latency dominates the multi-call path on the tunnel).

        batch_size bounds the per-dispatch pair count: dense matchers
        (LoFTR) attend over ~1.5k coarse tokens per pair at 270x360, so
        an unchunked several-hundred-pair batch exhausts compile/HBM
        budgets (measured on the v2 quality scene).
        """
        P_total = int(len(images0))
        if batch_size and P_total > batch_size:
            out: List[MatchResult] = []
            for s in range(0, P_total, batch_size):
                e = min(s + batch_size, P_total)
                out += self.verify_pairs_batch(
                    images0[s:e], images1[s:e], K,
                    indices=indices[s:e] if indices is not None else None,
                    seed=seed + s,
                )
            return out
        hw = (int(images0.shape[1]), int(images0.shape[2]))
        if hasattr(self.matcher, "make_fused_verify"):
            key = (hw, float(np.asarray(K)[0, 0]))
            cache = getattr(self, "_fused_cache", None)
            if cache is None:
                cache = self._fused_cache = {}
            if key not in cache:
                cache[key] = self.matcher.make_fused_verify(
                    hw, K, self.ransac_threshold
                )
            fused = cache[key]
            (
                n_kp0, n_kp1, n_match, n_inl, ratios, Es, Ts, n_conf
            ) = jax.tree_util.tree_map(
                np.asarray,
                fused(
                    self.matcher.sp.params,
                    self.matcher.params,
                    jnp.asarray(images0),
                    jnp.asarray(images1),
                    jax.random.PRNGKey(seed),
                ),
            )
            P = len(n_match)
        elif not hasattr(self.matcher, "match_batch"):
            # classical matcher (e.g. the weight-free ORB fallback): its
            # front end batches internally but matching is per-pair
            return [
                self.verify(
                    np.asarray(images0[p]),
                    np.asarray(images1[p]),
                    K,
                    *(indices[p] if indices is not None else (p, p)),
                )
                for p in range(len(images0))
            ]
        elif getattr(self.matcher, "dense_matcher", False):
            # dense detector-free matcher (LoFTR): match_batch returns
            # already-paired points (DenseMatches), no keypoint indices.
            # P is data-dependent (survivor count), so pad to a power of
            # two — bounds compiles to log2 shapes instead of one per P
            # (the tunnel pays ~1-3 min per fresh server-side compile)
            im0, im1 = _pad_pairs_pow2(images0, images1)
            dm = self.matcher.match_batch(im0, im1)
            res, T, _good = essential_ransac_batch(
                dm.kpts0,
                dm.kpts1,
                dm.valid,
                jnp.asarray(K, jnp.float32),
                jax.random.PRNGKey(seed),
                threshold_px=self.ransac_threshold,
            )
            P = int(len(images0))
            n_match = np.asarray(jnp.sum(dm.valid, axis=1))
            n_inl = np.asarray(res.num_inliers)
            ratios = np.asarray(res.inlier_ratio)
            Es = np.asarray(res.E)
            Ts = np.asarray(T)
            # detector-free: "detected" keypoints == matched points
            n_kp0 = n_kp1 = n_match
            n_conf = (
                np.asarray(jnp.sum(dm.valid & (dm.scores >= 0.5), axis=1))
                if getattr(self.matcher, "confidence_is_calibrated", False)
                else np.full(P, -1)
            )
        else:
            im0, im1 = _pad_pairs_pow2(images0, images1)
            kp0, kp1, matches = self.matcher.match_batch(im0, im1)
            P = int(len(images0))
            idx = jnp.clip(matches.idx0, 0, kp1.coords.shape[1] - 1)
            mk1 = jnp.take_along_axis(kp1.coords, idx[..., None], axis=1)
            res, T, _good = essential_ransac_batch(
                kp0.coords,
                mk1,
                matches.valid,
                jnp.asarray(K, jnp.float32),
                jax.random.PRNGKey(seed),
                threshold_px=self.ransac_threshold,
            )
            n_match = np.asarray(jnp.sum(matches.valid, axis=1))
            n_inl = np.asarray(res.num_inliers)
            ratios = np.asarray(res.inlier_ratio)
            Es = np.asarray(res.E)
            Ts = np.asarray(T)
            n_kp0 = np.asarray(jnp.sum(kp0.mask, axis=1))
            n_kp1 = np.asarray(jnp.sum(kp1.mask, axis=1))
            n_conf = np.asarray(
                jnp.sum(matches.valid & (matches.scores >= 0.5), axis=1)
            )

        out = []
        for p in range(P):
            q, m = indices[p] if indices is not None else (p, p)
            if n_match[p] < 5:
                out.append(_invalid_result(q, m))
                continue
            out.append(
                self._result_from_counts(
                    q,
                    m,
                    int(n_kp0[p]),
                    int(n_kp1[p]),
                    int(n_match[p]),
                    int(n_inl[p]),
                    float(ratios[p]),
                    Ts[p],
                    Es[p],
                    int(n_conf[p]),
                )
            )
        return out


class SemanticGeometricVerifier(GeometricVerifier):
    """Floor gate BEFORE geometric work (reference :665-744)."""

    def __init__(
        self,
        matcher_type: str = "lightglue",
        min_inliers: int = 20,
        min_inlier_ratio: float = 0.25,
        enable_floor_gating: bool = True,
        **kwargs,
    ):
        super().__init__(matcher_type, min_inliers, min_inlier_ratio, **kwargs)
        self.enable_floor_gating = enable_floor_gating
        self.stats = {
            "verified": 0,
            "skipped_floor_mismatch": 0,
            "valid": 0,
            "invalid": 0,
        }

    def verify_with_semantics(
        self,
        image1: np.ndarray,
        image2: np.ndarray,
        floor1: int,
        floor2: int,
        K: Optional[np.ndarray] = None,
        query_idx: int = 0,
        match_idx: int = 0,
    ) -> MatchResult:
        if self.enable_floor_gating and floor1 != floor2:
            self.stats["skipped_floor_mismatch"] += 1
            return _invalid_result(query_idx, match_idx)

        result = self.verify(image1, image2, K, query_idx, match_idx)
        self.stats["verified"] += 1
        self.stats["valid" if result.is_valid else "invalid"] += 1
        return result

    def get_statistics(self) -> Dict:
        total = self.stats["verified"] + self.stats["skipped_floor_mismatch"]
        return {
            **self.stats,
            "total_candidates": total,
            "skip_rate": self.stats["skipped_floor_mismatch"] / total if total else 0,
            "valid_rate": self.stats["valid"] / self.stats["verified"]
            if self.stats["verified"]
            else 0,
        }
