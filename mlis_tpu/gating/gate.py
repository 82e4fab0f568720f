"""Semantic loop-closure gate — floor-consistency filtering, vectorized.

Behavioral contract (reference scripts/semantic_gating/loop_closure_gate.py):
  * strict mode rejects any candidate whose endpoints carry different floor
    labels (floor_diff > 0); loose mode rejects only floor_diff > 1
    (reference :89-101).
  * statistics: total / accepted / rejected_cross_floor / acceptance_rate
    (reference :128-148).

TPU-first design: the gate is a pure function over index arrays — one
vectorized compare per batch of candidates, jittable and shardable. The
`SemanticLoopClosureGate` class is a thin stateful wrapper that accumulates
statistics across batches for report parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class LoopClosureCandidate:
    """One gated loop-closure candidate (mirrors reference :16-26)."""

    query_idx: int
    match_idx: int
    similarity_score: float
    query_floor: int
    match_floor: int
    is_valid: bool = True
    rejection_reason: str = ""


@jax.jit
def gate_mask(
    floor_labels: jnp.ndarray,
    query_idx: jnp.ndarray,
    match_idx: jnp.ndarray,
    strict: bool = True,
) -> jnp.ndarray:
    """Vectorized accept mask for candidate index pairs.

    Args:
        floor_labels: (N,) int floor label per keyframe.
        query_idx, match_idx: (M,) candidate endpoint indices.
        strict: strict (reject any floor diff) vs loose (reject diff > 1).

    Returns:
        (M,) bool — True where the candidate passes the gate.
    """
    qf = jnp.take(floor_labels, query_idx)
    mf = jnp.take(floor_labels, match_idx)
    diff = jnp.abs(qf - mf)
    return jnp.where(strict, diff == 0, diff <= 1)


class SemanticLoopClosureGate:
    """Stateful gate with accumulated statistics (API parity with reference)."""

    def __init__(self, floor_labels: np.ndarray, strict_mode: bool = True):
        self.floor_labels = np.asarray(floor_labels)
        self.strict_mode = strict_mode
        self.stats: Dict[str, float] = {
            "total_candidates": 0,
            "accepted": 0,
            "rejected_cross_floor": 0,
            "rejected_other": 0,
        }

    # -- vectorized core ---------------------------------------------------
    def gate_batch(
        self, query_idx: np.ndarray, match_idx: np.ndarray
    ) -> np.ndarray:
        """Gate a batch of candidates at once; updates stats; returns mask."""
        query_idx = np.asarray(query_idx)
        match_idx = np.asarray(match_idx)
        mask = np.asarray(
            gate_mask(
                jnp.asarray(self.floor_labels),
                jnp.asarray(query_idx),
                jnp.asarray(match_idx),
                self.strict_mode,
            )
        )
        n = int(mask.shape[0])
        acc = int(mask.sum())
        self.stats["total_candidates"] += n
        self.stats["accepted"] += acc
        self.stats["rejected_cross_floor"] += n - acc
        return mask

    # -- reference-parity per-candidate API ---------------------------------
    def gate_candidate(
        self, query_idx: int, match_idx: int, similarity_score: float = 0.0
    ) -> LoopClosureCandidate:
        qf = int(self.floor_labels[query_idx])
        mf = int(self.floor_labels[match_idx])
        diff = abs(qf - mf)
        rejected = diff > 0 if self.strict_mode else diff > 1
        c = LoopClosureCandidate(
            query_idx=query_idx,
            match_idx=match_idx,
            similarity_score=similarity_score,
            query_floor=qf,
            match_floor=mf,
        )
        self.stats["total_candidates"] += 1
        if rejected:
            c.is_valid = False
            c.rejection_reason = (
                f"Cross-floor: {qf} vs {mf}"
                if self.strict_mode
                else f"Floor diff > 1: {qf} vs {mf}"
            )
            self.stats["rejected_cross_floor"] += 1
        else:
            self.stats["accepted"] += 1
        return c

    def gate_candidates(
        self, candidates: Sequence[Tuple[int, int, float]]
    ) -> Tuple[List[LoopClosureCandidate], List[LoopClosureCandidate]]:
        if len(candidates) == 0:
            return [], []
        arr = np.asarray([(q, m) for q, m, _ in candidates], dtype=np.int64)
        mask = self.gate_batch(arr[:, 0], arr[:, 1])
        valid, rejected = [], []
        for (q, m, s), ok in zip(candidates, mask):
            qf = int(self.floor_labels[q])
            mf = int(self.floor_labels[m])
            c = LoopClosureCandidate(int(q), int(m), float(s), qf, mf, bool(ok))
            if ok:
                valid.append(c)
            else:
                c.rejection_reason = (
                    f"Cross-floor: {qf} vs {mf}"
                    if self.strict_mode
                    else f"Floor diff > 1: {qf} vs {mf}"
                )
                rejected.append(c)
        return valid, rejected

    def get_stats(self) -> Dict:
        total = self.stats["total_candidates"]
        if total > 0:
            self.stats["acceptance_rate"] = self.stats["accepted"] / total
            self.stats["rejection_rate"] = 1 - self.stats["acceptance_rate"]
        return self.stats

    def print_summary(self) -> None:
        stats = self.get_stats()
        print("\n" + "=" * 50)
        print("LOOP CLOSURE GATING SUMMARY")
        print("=" * 50)
        print(f"Total candidates:      {stats['total_candidates']}")
        print(f"Accepted:              {stats['accepted']}")
        print(f"Rejected (cross-floor): {stats['rejected_cross_floor']}")
        if total := stats["total_candidates"]:
            print(f"Acceptance rate:       {stats['accepted'] / total:.1%}")
            print(
                f"Perceptual aliasing prevented: {stats['rejected_cross_floor']}"
            )
        print("=" * 50)


def generate_orbslam3_patch(function_name: str = "CheckFloorConsistency") -> str:
    """Emit the C++ floor-consistency hook for ORB-SLAM3's LoopClosing.cc
    (capability parity with reference loop_closure_gate.py:216-258: a
    strict-mode keyframe floor check inserted before ComputeSim3)."""
    return f"""\
// Floor-consistency gate for ORB-SLAM3 loop closing.
// Insert into src/LoopClosing.cc; call after DBoW2 candidate retrieval and
// before ComputeSim3(). KeyFrames must carry an mnFloorLabel member filled
// from the IMU floor detector during tracking.

bool LoopClosing::{function_name}(KeyFrame* pQuery, KeyFrame* pCandidate)
{{
    const int queryFloor = pQuery->mnFloorLabel;
    const int matchFloor = pCandidate->mnFloorLabel;
    if (queryFloor != matchFloor) {{
        // strict mode: any floor difference is perceptual aliasing
        return false;
    }}
    return true;
}}

// In DetectLoop(), filter the DBoW2 candidates:
//   vector<KeyFrame*> vpValid;
//   for (KeyFrame* pKF : vpCandidateKFs)
//       if ({function_name}(mpCurrentKF, pKF)) vpValid.push_back(pKF);
//   // continue geometric verification with vpValid only
"""


class ContextualPriorFactor:
    """Factor-graph constraint emitters (reference loop_closure_gate.py:151-213).

    Vectorized: `floor_priors` emits the full per-pose z-prior arrays in one
    shot; dict emitters retained for per-factor parity.
    """

    def __init__(self, floor_labels: np.ndarray):
        self.floor_labels = np.asarray(floor_labels)

    def floor_priors(self, floor_height: float = 3.0, sigma_z: float = 0.5):
        """(expected_z (N,), sigma_z (N,)) arrays for all poses at once."""
        expected_z = self.floor_labels.astype(np.float64) * floor_height
        return expected_z, np.full_like(expected_z, sigma_z)

    def create_floor_constraint(self, pose_idx: int, floor_height: float = 3.0) -> Dict:
        floor = int(self.floor_labels[pose_idx])
        return {
            "type": "floor_prior",
            "pose_idx": pose_idx,
            "floor": floor,
            "expected_z": floor * floor_height,
            "noise_model": "diagonal",
            "sigma_z": 0.5,
        }

    def create_elevator_transition_factor(
        self,
        pose_before: int,
        pose_after: int,
        direction: str,
        floor_height: float = 3.0,
    ) -> Dict:
        return {
            "type": "elevator_transition",
            "pose_before": pose_before,
            "pose_after": pose_after,
            "expected_dz": floor_height if direction == "up" else -floor_height,
            "noise_model": "diagonal",
            "sigma_dz": 0.3,
        }
