"""Trajectory error metrics — ATE, RPE, rotation error, segment analysis,
problem regions, tracking quality, smoothness, validity gating.

Vectorized re-design of the reference's per-pose loops
(scripts/evaluation/comprehensive_evaluation.py:206-435,
scripts/evaluation/final_eval.py:36-58). Backend-generic via `xp`
(numpy float64 on host, jax.numpy under jit).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# Annotated problem regions (fractions of trajectory) — reference
# comprehensive_evaluation.py:43-52.
PROBLEM_REGIONS: Dict[str, Dict[str, Dict]] = {
    "5th_floor": {
        "A": {"start_pct": 0.25, "end_pct": 0.40, "type": "dynamic",
              "description": "Dynamic content (people)"},
        "B": {"start_pct": 0.55, "end_pct": 0.70, "type": "featureless",
              "description": "Featureless corridor + tight turn"},
    },
    "1st_floor": {
        "C": {"start_pct": 0.10, "end_pct": 0.30, "type": "glass",
              "description": "Glass walls, reflections"},
        "D": {"start_pct": 0.60, "end_pct": 0.80, "type": "open",
              "description": "Open atrium"},
    },
}


def cumulative_distance(positions, xp=np):
    d = xp.linalg.norm(xp.diff(positions, axis=0), axis=1)
    return xp.concatenate([xp.zeros(1, dtype=d.dtype), xp.cumsum(d)])


def _stats(errors, xp=np, with_min=False) -> Dict[str, float]:
    out = {
        "rmse": float(xp.sqrt(xp.mean(errors**2))),
        "mean": float(xp.mean(errors)),
        "median": float(xp.median(errors)),
        "std": float(xp.std(errors)),
        "max": float(xp.max(errors)),
    }
    if with_min:
        out["min"] = float(xp.min(errors))
    return out


def compute_ate(est_positions, ref_positions, xp=np) -> Dict:
    """Absolute trajectory error between associated, aligned positions."""
    errors = xp.linalg.norm(est_positions - ref_positions, axis=1)
    out = _stats(errors, xp, with_min=True)
    out["errors"] = errors
    return out


def compute_rpe(positions, delta: float = 1.0, xp=np) -> Optional[Dict]:
    """Relative pose error over `delta`-meter segments.

    Reference semantics (comprehensive_evaluation.py:219-257): for each pose
    i, find j = searchsorted(cumdist, cumdist[i] + delta); error is the
    relative deviation of chord length from path length, in percent.
    Vectorized: the reference's early `break` on target > total_length is
    equivalent to masking since cumdist is non-decreasing.
    """
    positions = xp.asarray(positions)
    n = positions.shape[0]
    if n < 2:
        return None
    cum = cumulative_distance(positions, xp)
    total = cum[-1]

    i_idx = xp.arange(n - 1)
    target = cum[:-1] + delta
    j_idx = xp.searchsorted(cum, target)
    valid = (target <= total) & (j_idx < n)

    j_safe = xp.clip(j_idx, 0, n - 1)
    actual = xp.linalg.norm(positions[j_safe] - positions[i_idx], axis=1)
    expected = cum[j_safe] - cum[:-1]
    valid = valid & (expected > 0)

    if not bool(xp.any(valid)):
        return None
    vals = xp.abs(actual - expected) / xp.where(expected > 0, expected, 1.0) * 100.0
    vals = vals[valid]
    out = _stats(vals, xp)
    out["values"] = vals
    out["indices"] = i_idx[valid]
    return out


def compute_rotation_error(est_quats, ref_quats, xp=np) -> Optional[Dict]:
    """Relative rotation angle per pose pair, degrees.

    For unit quaternions the geodesic angle of R_ref^-1 R_est is
    2*arccos(|<q_est, q_ref>|) — replaces the reference's per-pose scipy
    Rotation loop (comprehensive_evaluation.py:259-282).
    """
    est = xp.asarray(est_quats, dtype=np.float64 if xp is np else None)
    ref = xp.asarray(ref_quats, dtype=np.float64 if xp is np else None)
    if est.shape[0] == 0:
        return None
    est = est / xp.linalg.norm(est, axis=1, keepdims=True)
    ref = ref / xp.linalg.norm(ref, axis=1, keepdims=True)
    dots = xp.clip(xp.abs(xp.sum(est * ref, axis=1)), 0.0, 1.0)
    angles = xp.degrees(2.0 * xp.arccos(dots))
    out = _stats(angles, xp)
    out["errors"] = angles
    return out


def compute_segment_metrics(
    est_positions, ref_positions, num_segments: int = 10, xp=np
) -> List[Dict]:
    """Per-segment ATE over equal index ranges (reference :288-314)."""
    n = len(est_positions)
    seg = n // num_segments
    if seg == 0:
        return []
    out = []
    for i in range(num_segments):
        start = i * seg
        end = (i + 1) * seg if i < num_segments - 1 else n
        errors = xp.linalg.norm(
            est_positions[start:end] - ref_positions[start:end], axis=1
        )
        if errors.shape[0] == 0:
            continue
        out.append(
            {
                "segment": i + 1,
                "start_idx": start,
                "end_idx": end,
                "start_pct": start / n * 100,
                "end_pct": end / n * 100,
                "rmse": float(xp.sqrt(xp.mean(errors**2))),
                "max": float(xp.max(errors)),
                "num_poses": int(end - start),
            }
        )
    return out


def compute_error_at_distances(
    est_positions,
    ref_positions,
    distances: Sequence[float] = (10, 25, 50, 100, 150),
    xp=np,
) -> Dict[float, Optional[float]]:
    """Positional error sampled at fixed path distances (reference :316-334)."""
    cum = cumulative_distance(ref_positions, xp)
    total = cum[-1]
    out: Dict[float, Optional[float]] = {}
    for d in distances:
        if d > total:
            out[d] = None
            continue
        idx = int(xp.searchsorted(cum, d))
        if idx < len(est_positions):
            out[d] = float(
                xp.linalg.norm(est_positions[idx] - ref_positions[idx])
            )
        else:
            out[d] = None
    return out


def analyze_problem_regions(
    est_positions, ref_positions, floor: str, regions=PROBLEM_REGIONS, xp=np
) -> Dict[str, Dict]:
    """RMSE inside annotated problem regions vs the rest (reference :340-378)."""
    if floor not in regions:
        return {}
    n = len(est_positions)
    results = {}
    for name, info in regions[floor].items():
        s = int(info["start_pct"] * n)
        e = int(info["end_pct"] * n)
        if e <= s:
            continue
        errors = xp.linalg.norm(est_positions[s:e] - ref_positions[s:e], axis=1)
        other_est = xp.concatenate([est_positions[:s], est_positions[e:]])
        other_ref = xp.concatenate([ref_positions[:s], ref_positions[e:]])
        other = xp.linalg.norm(other_est - other_ref, axis=1)
        region_rmse = float(xp.sqrt(xp.mean(errors**2)))
        other_rmse = (
            float(xp.sqrt(xp.mean(other**2))) if other.shape[0] > 0 else 0.0
        )
        results[name] = {
            "type": info["type"],
            "description": info["description"],
            "start_pct": info["start_pct"] * 100,
            "end_pct": info["end_pct"] * 100,
            "region_rmse": region_rmse,
            "region_max": float(xp.max(errors)),
            "other_rmse": other_rmse,
            "degradation_factor": region_rmse / other_rmse if other_rmse > 0 else 0.0,
            "num_poses": int(e - s),
        }
    return results


def analyze_tracking_quality(
    timestamps: np.ndarray, expected_rate: float = 20.0
) -> Dict:
    """Tracking continuity: gaps, pose rate, completeness (reference :384-414)."""
    from mlis_tpu.eval.association import normalize_timestamps

    t = normalize_timestamps(timestamps)
    dt = np.diff(t)
    expected_dt = 1.0 / expected_rate
    gaps = dt > 2 * expected_dt
    total_time = float(t[-1] - t[0]) if len(t) else 0.0
    return {
        "total_poses": int(len(t)),
        "total_time": total_time,
        "expected_poses": int(total_time * expected_rate),
        "pose_rate": float(len(t) / total_time) if total_time > 0 else 0.0,
        "completeness": float(len(t) / (total_time * expected_rate) * 100)
        if total_time > 0
        else 0.0,
        "num_gaps": int(gaps.sum()),
        "gap_indices": np.nonzero(gaps)[0].tolist(),
        "max_gap": float(dt.max()) if len(dt) else 0.0,
        "mean_dt": float(dt.mean()) if len(dt) else 0.0,
    }


def compute_trajectory_smoothness(positions, xp=np) -> Optional[Dict]:
    """Second-difference (jerkiness) statistics (reference :416-435)."""
    if len(positions) < 3:
        return None
    acc = xp.diff(positions, n=2, axis=0)
    mag = xp.linalg.norm(acc, axis=1)
    mean = float(xp.mean(mag))
    return {
        "mean_acceleration": mean,
        "max_acceleration": float(xp.max(mag)),
        "std_acceleration": float(xp.std(mag)),
        "smoothness_score": 1.0 / (1.0 + mean),
    }


def is_valid_trajectory(
    positions, expected_len: float, max_ratio: float = 10.0, xp=np
) -> Tuple[bool, str]:
    """Divergence gate (reference final_eval.py:51-58): trajectories longer
    than max_ratio x expected or shorter than 0.1 x expected are FAIL."""
    d = xp.linalg.norm(xp.diff(positions, axis=0), axis=1)
    length = float(xp.sum(d))
    if length > expected_len * max_ratio:
        return False, f"diverged ({length:.0f}m vs {expected_len}m expected)"
    if length < expected_len * 0.1:
        return False, f"too short ({length:.1f}m vs {expected_len}m expected)"
    return True, "ok"
