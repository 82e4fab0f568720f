"""LiDAR ground-plane floor tracking — batched RANSAC on TPU.

Behavioral contract (reference scripts/semantic_gating/lidar_floor_tracker.py):
  * ground candidates: Ouster ring < 30, else z below 5th-percentile + 0.5 m
    (:81-89);
  * RANSAC: 3-point plane hypotheses via cross product, inlier threshold
    0.1 m, keep max-inlier plane (:114-138);
  * robot height = |d| of the unit-normal plane, sign flipped when the
    normal points down (:143-165);
  * deque-smoothed z over the last `smoothing_window` scans; floor =
    round((smoothed_z - reference_z) / floor_height) (:217-221);
  * confidence = inlier_ratio * 1 / (1 + 10 * var(z_history)) (:224-226);
  * transitions = floor-number changes spaced >= min_duration (:242-272);
  * per-pose labels by nearest scan time (:274-299).

TPU design: instead of a Python loop of 100 `np.random.choice` draws per
scan, ALL hypotheses for ALL scans are drawn up front with jax.random and
evaluated as one (S, H, P) masked reduction — `vmap` over scans, matmul-free
VPU work with static shapes. The sequential smoothing/reference state is a
closed-form vectorized pass (causal window mean via cumsum).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class FloorEstimate:
    """Per-scan floor estimate (field parity with reference :22-30)."""

    timestamp: float
    z_height: float
    floor_number: int
    confidence: float
    num_ground_points: int


def extract_ground_mask(
    points: jnp.ndarray,
    rings: Optional[jnp.ndarray],
    valid: Optional[jnp.ndarray] = None,
    ground_ring_threshold: int = 30,
) -> jnp.ndarray:
    """Ground-candidate mask (reference :81-89). `valid` masks padding."""
    if rings is not None:
        mask = rings < ground_ring_threshold
    else:
        z = points[:, 2]
        big = jnp.where(valid, z, jnp.inf) if valid is not None else z
        # percentile over valid points only
        if valid is not None:
            n_valid = jnp.maximum(jnp.sum(valid), 1)
            z_sorted = jnp.sort(big)
            k = jnp.clip((0.05 * (n_valid - 1)).astype(jnp.int32), 0, z.shape[0] - 1)
            z_min = z_sorted[k]
        else:
            z_min = jnp.percentile(z, 5)
        mask = z < (z_min + 0.5)
    if valid is not None:
        mask = mask & valid
    return mask


@functools.partial(jax.jit, static_argnames=("iterations",))
def fit_plane_ransac_batch(
    points: jnp.ndarray,  # (S, P, 3) padded scans
    ground_mask: jnp.ndarray,  # (S, P) bool
    key: jax.Array,
    iterations: int = 128,
    threshold: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched RANSAC ground-plane fit over S scans at once.

    Returns (planes (S, 4) [nx, ny, nz, d] unit-normal, inlier_ratio (S,)).
    Hypothesis sampling is restricted to ground candidates by re-weighting
    random picks onto valid indices (gumbel-free: uniform over a compacted
    index map built with sort).
    """
    S, P, _ = points.shape

    # Compact valid indices to the front per scan: order = argsort(!mask)
    order = jnp.argsort(~ground_mask, axis=1, stable=True)  # valid first
    n_valid = jnp.sum(ground_mask, axis=1)  # (S,)

    # Draw 3 indices per (scan, hypothesis) uniform over [0, n_valid)
    u = jax.random.uniform(key, (S, iterations, 3))
    draw = (u * jnp.maximum(n_valid, 1)[:, None, None]).astype(jnp.int32)
    draw = jnp.minimum(draw, jnp.maximum(n_valid - 1, 0)[:, None, None])
    idx = jnp.take_along_axis(order[:, None, :], draw, axis=2)  # (S, H, 3)

    tri = jnp.take_along_axis(points, idx.reshape(S, -1)[..., None], axis=1)
    tri = tri.reshape(S, iterations, 3, 3)  # (S, H, 3 pts, xyz)

    v1 = tri[:, :, 1] - tri[:, :, 0]
    v2 = tri[:, :, 2] - tri[:, :, 0]
    normal = jnp.cross(v1, v2)  # (S, H, 3)
    norm_len = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    degenerate = norm_len[..., 0] < 1e-6
    normal = normal / jnp.maximum(norm_len, 1e-12)
    d = -jnp.sum(normal * tri[:, :, 0], axis=-1)  # (S, H)

    # Inlier counting: distances (S, H, P) via einsum
    dist = jnp.abs(
        jnp.einsum("shc,spc->shp", normal, points) + d[..., None]
    )
    inl = (dist < threshold) & ground_mask[:, None, :]
    counts = jnp.sum(inl, axis=-1)  # (S, H)
    counts = jnp.where(degenerate, -1, counts)

    best = jnp.argmax(counts, axis=1)  # (S,)
    best_counts = jnp.take_along_axis(counts, best[:, None], axis=1)[:, 0]
    best_normal = jnp.take_along_axis(normal, best[:, None, None], axis=1)[:, 0]
    best_d = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]

    planes = jnp.concatenate([best_normal, best_d[:, None]], axis=1)
    ratio = best_counts / jnp.maximum(n_valid, 1)
    ratio = jnp.where(n_valid > 0, ratio, 0.0)
    return planes, ratio


def robot_height_from_plane(planes: jnp.ndarray) -> jnp.ndarray:
    """Signed robot height above the fitted plane.

    The reference (:143-165) computes |d| and flips sign when c < 0 — but a
    3-point RANSAC hypothesis has a RANDOM normal orientation, so that
    formula flips sign scan-to-scan on identical geometry. We canonicalize
    the plane so the normal points up (n_z >= 0); the sensor height above
    the ground is then just d (positive when the ground is below). This is
    the behavior the reference's own integration PASS bands assume
    (test_lidar_floor_tracker.py: single-floor z-std < 0.15 m), which the
    literal formula cannot satisfy.
    """
    flip = planes[:, 2] < 0
    d = jnp.where(flip, -planes[:, 3], planes[:, 3])
    return d


@functools.partial(jax.jit, static_argnames=("window",))
def smooth_and_label(
    z: jnp.ndarray,  # (S,) per-scan raw heights
    valid: jnp.ndarray,  # (S,) bool — scans with enough ground points
    floor_height: float,
    window: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Causal trailing-window mean/variance over valid scans + floor index.

    Mirrors the reference's deque(maxlen=window) over sequential scans:
    invalid scans contribute nothing and inherit the previous estimate.
    Returns (smoothed_z, floor_number, stability) per scan.
    """
    S = z.shape[0]

    def body(carry, inp):
        buf, count, ref_z, have_ref, last_smooth, last_floor = carry
        zi, ok = inp

        def push(_):
            buf2 = jnp.roll(buf, -1).at[-1].set(zi)
            cnt2 = jnp.minimum(count + 1, window)
            return buf2, cnt2

        buf, count = jax.lax.cond(ok, push, lambda _: (buf, count), None)
        slots = jnp.arange(window) >= (window - count)
        total = jnp.sum(jnp.where(slots, buf, 0.0))
        mean = total / jnp.maximum(count, 1)
        var = jnp.sum(jnp.where(slots, (buf - mean) ** 2, 0.0)) / jnp.maximum(
            count, 1
        )
        ref_z2 = jnp.where(have_ref | ~ok, ref_z, zi)
        have2 = have_ref | ok
        smooth = jnp.where(ok, mean, last_smooth)
        floor = jnp.where(
            ok,
            jnp.round((mean - ref_z2) / floor_height).astype(jnp.int32),
            last_floor,
        )
        stability = 1.0 / (1.0 + var * 10.0)
        return (buf, count, ref_z2, have2, smooth, floor), (smooth, floor, stability)

    init = (
        jnp.zeros(window),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0.0),
        jnp.asarray(False),
        jnp.asarray(0.0),
        jnp.asarray(0, jnp.int32),
    )
    _, (smoothed, floors, stab) = jax.lax.scan(body, init, (z, valid))
    return smoothed, floors, stab


class LiDARFloorTracker:
    """Stateful per-scan API (reference parity) + batched TPU path."""

    def __init__(
        self,
        floor_height: float = 3.5,
        ground_ring_threshold: int = 30,
        ransac_iterations: int = 128,
        ransac_threshold: float = 0.1,
        min_ground_points: int = 100,
        smoothing_window: int = 10,
        seed: int = 0,
    ):
        self.floor_height = floor_height
        self.ground_ring_threshold = ground_ring_threshold
        self.ransac_iterations = ransac_iterations
        self.ransac_threshold = ransac_threshold
        self.min_ground_points = min_ground_points
        self.smoothing_window = smoothing_window
        self._key = jax.random.PRNGKey(seed)

        self.z_history: List[float] = []
        self.floor_history: List[FloorEstimate] = []
        self.current_floor: int = 0
        self.reference_z: Optional[float] = None

    # -- batched TPU path ----------------------------------------------------
    def process_scans(
        self,
        scans: np.ndarray,  # (S, P, 3) padded point clouds
        timestamps: np.ndarray,  # (S,)
        rings: Optional[np.ndarray] = None,  # (S, P) or None
        point_valid: Optional[np.ndarray] = None,  # (S, P) padding mask
    ) -> List[FloorEstimate]:
        """Process a whole bag of scans in one device program."""
        scans_j = jnp.asarray(scans, jnp.float32)
        S, P, _ = scans_j.shape
        valid = (
            jnp.asarray(point_valid, bool)
            if point_valid is not None
            else jnp.ones((S, P), bool)
        )
        if rings is not None:
            gmask = (jnp.asarray(rings) < self.ground_ring_threshold) & valid
        else:
            gmask = jax.vmap(
                lambda p, v: extract_ground_mask(p, None, v, self.ground_ring_threshold)
            )(scans_j, valid)

        self._key, sub = jax.random.split(self._key)
        planes, ratios = fit_plane_ransac_batch(
            scans_j, gmask, sub, self.ransac_iterations, self.ransac_threshold
        )
        heights = robot_height_from_plane(planes)
        n_ground = jnp.sum(gmask, axis=1)
        scan_ok = n_ground >= self.min_ground_points

        smoothed, floors, stability = smooth_and_label(
            heights, scan_ok, self.floor_height, self.smoothing_window
        )
        conf = jnp.where(scan_ok, ratios * stability, 0.0)

        smoothed = np.asarray(smoothed)
        floors = np.asarray(floors)
        conf = np.asarray(conf)
        n_ground = np.asarray(n_ground)
        ok = np.asarray(scan_ok)
        estimates = []
        for i in range(S):
            est = FloorEstimate(
                timestamp=float(timestamps[i]),
                z_height=float(smoothed[i]),
                floor_number=int(floors[i]),
                confidence=float(conf[i]),
                num_ground_points=int(n_ground[i]),
            )
            estimates.append(est)
            # Low-confidence scans are returned but NOT recorded, matching
            # the per-scan API and the reference's early-return paths
            # (lidar_floor_tracker.py:186-207): get_floor_labels /
            # detect_floor_transitions only see plane-fit-backed scans.
            if ok[i]:
                self.floor_history.append(est)
        if estimates:
            self.current_floor = estimates[-1].floor_number
        return estimates

    # -- reference-parity per-scan API ----------------------------------------
    def process_scan(
        self,
        points: np.ndarray,
        timestamp: float,
        rings: Optional[np.ndarray] = None,
    ) -> FloorEstimate:
        pts = jnp.asarray(points, jnp.float32)[None]  # (1, P, 3)
        valid = jnp.ones((1, pts.shape[1]), bool)
        if rings is not None:
            gmask = (jnp.asarray(rings)[None] < self.ground_ring_threshold) & valid
        else:
            gmask = jax.vmap(lambda p, v: extract_ground_mask(p, None, v))(pts, valid)

        n_ground = int(jnp.sum(gmask))
        if n_ground < self.min_ground_points:
            est = FloorEstimate(
                timestamp=timestamp,
                z_height=self.z_history[-1] if self.z_history else 0.0,
                floor_number=self.current_floor,
                confidence=0.0,
                num_ground_points=n_ground,
            )
            return est

        self._key, sub = jax.random.split(self._key)
        planes, ratios = fit_plane_ransac_batch(
            pts, gmask, sub, self.ransac_iterations, self.ransac_threshold
        )
        z_height = float(robot_height_from_plane(planes)[0])
        self.z_history.append(z_height)
        self.z_history = self.z_history[-self.smoothing_window :]
        if self.reference_z is None:
            self.reference_z = z_height

        smoothed_z = float(np.mean(self.z_history))
        floor_number = int(round((smoothed_z - self.reference_z) / self.floor_height))
        z_var = float(np.var(self.z_history)) if len(self.z_history) > 1 else 1.0
        confidence = float(ratios[0]) * (1.0 / (1.0 + z_var * 10.0))
        self.current_floor = floor_number

        est = FloorEstimate(
            timestamp=timestamp,
            z_height=smoothed_z,
            floor_number=floor_number,
            confidence=confidence,
            num_ground_points=n_ground,
        )
        self.floor_history.append(est)
        return est

    def detect_floor_transitions(
        self, min_duration: float = 2.0
    ) -> List[Tuple[float, int, int]]:
        """Floor changes spaced >= min_duration (reference :242-272)."""
        if len(self.floor_history) < 2:
            return []
        transitions = []
        last_floor = self.floor_history[0].floor_number
        last_t = self.floor_history[0].timestamp
        for est in self.floor_history[1:]:
            if est.floor_number != last_floor:
                if est.timestamp - last_t >= min_duration:
                    transitions.append((est.timestamp, last_floor, est.floor_number))
                    last_t = est.timestamp
                last_floor = est.floor_number
        return transitions

    def get_floor_labels(self, timestamps: np.ndarray) -> np.ndarray:
        """Nearest-scan floor label per pose (vectorized, reference :274-299)."""
        if not self.floor_history:
            return np.zeros(len(timestamps), dtype=int)
        from mlis_tpu.eval.association import nearest_indices

        scan_t = np.asarray([e.timestamp for e in self.floor_history])
        scan_f = np.asarray([e.floor_number for e in self.floor_history])
        order = np.argsort(scan_t, kind="stable")
        # stable nearest w.r.t. original order on exact ties is irrelevant
        # here (scan times are unique per bag)
        j = nearest_indices(np.asarray(timestamps, np.float64), scan_t[order])
        return scan_f[order][j]

    def reset(self) -> None:
        self.z_history.clear()
        self.floor_history.clear()
        self.current_floor = 0
        self.reference_z = None
