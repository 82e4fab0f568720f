"""IMU elevator-event floor detection — vectorized jax.numpy design.

Behavioral contract (reference scripts/semantic_gating/floor_detector.py):
  * median-detrend the z accel, uniform-filter (window 50) both the detrended
    z and the horizontal energy ax^2+ay^2 (:79-83);
  * elevator mask = |az_smooth| > 0.5 AND horiz_var < 1.0 (:86-87);
  * contiguous mask runs that END inside the stream and last >= 2 s are
    events (a run still active at the final sample is NOT emitted — falling
    edge only, :94-117);
  * direction = sign of trapezoidal integral of az_smooth over the run;
  * floor labels walk events from start_floor; poses whose time falls inside
    an event's [start, end) window keep label 0 ("in elevator", :142-154).

TPU design: the signal path (detrend/filter/mask/integral) is one jitted
function; event extraction returns fixed-size padded arrays (max_events) so
it stays jittable; label assignment is a vectorized comparison against the
event table.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlis_tpu.ops.filters import cumtrapz, uniform_filter1d


@dataclass
class ElevatorEvent:
    """One detected elevator ride (field parity with reference :17-27)."""

    start_time: float
    end_time: float
    duration: float
    direction: str  # 'up' or 'down'
    start_idx: int
    end_idx: int
    floor_change: int  # +1 up, -1 down


@functools.partial(jax.jit, static_argnames=("window_size", "max_events"))
def detect_elevator_events_padded(
    timestamps: jnp.ndarray,
    accel_x: jnp.ndarray,
    accel_y: jnp.ndarray,
    accel_z: jnp.ndarray,
    z_accel_threshold: float = 0.5,
    min_duration: float = 2.0,
    window_size: int = 50,
    horizontal_var_threshold: float = 1.0,
    max_events: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fully-jitted event extraction with static shapes.

    Returns (n_events, start_idx (max_events,), end_idx, z_integral) where
    entries beyond n_events are padding (-1 indices).
    """
    az_det = accel_z - jnp.median(accel_z)
    az_smooth = uniform_filter1d(az_det, window_size)
    horiz_var = uniform_filter1d(accel_x**2 + accel_y**2, window_size)
    mask = (jnp.abs(az_smooth) > z_accel_threshold) & (
        horiz_var < horizontal_var_threshold
    )

    # Rising edge at i: mask[i] & ~mask[i-1] (mask[-1] treated False).
    # Falling edge at i: ~mask[i] & mask[i-1] — the event's exclusive end.
    prev = jnp.concatenate([jnp.zeros(1, dtype=bool), mask[:-1]])
    rising = mask & ~prev
    falling = ~mask & prev

    n = mask.shape[0]
    idx = jnp.arange(n)
    # k-th rising/falling index (sorted); padded with n
    def take_k(edge):
        order = jnp.where(edge, idx, n)
        return jnp.sort(order)[:max_events]

    starts = take_k(rising)
    ends = take_k(falling)
    # A trailing active run has a start without a falling edge -> ends fills
    # with n; such runs are dropped (reference emits on falling edge only).
    valid = (starts < n) & (ends < n)

    starts_c = jnp.clip(starts, 0, n - 1)
    ends_c = jnp.clip(ends, 0, n - 1)
    duration = timestamps[ends_c] - timestamps[starts_c]
    valid = valid & (duration >= min_duration)

    # integral of az_smooth over [start, end) == cumtrapz[end-1] - cumtrapz[start]
    ct = cumtrapz(az_smooth, timestamps)
    z_integral = ct[jnp.clip(ends_c - 1, 0, n - 1)] - ct[starts_c]

    n_events = jnp.sum(valid.astype(jnp.int32))
    starts_out = jnp.where(valid, starts, -1)
    ends_out = jnp.where(valid, ends, -1)
    z_out = jnp.where(valid, z_integral, 0.0)
    return n_events, starts_out, ends_out, z_out


@functools.partial(jax.jit, static_argnames=())
def assign_floor_labels_vectorized(
    trajectory_times: jnp.ndarray,
    event_starts_t: jnp.ndarray,  # (E,) start times (padded with +inf)
    event_ends_t: jnp.ndarray,  # (E,) end times (padded with +inf)
    event_changes: jnp.ndarray,  # (E,) +-1 (padded with 0)
    start_floor: int,
) -> jnp.ndarray:
    """Label each pose: start_floor + sum of changes of completed events;
    poses inside an event window keep label 0 (reference :142-154)."""
    t = trajectory_times[:, None]  # (N, 1)
    completed = t >= event_ends_t[None, :]
    in_ride = (t >= event_starts_t[None, :]) & (t < event_ends_t[None, :])
    floor = start_floor + jnp.sum(
        jnp.where(completed, event_changes[None, :], 0), axis=1
    )
    return jnp.where(jnp.any(in_ride, axis=1), 0, floor).astype(jnp.int32)


class IMUFloorDetector:
    """API-parity wrapper around the jitted detection kernels."""

    def __init__(
        self,
        z_accel_threshold: float = 0.5,
        min_duration: float = 2.0,
        window_size: int = 50,
        horizontal_var_threshold: float = 1.0,
        max_events: int = 32,
    ):
        self.z_accel_threshold = z_accel_threshold
        self.min_duration = min_duration
        self.window_size = window_size
        self.horizontal_var_threshold = horizontal_var_threshold
        self.max_events = max_events
        self.events: List[ElevatorEvent] = []
        self.floor_labels: Optional[np.ndarray] = None

    def detect_elevator_events(
        self,
        timestamps: np.ndarray,
        accel_x: np.ndarray,
        accel_y: np.ndarray,
        accel_z: np.ndarray,
    ) -> List[ElevatorEvent]:
        # Work in relative time on-device: absolute ROS stamps lose sub-ms
        # resolution in float32.
        t0 = float(np.asarray(timestamps)[0])
        t_rel = jnp.asarray(np.asarray(timestamps, dtype=np.float64) - t0, jnp.float32)
        n_events, starts, ends, z_int = detect_elevator_events_padded(
            t_rel,
            jnp.asarray(accel_x, jnp.float32),
            jnp.asarray(accel_y, jnp.float32),
            jnp.asarray(accel_z, jnp.float32),
            self.z_accel_threshold,
            self.min_duration,
            self.window_size,
            self.horizontal_var_threshold,
            self.max_events,
        )
        n_events = int(n_events)
        starts = np.asarray(starts)[:]
        ends = np.asarray(ends)
        z_int = np.asarray(z_int)
        ts = np.asarray(timestamps, dtype=np.float64)

        self.events = []
        for s, e, zi in zip(starts, ends, z_int):
            if s < 0 or e < 0:
                continue
            direction = "up" if zi > 0 else "down"
            self.events.append(
                ElevatorEvent(
                    start_time=float(ts[s]),
                    end_time=float(ts[e]),
                    duration=float(ts[e] - ts[s]),
                    direction=direction,
                    start_idx=int(s),
                    end_idx=int(e),
                    floor_change=1 if direction == "up" else -1,
                )
            )
        self.events.sort(key=lambda ev: ev.start_time)
        return self.events

    def assign_floor_labels(
        self, trajectory_times: np.ndarray, start_floor: int = 5
    ) -> np.ndarray:
        ts = np.asarray(trajectory_times, dtype=np.float64)
        t0 = ts[0] if len(ts) else 0.0
        E = max(len(self.events), 1)
        starts = np.full(E, np.inf)
        ends = np.full(E, np.inf)
        changes = np.zeros(E)
        for i, ev in enumerate(self.events):
            starts[i] = ev.start_time - t0
            ends[i] = ev.end_time - t0
            changes[i] = ev.floor_change
        labels = assign_floor_labels_vectorized(
            jnp.asarray(ts - t0, jnp.float32),
            jnp.asarray(starts, jnp.float32),
            jnp.asarray(ends, jnp.float32),
            jnp.asarray(changes, jnp.float32),
            start_floor,
        )
        self.floor_labels = np.asarray(labels)
        return self.floor_labels
