"""Single dataclass-based config system.

The reference spreads configuration over three mechanisms (argparse CLIs,
per-algorithm YAML/JSON in config/, env vars + Makefile variables — see
reference SURVEY §5). Here one typed tree of dataclasses covers all of it,
serializable to/from JSON or YAML-ish dicts, with env-var overrides for
paths only.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict


def _env_path(var: str, default: str) -> str:
    return os.environ.get(var, default)


@dataclass
class DataConfig:
    """Dataset locations. Defaults resolve to the published reference results
    so the parity suite runs out of the box; override via env or fields."""

    trajectory_root: str = field(
        default_factory=lambda: _env_path(
            "MLIS_TRAJECTORY_ROOT", "/root/reference/results/trajectories"
        )
    )
    dataset_root: str = field(
        default_factory=lambda: _env_path("MLIS_DATASET_ROOT", "/data/ISEC")
    )
    results_root: str = field(
        default_factory=lambda: _env_path("MLIS_RESULTS_ROOT", "./results")
    )


@dataclass
class FloorDetectorConfig:
    """IMU elevator detection thresholds (reference floor_detector.py:43-58)."""

    z_accel_threshold: float = 0.5  # m/s^2 deviation from gravity
    min_duration: float = 2.0  # seconds
    window_size: int = 50  # smoothing window, samples
    horizontal_var_threshold: float = 1.0
    max_events: int = 32  # static-shape padding for jitted event extraction


@dataclass
class LidarTrackerConfig:
    """LiDAR ground-plane floor tracking (reference lidar_floor_tracker.py)."""

    ransac_iterations: int = 128  # reference: 100; rounded up for tiling
    inlier_threshold: float = 0.1  # meters
    ground_ring_max: int = 30  # Ouster OS-128 lower rings
    floor_height: float = 3.5  # meters per floor (ISEC)
    smoothing_window: int = 10
    max_points: int = 8192  # static-shape cap on ground candidates


@dataclass
class GateConfig:
    """Floor-consistency gate (reference loop_closure_gate.py:89-101)."""

    strict_mode: bool = True  # strict: reject any floor diff; loose: diff > 1
    floor_height: float = 3.0  # for contextual z-priors
    sigma_z: float = 0.5
    sigma_dz: float = 0.3


@dataclass
class CandidateConfig:
    """Proximity candidate generation (reference orb_slam3_integration.py:167-217)."""

    distance_threshold: float = 2.0  # meters
    min_time_gap: int = 100  # frames
    tile: int = 2048  # TPU tile edge for the all-pairs sweep


@dataclass
class VPRConfig:
    method: str = "cricavpr"  # mixvpr | salad | anyloc | cricavpr
    descriptor_dim: int = 4096
    top_k: int = 10
    similarity_threshold: float = 0.5
    min_time_gap_s: float = 10.0
    batch_size: int = 32
    dtype: str = "bfloat16"


@dataclass
class VerificationConfig:
    """Geometric verification thresholds (reference geometric_verification.py:537-553,616-620)."""

    matcher: str = "lightglue"  # lightglue | superglue | loftr | orb (weight-free)
    max_keypoints: int = 2048
    ransac_threshold_px: float = 3.0
    ransac_prob: float = 0.999
    ransac_hypotheses: int = 512
    min_inliers: int = 20
    min_inlier_ratio: float = 0.25


@dataclass
class MeshConfig:
    """Device-mesh layout for pjit/shard_map scale-out."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1  # -1: all devices on the data axis
    model_parallel: int = 1


@dataclass
class GatingConfig:
    floor: FloorDetectorConfig = field(default_factory=FloorDetectorConfig)
    lidar: LidarTrackerConfig = field(default_factory=LidarTrackerConfig)
    gate: GateConfig = field(default_factory=GateConfig)
    candidates: CandidateConfig = field(default_factory=CandidateConfig)


@dataclass
class PipelineConfig:
    data: DataConfig = field(default_factory=DataConfig)
    gating: GatingConfig = field(default_factory=GatingConfig)
    vpr: VPRConfig = field(default_factory=VPRConfig)
    verification: VerificationConfig = field(default_factory=VerificationConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    # -- (de)serialization ------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "PipelineConfig":
        import typing

        def build(tp, val):
            if dataclasses.is_dataclass(tp) and isinstance(val, dict):
                hints = typing.get_type_hints(tp)
                kw = {
                    f.name: build(hints[f.name], val[f.name])
                    for f in dataclasses.fields(tp)
                    if f.name in val
                }
                return tp(**kw)
            return val

        return build(cls, d)

    def save(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.to_dict(), indent=2))

    @classmethod
    def load(cls, path: str | Path) -> "PipelineConfig":
        return cls.from_dict(json.loads(Path(path).read_text()))
