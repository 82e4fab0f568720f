"""mlis_tpu — TPU-native multi-level indoor SLAM benchmarking & semantic gating.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
suite `wadewilliamsw1234/Multi-level-Indoor-SLAM` (see /root/reference):
floor detection (IMU + LiDAR), semantic loop-closure gating, visual place
recognition (MixVPR / SALAD / AnyLoc / CricaVPR), geometric verification
(SuperPoint + LightGlue / LoFTR + batched RANSAC), trajectory evaluation
(Umeyama ATE/RPE), and reporting — all designed TPU-first: batched, static
shapes, MXU-friendly GEMMs, Pallas kernels for hot paths, and
`jax.sharding` meshes for scale-out.

The public API mirrors the reference package surface
(`scripts/semantic_gating/__init__.py:22-86` in the reference) so a user of
the reference can find every symbol here, but the implementations are new.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache (kernels recompile per process through
# the TPU tunnel otherwise). Opt out with MLIS_COMPILE_CACHE=0.
# The env var alone is not enough when jax was imported before mlis_tpu
# (jax snapshots config env at its own import) — update the live config
# too, so CPU test processes actually persist their compiles.
# The cache dir is keyed by the HOST CPU's microarchitecture: XLA:CPU
# entries are AOT artifacts specialized to the compile machine's ISA
# features, and loading one on a host with a different feature set
# SEGFAULTS in the cache read (observed when this VM migrated between
# machine types — the cached +amx/+prefer-no-scatter code crashed the
# new host). A per-µarch subdir makes stale entries unreachable instead
# of fatal.
def _host_cpu_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return platform.machine() or "unknown"


if _os.environ.get("MLIS_COMPILE_CACHE", "1") != "0":
    _cache_dir = _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser(f"~/.cache/mlis_tpu/jax-{_host_cpu_tag()}"),
    )
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(_os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
        )
    except Exception:  # pragma: no cover - cache is best-effort
        pass

# Re-exports assembled lazily to keep import light; heavy model modules are
# imported on first attribute access.
from mlis_tpu.config import GatingConfig, PipelineConfig  # noqa: F401

_LAZY = {
    # floor detection
    "IMUFloorDetector": "mlis_tpu.gating.floor_detector",
    "ElevatorEvent": "mlis_tpu.gating.floor_detector",
    "LiDARFloorTracker": "mlis_tpu.gating.lidar_floor_tracker",
    "FloorEstimate": "mlis_tpu.gating.lidar_floor_tracker",
    "MultiModalFloorDetector": "mlis_tpu.gating.fusion",
    # gate
    "SemanticLoopClosureGate": "mlis_tpu.gating.gate",
    "LoopClosureCandidate": "mlis_tpu.gating.gate",
    "ContextualPriorFactor": "mlis_tpu.gating.gate",
    # pipeline + integrations
    "SemanticGatingPipeline": "mlis_tpu.gating.pipeline",
    "StreamingGate": "mlis_tpu.gating.streaming",
    "StreamingMatches": "mlis_tpu.gating.streaming",
    "ORBSlam3SemanticIntegration": "mlis_tpu.gating.integration",
    "DroidSlamSemanticIntegration": "mlis_tpu.gating.integration",
    "LegoLoamSemanticIntegration": "mlis_tpu.gating.integration",
    # VPR
    "BasePlaceRecognition": "mlis_tpu.gating.place_recognition",
    "PlaceMatch": "mlis_tpu.gating.place_recognition",
    "PlaceDescriptor": "mlis_tpu.gating.place_recognition",
    "SemanticPlaceRecognition": "mlis_tpu.gating.place_recognition",
    "MixVPR": "mlis_tpu.models.mixvpr",
    "SALAD": "mlis_tpu.models.salad",
    "AnyLoc": "mlis_tpu.models.anyloc",
    "CricaVPR": "mlis_tpu.models.cricavpr",
    # geometric verification
    "BaseFeatureMatcher": "mlis_tpu.gating.verification",
    "MatchResult": "mlis_tpu.gating.verification",
    "LightGlue": "mlis_tpu.models.lightglue",
    "SuperGlue": "mlis_tpu.models.lightglue",
    "LoFTR": "mlis_tpu.models.loftr",
    "GeometricVerifier": "mlis_tpu.gating.verification",
    "SemanticGeometricVerifier": "mlis_tpu.gating.verification",
}


def __getattr__(name):
    mod = _LAZY.get(name)
    if mod is None:
        raise AttributeError(f"module 'mlis_tpu' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
