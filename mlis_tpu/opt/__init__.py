"""TPU-native factor-graph optimization (pose graphs on-chip)."""

from mlis_tpu.opt.pose_graph import (  # noqa: F401
    PoseGraphFactors,
    build_factors,
    optimize_pose_graph,
)
