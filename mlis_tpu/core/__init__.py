from mlis_tpu.core.trajectory import (  # noqa: F401
    Trajectory,
    load_tum,
    save_tum,
    combine_sequences,
    trajectory_length,
    endpoint_drift,
)
from mlis_tpu.core.dataset import NUFRM3F, SequenceSpec  # noqa: F401
