"""Test harness config: run on a virtual 8-device CPU mesh by default.

Multi-chip sharding is validated on `--xla_force_host_platform_device_count=8`
(no multi-chip TPU hardware in CI); set MLIS_TEST_PLATFORM=tpu to run the
suite on a real chip instead.
"""

import os

_platform = os.environ.get("MLIS_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    # Force CPU even when the ambient environment points JAX at a TPU
    # plugin: the suite must be deterministic, must not contend for the
    # single-tenant TPU, and needs 8 virtual devices for sharding tests.
    # The environment's sitecustomize may force jax_platforms to the TPU
    # plugin at interpreter start, so the env var alone is not enough —
    # override the config after import, before any backend initializes.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_TRAJECTORIES = os.environ.get(
    "MLIS_TRAJECTORY_ROOT", "/root/reference/results/trajectories"
)


def has_reference_data() -> bool:
    return os.path.isdir(REFERENCE_TRAJECTORIES)


requires_reference_data = pytest.mark.skipif(
    not has_reference_data(),
    reason="published reference trajectories not available",
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
