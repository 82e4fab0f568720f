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

# Cold-box test tiers (round-2 verdict: a cold machine pays 20-50 s of
# XLA compile per heavyweight test; `-m smoke` gives a <2 min signal).
# Durations-derived list of the compile-heavy tests (>15 s warm, several
# minutes cold); everything not heavy and not slow is marked `smoke`.
HEAVY_TESTS = {
    "test_matcher_trainer.py::test_matcher_training_improves_recall",
    "test_graft_entry.py::test_dryrun_multichip_8",
    "test_graft_entry.py::test_dryrun_multichip_2",
    "test_parallel.py::test_trainer_checkpoint_roundtrip",
    "test_parallel.py::test_vpr_trainer_end_to_end",
    "test_parallel.py::test_sharded_forward_matches_single_device",
    "test_full_gate.py::test_full_gate_end_to_end",
    "test_full_gate.py::test_full_gate_fused_budget_matches_two_phase",
    "test_full_gate.py::test_full_gate_from_config",
    "test_full_gate.py::test_full_gate_mono_matches_replicated_rgb",
    "test_sharded_gate.py::test_sharded_gate_matches_single_device",
    "test_sharded_gate.py::test_sharded_gate_exactness_matches_pipeline",
    "test_sharded_gate.py::test_sharded_gate_inexact_mode_reports_drops",
    "test_yolo.py::test_yolov8_forward_shapes",
    "test_yolo.py::test_dynamic_filter_metrics",
    "test_yolo.py::test_detector_end_to_end_tiny",
    "test_convert.py::test_loftr_converter_full_dims_template",
    "test_convert.py::test_loftr_converter_stage_parity",
    "test_convert.py::test_lightglue_converter",
    "test_convert.py::test_resnet_converter_shapes_and_forward",
    "test_convert.py::test_superpoint_converter",
    "test_vpr.py::test_anyloc_tiny_vlad",
    "test_vpr.py::test_salad_tiny_descriptor",
    "test_models.py::test_vit_remat_matches_forward_and_grads",
    "test_verification.py::test_matcher_identical_images_match_self",
    "test_verification.py::test_loftr_tiny_match",
    "test_trained_matcher.py::test_shipped_checkpoint_meets_recall_milestone",
    "test_trained_matcher.py::test_checkpoint_loads_into_bench_configuration",
    "test_trained_matcher.py::test_tiny_matcher_auto_load_keeps_random_init",
    "test_yolo.py::test_decode_predictions_in_bounds",
    "test_convert.py::test_loftr_converter_end_to_end_matches",
    "test_convert.py::test_dinov2_converter_forward_and_qkv_layout",
    "test_verification.py::test_verifier_batch_device_path",
    "test_verification.py::test_matcher_batch_shapes",
    "test_verification.py::test_superpoint_detect_shapes",
    "test_vpr.py::test_mixvpr_tiny_descriptor",
    "test_models.py::test_resnet_tiny_shapes",
    "test_full_gate.py::test_full_gate_no_verify_mode",
    "test_full_gate.py::test_full_gate_empty_when_threshold_high",
    "test_quality.py::test_gate_decisions_trained_vs_random",
    "test_full_gate.py::test_full_gate_match_top_k_prunes_but_preserves_pairs",
    "test_vpr_finetune.py::test_finetune_reduces_cross_floor_retrieval",
    "test_vpr_finetune.py::test_aliasing_set_construction",
    "test_loftr_trainer.py::test_loftr_training_improves_recall",
    "test_loftr_trainer.py::test_loftr_checkpoint_roundtrip",
    "test_matcher_families.py::test_verify_pairs_batch_dense_matcher",
    "test_matcher_families.py::test_verify_pairs_batch_dense_matches_single_pair_path",
    "test_matcher_families.py::test_pretrain_matcher_superglue_arch",
    "test_matcher_families.py::test_quality_bench_loftr_matcher",
    "test_trained_loftr.py::test_shipped_loftr_checkpoint_meets_recall_milestone",
    "test_trained_loftr.py::test_shipped_loftr_improves_gate_decisions",
    "test_trained_superglue.py::test_shipped_superglue_checkpoint_meets_recall_milestone",
    "test_trained_superglue.py::test_shipped_superglue_perfect_gate_decisions",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.nodeid.split("::")[0].rsplit("/", 1)[-1]
        base = item.nodeid.split("::")[-1].split("[")[0]
        key = f"{fname}::{base}"
        if key in HEAVY_TESTS:
            item.add_marker(pytest.mark.heavy)
        elif "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)


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
