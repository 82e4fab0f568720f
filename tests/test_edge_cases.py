"""Edge-case and robustness coverage across the stack."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlis_tpu.core.trajectory import Trajectory, combine_sequences, load_tum
from mlis_tpu.eval.alignment import umeyama
from mlis_tpu.eval.comprehensive import evaluate_algorithm_floor
from mlis_tpu.gating.gate import SemanticLoopClosureGate
from mlis_tpu.ops.pairwise import candidate_counts, candidate_counts_host


def test_umeyama_noise_robustness(rng):
    """Recovered transform degrades gracefully with noise."""
    from tests.test_alignment import _random_rotation

    R_true = _random_rotation(rng)
    src = rng.normal(size=(500, 3)) * 10
    tgt = 2.0 * src @ R_true.T + 5.0
    tgt_noisy = tgt + rng.normal(scale=0.05, size=tgt.shape)
    s, R, t = umeyama(src, tgt_noisy)
    assert s == pytest.approx(2.0, rel=1e-2)
    angle = np.degrees(
        np.arccos(np.clip((np.trace(R @ R_true.T) - 1) / 2, -1, 1))
    )
    assert angle < 0.5


def test_umeyama_minimum_points(rng):
    src = rng.normal(size=(3, 3))
    tgt = src @ np.eye(3) + 1.0
    s, R, t = umeyama(src, tgt, with_scale=False)
    np.testing.assert_allclose(t, np.ones(3), atol=1e-8)


def test_candidate_counts_single_pose():
    total, same, cross = candidate_counts(np.zeros((1, 3)), np.asarray([5]))
    assert (total, same, cross) == (0, 0, 0)
    assert candidate_counts_host(np.zeros((1, 3)), np.asarray([5])) == (0, 0, 0)


def test_candidate_counts_all_within_gap(rng):
    # every pair closer than min_gap in index -> zero candidates
    pos = rng.normal(size=(50, 3)) * 0.1
    fl = np.ones(50, int)
    assert candidate_counts(pos, fl, radius=10.0, min_gap=100)[0] == 0


def test_gate_empty_candidate_list():
    gate = SemanticLoopClosureGate(np.asarray([1, 2, 3]))
    valid, rejected = gate.gate_candidates([])
    assert valid == [] and rejected == []
    stats = gate.get_stats()
    assert stats["total_candidates"] == 0
    assert "acceptance_rate" not in stats  # undefined on empty input


def test_combine_preserves_timestamps_order():
    t1 = Trajectory(
        np.asarray([1.0, 2.0]), np.zeros((2, 3)), np.tile([0, 0, 0, 1.0], (2, 1))
    )
    t2 = Trajectory(
        np.asarray([10.0, 11.0]), np.ones((2, 3)), np.tile([0, 0, 0, 1.0], (2, 1))
    )
    mat, labels = combine_sequences([("a", 5, t1), ("b", 1, t2)])
    np.testing.assert_array_equal(mat[:, 0], [1.0, 2.0, 10.0, 11.0])


def test_evaluate_invalid_trajectory_short_circuits():
    # diverged trajectory: valid=False, no ATE fields
    t = np.arange(100) * 0.05
    pos = np.zeros((100, 3))
    pos[:, 0] = np.linspace(0, 5000, 100)  # 5 km for a 65 m floor
    traj = Trajectory(t, pos, np.tile([0, 0, 0, 1.0], (100, 1)))
    r = evaluate_algorithm_floor("orb_slam3", "1st_floor", traj, ref_traj=traj)
    assert not r["valid"]
    assert "diverged" in r["status"]
    assert "ate_vs_lego" not in r


def test_tum_malformed_lines_skipped(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text(
        "1.0 0 0 0 0 0 0 1\n"
        "not a number line\n"
        "2.0 1 0 0\n"  # too short
        "3.0 1 1 1 0 0 0 1\n"
    )
    # the word-line raises float conversion? loader splits and requires 8
    # floats; non-numeric lines must not crash the parse
    try:
        traj = load_tum(p)
    except ValueError:
        pytest.fail("malformed lines should be skipped, not fatal")
    assert len(traj) == 2


def test_flash_attention_bf16_inputs(rng):
    from mlis_tpu.ops.flash_attention import flash_attention

    q = jnp.asarray(rng.normal(size=(1, 64, 32)), jnp.bfloat16)
    out = flash_attention(q, q, q)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_knn_k_larger_than_db(rng):
    from mlis_tpu.ops.knn import cosine_topk

    d = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)
    scores, idx = cosine_topk(d, d, k=5)
    assert scores.shape == (5, 5)
