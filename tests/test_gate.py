import numpy as np

from mlis_tpu.gating.gate import ContextualPriorFactor, SemanticLoopClosureGate


def _floor_labels():
    # Mirrors the reference demo layout (loop_closure_gate.py:266-272)
    labels = np.zeros(10000, dtype=int)
    labels[0:5000] = 5
    labels[5000:7000] = 1
    labels[7000:8500] = 4
    labels[8500:10000] = 2
    return labels


CANDIDATES = [
    (100, 4500, 0.85, True),  # same floor (5)
    (200, 5500, 0.92, False),  # 5 vs 1
    (5100, 6800, 0.88, True),  # same floor (1)
    (300, 7200, 0.91, False),  # 5 vs 4
    (7100, 8200, 0.87, True),  # same floor (4)
    (400, 9000, 0.93, False),  # 5 vs 2
    (4000, 4200, 0.80, True),  # same floor (5)
]


def test_gate_strict_matches_expected():
    gate = SemanticLoopClosureGate(_floor_labels(), strict_mode=True)
    valid, rejected = gate.gate_candidates([(q, m, s) for q, m, s, _ in CANDIDATES])
    assert len(valid) == sum(1 for c in CANDIDATES if c[3])
    assert len(rejected) == sum(1 for c in CANDIDATES if not c[3])
    stats = gate.get_stats()
    assert stats["total_candidates"] == len(CANDIDATES)
    assert stats["accepted"] == len(valid)
    assert stats["rejected_cross_floor"] == len(rejected)
    assert stats["acceptance_rate"] == len(valid) / len(CANDIDATES)


def test_gate_loose_allows_adjacent_floor():
    labels = np.array([1, 1, 2, 3])
    gate = SemanticLoopClosureGate(labels, strict_mode=False)
    c = gate.gate_candidate(0, 2)  # diff 1 -> accepted in loose mode
    assert c.is_valid
    c = gate.gate_candidate(0, 3)  # diff 2 -> rejected
    assert not c.is_valid


def test_gate_batch_mask_and_stats():
    gate = SemanticLoopClosureGate(_floor_labels(), strict_mode=True)
    arr = np.asarray([(q, m) for q, m, _, _ in CANDIDATES])
    mask = gate.gate_batch(arr[:, 0], arr[:, 1])
    np.testing.assert_array_equal(mask, [c[3] for c in CANDIDATES])


def test_gate_candidate_per_item_parity():
    gate = SemanticLoopClosureGate(_floor_labels(), strict_mode=True)
    for q, m, s, ok in CANDIDATES:
        c = gate.gate_candidate(q, m, s)
        assert c.is_valid == ok
        if not ok:
            assert "Cross-floor" in c.rejection_reason


def test_contextual_priors():
    labels = np.array([5, 1, 4])
    f = ContextualPriorFactor(labels)
    d = f.create_floor_constraint(0)
    assert d["expected_z"] == 15.0 and d["sigma_z"] == 0.5
    up = f.create_elevator_transition_factor(10, 20, "up")
    dn = f.create_elevator_transition_factor(10, 20, "down")
    assert up["expected_dz"] == 3.0 and dn["expected_dz"] == -3.0
    assert up["sigma_dz"] == 0.3
    z, sz = f.floor_priors()
    np.testing.assert_allclose(z, [15.0, 3.0, 12.0])


def test_orbslam3_patch_codegen():
    from mlis_tpu.gating.gate import generate_orbslam3_patch

    code = generate_orbslam3_patch()
    assert "CheckFloorConsistency" in code
    assert "mnFloorLabel" in code
    assert "return false" in code
    code2 = generate_orbslam3_patch("MyGate")
    assert "LoopClosing::MyGate" in code2
