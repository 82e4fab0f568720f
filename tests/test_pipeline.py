"""Pipeline driver + semantic evaluation + viz smoke tests."""

import numpy as np
import pytest

from mlis_tpu.eval.semantic_eval import (
    DynamicFilteringMetrics,
    FloorDetectionMetrics,
    LoopClosureMetrics,
    SemanticEvaluator,
    floor_detection_metrics,
    parse_gating_report,
    trajectory_velocity_metrics,
)
from mlis_tpu.gating.pipeline import SemanticGatingPipeline, make_demo_data, run_demo


def test_demo_pipeline_end_to_end(tmp_path, capsys):
    p = run_demo(output_dir=str(tmp_path))
    assert (tmp_path / "semantic_gating_report.txt").exists()
    # demo injects one down then one up event starting on floor 5
    assert len(p.floor_detector.events) == 2
    assert p.floor_detector.events[0].direction == "down"
    assert p.floor_detector.events[1].direction == "up"
    labels = set(np.unique(p.floor_labels).tolist())
    assert {4, 5}.issubset(labels)
    out = capsys.readouterr().out
    assert "valid=" in out or "Gating" in out


def test_pipeline_file_io(tmp_path):
    traj, imu = make_demo_data()
    tpath = tmp_path / "traj.txt"
    np.savetxt(tpath, traj)
    ipath = tmp_path / "imu.csv"
    np.savetxt(ipath, imu, delimiter=",")

    p = SemanticGatingPipeline(output_dir=str(tmp_path))
    p.load_trajectory(str(tpath))
    p.load_imu_data(str(ipath))
    events, labels = p.detect_floors(start_floor=5)
    assert len(events) == 2
    assert len(labels) == len(traj)


def test_pipeline_gate_counts(tmp_path):
    p = SemanticGatingPipeline(output_dir=str(tmp_path))
    p.trajectory, p.imu_data = make_demo_data()
    p.detect_floors(start_floor=5)
    valid, rejected = p.gate_candidates([(100, 4500, 0.9), (500, 2500, 0.9)])
    # pose 100 and 4500 are both after/before events? ensure stats counted
    s = p.loop_gate.get_stats()
    assert s["total_candidates"] == 2
    assert s["accepted"] + s["rejected_cross_floor"] == 2


def test_pipeline_errors_without_data(tmp_path):
    p = SemanticGatingPipeline(output_dir=str(tmp_path))
    with pytest.raises(ValueError):
        p.detect_floors()
    with pytest.raises(ValueError):
        p.create_loop_closure_gate()


def test_visualizations_written(tmp_path):
    p = SemanticGatingPipeline(output_dir=str(tmp_path))
    p.trajectory, p.imu_data = make_demo_data()
    p.detect_floors()
    f1 = p.visualize_results()
    f2 = p.visualize_3d()
    assert f1.exists() and f1.stat().st_size > 1000
    assert f2.exists() and f2.stat().st_size > 1000


# ---------------- semantic evaluation ----------------


def test_loop_closure_metrics_properties():
    m = LoopClosureMetrics(
        total_candidates=100,
        true_positives=30,
        false_positives=10,
        false_negatives=5,
        same_floor_candidates=40,
        cross_floor_candidates=60,
        cross_floor_rejected=60,
    )
    assert m.precision == pytest.approx(0.75)
    assert m.recall == pytest.approx(30 / 35)
    assert 0 < m.f1_score < 1
    assert m.cross_floor_rate == pytest.approx(0.6)
    assert m.gating_effectiveness == 1.0
    assert LoopClosureMetrics().gating_effectiveness == 1.0


def test_floor_detection_metrics():
    pred = np.array([5, 5, 1, 1, 4])
    gt = np.array([5, 5, 1, 2, 4])
    m = floor_detection_metrics(pred, gt, events_detected=2, events_ground_truth=2)
    assert m.floor_accuracy == pytest.approx(0.8)
    assert m.elevator_precision == 1.0


def test_dynamic_filtering_metrics():
    m = DynamicFilteringMetrics(
        total_frames=100,
        frames_with_dynamic_objects=25,
        total_features_extracted=10000,
        features_filtered=1500,
    )
    assert m.dynamic_object_rate == pytest.approx(0.25)
    assert m.feature_filter_rate == pytest.approx(0.15)


def test_parse_gating_report_text():
    text = """
TRAJECTORY SUMMARY
  Total poses: 2406
LOOP CLOSURE ANALYSIS
  Total candidates detected: 87044
  Same-floor (valid): 21477
  Cross-floor (perceptual aliasing): 65567
"""
    m = parse_gating_report(text)
    assert m.total_candidates == 87044
    assert m.same_floor_candidates == 21477
    assert m.cross_floor_candidates == 65567
    assert m.cross_floor_rate == pytest.approx(0.753, abs=1e-3)


def test_parse_reference_published_report():
    import os

    path = "/root/reference/results/semantic_gating/lego_loam_semantic_analysis.txt"
    if not os.path.exists(path):
        pytest.skip("reference reports unavailable")
    m = parse_gating_report(path)
    assert m.total_candidates == 87044
    assert m.cross_floor_candidates == 65567


def test_semantic_evaluator_tables(tmp_path):
    report = tmp_path / "orb_slam3_semantic_analysis.txt"
    report.write_text(
        "Total candidates detected: 100\n"
        "Same-floor (valid): 40\nCross-floor (perceptual aliasing): 60\n"
    )
    ev = SemanticEvaluator(results_dir=str(tmp_path))
    traj, _ = make_demo_data()
    ev.evaluate_algorithm("orb_slam3", tum_matrix=traj)
    js = ev.to_json(str(tmp_path / "sem.json"))
    assert '"cross_floor_rate": 0.6' in js
    md = ev.comparison_markdown(str(tmp_path / "sem.md"))
    assert "| orb_slam3 | 100 | 40 | 60 | 60.0% | 100.0% |" in md


def test_semantic_evaluator_ate_fields(tmp_path):
    """ATE fields populated from direct reference comparison and from
    comprehensive-eval results (VERDICT r1 #9)."""
    ev = SemanticEvaluator(results_dir=str(tmp_path))
    t = np.arange(50) * 0.1
    pos = np.zeros((50, 3))
    pos[:, 0] = np.arange(50) * 0.2
    ref = np.column_stack([t, pos, np.zeros((50, 3)), np.ones(50)])
    est = ref.copy()
    est[:, 2] += 0.5  # constant lateral offset, removed by SE(3) alignment
    est[:, 1] += np.sin(np.arange(50) * 0.3) * 0.1  # residual error

    r = ev.evaluate_algorithm("orb_slam3", tum_matrix=est, reference_tum=ref)
    assert r.ate_rmse > 0
    assert r.ate_max >= r.ate_rmse >= r.ate_mean > 0

    comp = {
        "droid_slam": {
            "5th_floor": {"ate_vs_lego": {"rmse": 0.2, "mean": 0.15, "max": 0.5}},
            "1st_floor": {"ate_vs_lego": {"rmse": 0.4, "mean": 0.3, "max": 0.9}},
            "4th_floor": {"valid": False},
        }
    }
    r2 = ev.evaluate_algorithm("droid_slam", comprehensive_results=comp)
    assert r2.ate_rmse == pytest.approx(0.3)
    assert r2.ate_mean == pytest.approx(0.225)
    assert r2.ate_max == pytest.approx(0.9)

    md = ev.comparison_markdown()
    assert "## Trajectory Accuracy" in md
    assert "| droid_slam | 0.300m | 0.225m | 0.900m |" in md

    js = ev.to_json()
    assert '"ate_rmse": 0.3' in js


def test_velocity_metrics():
    t = np.arange(100) * 0.1
    pos = np.zeros((100, 3))
    pos[:, 0] = np.arange(100) * 0.2  # 2 m/s
    tum = np.column_stack([t, pos, np.zeros((100, 3)), np.ones(100)])
    vm = trajectory_velocity_metrics(tum)
    assert vm["mean_velocity"] == pytest.approx(2.0, rel=1e-6)
    assert vm["velocity_std"] == pytest.approx(0.0, abs=1e-9)


def test_paper_figures(tmp_path):
    import os

    if not os.path.isdir("/root/reference/results/trajectories"):
        pytest.skip("reference data unavailable")
    from mlis_tpu.viz.paper_figures import generate_figure6, generate_figure7

    f6 = generate_figure6(
        "/root/reference/results/trajectories", tmp_path / "fig6.png",
        algorithm="lego_loam", sample_poses=800,
    )
    assert f6.exists() and f6.stat().st_size > 1000
    f7 = generate_figure7(
        "/root/reference/results/trajectories", tmp_path / "fig7.png"
    )
    assert f7 is not None and f7.exists()


def test_euroc_export(tmp_path, rng):
    from mlis_tpu.core.bag import (
        BagWriter,
        encode_image,
        encode_imu,
        export_euroc,
    )

    bag = tmp_path / "seq.bag"
    w = BagWriter(bag)
    img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    for i in range(4):
        t = 100.0 + i * 0.05
        w.write("/camera_array/cam1/image_raw", "sensor_msgs/Image", t,
                encode_image(t, img))
        w.write("/camera_array/cam3/image_raw", "sensor_msgs/Image", t + 0.003,
                encode_image(t + 0.003, img))
    for i in range(20):
        t = 100.0 + i * 0.005
        w.write("/vectornav/imu", "sensor_msgs/Imu", t,
                encode_imu(t, [0, 0, 9.81], [0.1, 0, 0]))
    w.close()

    counts = export_euroc(bag, tmp_path / "euroc")
    assert counts == {"stereo_pairs": 4, "imu_samples": 20}
    mav0 = tmp_path / "euroc" / "mav0"
    assert len(list((mav0 / "cam0" / "data").glob("*.png"))) == 4
    csv = (mav0 / "imu0" / "data.csv").read_text().splitlines()
    assert csv[0].startswith("#timestamp")
    assert len(csv) == 21
    # gyro before accel in EuRoC column order
    assert csv[1].split(",")[1:4] == ["0.1", "0.0", "0.0"]


def test_stage_timer():
    import time as _time

    from mlis_tpu.utils.profiling import StageTimer

    t = StageTimer(sync=False)
    with t.stage("a"):
        _time.sleep(0.01)
    with t.stage("a"):
        _time.sleep(0.01)
    with t.stage("b"):
        pass
    rep = t.report()
    assert rep["a"]["calls"] == 2
    assert rep["a"]["total_s"] >= 0.02
    assert "a" in t.summary() and "b" in t.summary()
