"""CLI surface tests (subprocess-free: call main() directly)."""

import json

import numpy as np
import pytest
import yaml

from tests.conftest import requires_reference_data, REFERENCE_TRAJECTORIES

from mlis_tpu.cli import main


@requires_reference_data
def test_cli_gate_lego(tmp_path, capsys):
    rc = main(
        [
            "gate",
            "--trajectory-root", REFERENCE_TRAJECTORIES,
            "--output", str(tmp_path),
            "--algorithms", "lego_loam",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Total candidates detected: 87044" in out
    assert (tmp_path / "lego_loam_semantic_analysis.txt").exists()
    metrics = json.loads((tmp_path / "semantic_gating_metrics.json").read_text())
    assert metrics["lego_loam"]["loop_closure"]["total_candidates"] == 87044
    assert (tmp_path / "semantic_gating_comparison.md").exists()


@requires_reference_data
def test_cli_evaluate_fast(tmp_path, capsys):
    rc = main(
        [
            "evaluate",
            "--trajectory-root", REFERENCE_TRAJECTORIES,
            "--output", str(tmp_path),
            "--fast",
        ]
    )
    assert rc == 0
    data = json.loads((tmp_path / "final_evaluation.json").read_text())
    assert data["droid_slam"]["5th_floor"]["scale"] == pytest.approx(3.1248, abs=1e-3)


def test_cli_pipeline_demo(tmp_path, capsys):
    rc = main(["pipeline", "--demo", "--output", str(tmp_path)])
    assert rc == 0
    assert "SEMANTIC GATING PIPELINE REPORT" in capsys.readouterr().out


def test_cli_calib_orbslam3(tmp_path, capsys):
    cams = {
        "cam0": {
            "intrinsics": [800.0, 800.0, 360.0, 270.0],
            "resolution": [720, 540],
            "distortion_coeffs": [0, 0, 0, 0],
        },
        "cam1": {
            "intrinsics": [800.0, 800.0, 360.0, 270.0],
            "resolution": [720, 540],
            "distortion_coeffs": [0, 0, 0, 0],
            "T_cn_cnm1": np.eye(4).tolist(),
        },
    }
    cpath = tmp_path / "cams.yaml"
    cpath.write_text(yaml.dump(cams))
    out = tmp_path / "orb.yaml"
    rc = main(
        [
            "calib", "orbslam3",
            "--cameras", str(cpath),
            "--left", "cam0", "--right", "cam1",
            "--output", str(out),
        ]
    )
    assert rc == 0
    assert "LoopClosing.Enabled: 0" in out.read_text()


def test_cli_calib_sample_and_info(tmp_path, capsys):
    """`sample` emits a loadable Kalibr template; `info` inspects it with
    per-camera intrinsics and pairwise baselines (reference
    calib_converter.py info/sample subcommands)."""
    spath = tmp_path / "sample.yaml"
    rc = main(["calib", "sample", "--output", str(spath)])
    assert rc == 0
    rc = main(["calib", "info", "--cameras", str(spath)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Found 2 cameras" in out
    assert "Resolution: 1280x800" in out
    assert "cam0-cam1: 0.1640m" in out
    # info without --cameras is a usage error
    assert main(["calib", "info"]) == 2


def test_cli_calib_vins_requires_imu(tmp_path, capsys):
    cpath = tmp_path / "cams.yaml"
    cpath.write_text(yaml.dump({"cam0": {"intrinsics": [1, 1, 0, 0], "resolution": [4, 4]}}))
    rc = main(["calib", "vins", "--cameras", str(cpath)])
    assert rc == 2


def test_cli_bag_info_and_extract(tmp_path, capsys):
    from mlis_tpu.core.bag import BagWriter, encode_imu, encode_odometry

    bag = tmp_path / "t.bag"
    w = BagWriter(bag)
    for i in range(30):
        t = 100.0 + i * 0.005
        w.write("/vectornav/imu", "sensor_msgs/Imu", t,
                encode_imu(t, [0, 0, 9.81], [0, 0, 0]))
    for i in range(5):
        w.write("/odom", "nav_msgs/Odometry", 100.0 + i,
                encode_odometry(100.0 + i, [i, 0, 0], [0, 0, 0, 1]))
    w.close()

    rc = main(["bag", "info", str(bag)])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["message_counts"]["/vectornav/imu"] == 30

    out_csv = tmp_path / "imu.csv"
    rc = main(["bag", "imu-csv", str(bag), "--output", str(out_csv)])
    assert rc == 0
    rows = np.loadtxt(out_csv, delimiter=",", skiprows=1)
    assert rows.shape == (30, 7)

    out_tum = tmp_path / "odom.txt"
    rc = main(["bag", "odom-tum", str(bag), "--topic", "/odom", "--output", str(out_tum)])
    assert rc == 0
    tum = np.loadtxt(out_tum)
    assert tum.shape == (5, 8)


def test_cli_no_command_shows_help(capsys):
    assert main([]) == 1
    assert "gate" in capsys.readouterr().out
