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


def test_cli_bag_imu_plot(tmp_path, capsys):
    """The transit diagnostic: IMU with one injected elevator ride ->
    annotated figure (reference semantic/extract_imu_transit.py)."""
    from mlis_tpu.core.bag import BagWriter, encode_imu

    bag = tmp_path / "transit.bag"
    w = BagWriter(bag)
    hz, dur = 100.0, 30.0
    for i in range(int(hz * dur)):
        t = 50.0 + i / hz
        az = 9.81
        if 10.0 <= i / hz < 13.0:  # 3 s upward acceleration bump
            az += 0.7
        w.write("/vectornav/imu", "sensor_msgs/Imu", t,
                encode_imu(t, [0, 0, az], [0, 0, 0]))
    w.close()

    out = tmp_path / "transit.png"
    rc = main(["bag", "imu-plot", str(bag), "--output", str(out)])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 1000
    assert "elevator event(s)" in capsys.readouterr().out


def test_cli_calib_generate_all(tmp_path, capsys):
    """One-shot config generation for every algorithm (reference
    utils/generate_configs.py)."""
    import json as _json

    spath = tmp_path / "cams.yaml"
    main(["calib", "sample", "--output", str(spath)])
    imu_chain = tmp_path / "imu_chain.yaml"
    imu_chain.write_text(
        yaml.dump({"cam0": {"T_cam_imu": np.eye(4).tolist()}})
    )
    imu_params = tmp_path / "imu.yaml"
    imu_params.write_text(
        yaml.dump(
            {
                "imu0": {
                    "gyroscope_noise_density": 1e-4,
                    "gyroscope_random_walk": 1e-5,
                    "accelerometer_noise_density": 1e-3,
                    "accelerometer_random_walk": 1e-4,
                    "update_rate": 200.0,
                }
            }
        )
    )
    outdir = tmp_path / "configs"
    rc = main(
        [
            "calib", "generate",
            "--cameras", str(spath),
            "--cam-imu", str(imu_chain),
            "--imu", str(imu_params),
            "--left", "cam0", "--right", "cam1",
            "--output", str(outdir),
        ]
    )
    assert rc == 0
    assert (outdir / "orbslam3.yaml").exists()
    assert (outdir / "vins_fusion.yaml").exists()
    assert (outdir / "lego_loam.yaml").exists()
    basalt = _json.loads((outdir / "basalt.json").read_text())
    assert "value0" in basalt or len(basalt) > 0
    # missing IMU inputs is a usage error
    assert main(["calib", "generate", "--cameras", str(spath)]) == 2


def test_cli_check_data(tmp_path, capsys):
    """Dataset validation: missing algorithms fail, a readable bag passes
    (reference `make check-data` + bag_utils.test_bag_access)."""
    from mlis_tpu.core.bag import BagWriter, encode_imu

    # empty root -> every algorithm missing -> FAIL (rc 1)
    rc = main(["check-data", "--trajectory-root", str(tmp_path)])
    assert rc == 1
    out = capsys.readouterr().out
    assert "MISSING" in out and "FAIL" in out

    # a readable bag is reported topic-by-topic
    bag = tmp_path / "ok.bag"
    w = BagWriter(bag)
    for i in range(3):
        w.write("/vectornav/imu", "sensor_msgs/Imu", 1.0 + i,
                encode_imu(1.0 + i, [0, 0, 9.8], [0, 0, 0]))
    w.close()
    rc = main(["check-data", "--trajectory-root", str(tmp_path), "--bag", str(bag)])
    out = capsys.readouterr().out
    assert "/vectornav/imu: 3 msgs" in out


def test_cli_no_command_shows_help(capsys):
    assert main([]) == 1
    assert "gate" in capsys.readouterr().out


def test_cli_stream_demo(capsys):
    import json

    rc = main(["stream", "--frames", "120", "--capacity", "128",
               "--micro-batch", "8"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    # every planted same-floor revisit accepted, every trap gate-rejected
    assert out["accepted_pairs"] == out["planted_same_floor_revisits"]
    assert out["stats"]["rejected_cross_floor"] >= out["planted_cross_floor_traps"]
