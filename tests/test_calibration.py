"""Calibration converter tests — golden contract mirrors the reference's
tests/test_calib_converter.py (0.164 m / ~0.328 m baselines, required keys
per output format) plus checks for the quirks we fixed."""

import json

import numpy as np
import pytest
import yaml

from mlis_tpu.core.calibration import (
    CameraIntrinsics,
    IMUParams,
    compute_stereo_baseline,
    convert_to_basalt,
    convert_to_lego_loam,
    convert_to_orbslam3,
    convert_to_vins_fusion,
    load_camera_imu_calib,
    load_imu_params,
    load_kalibr_cameras,
    stereo_transform,
)
from mlis_tpu.ops.geometry import matrix_to_quat, quat_to_matrix, se3_inverse


@pytest.fixture
def kalibr_file(tmp_path):
    chain_T = [
        [1.0, 0.0, 0.0, 0.164],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
    config = {
        "cam0": {
            "camera_model": "pinhole",
            "distortion_model": "radtan",
            "intrinsics": [891.08, 891.36, 368.84, 275.06],
            "distortion_coeffs": [-0.2127, 0.1828, -0.0002, 0.0011],
            "resolution": [720, 540],
        },
        "cam1": {
            "camera_model": "pinhole",
            "distortion_model": "radtan",
            "intrinsics": [893.63, 893.97, 376.95, 266.57],
            "distortion_coeffs": [-0.2127, 0.1828, -0.0002, 0.0011],
            "resolution": [720, 540],
            "T_cn_cnm1": chain_T,
        },
        "cam3": {
            "camera_model": "pinhole",
            "distortion_model": "radtan",
            "intrinsics": [890.41, 890.60, 370.45, 281.40],
            "distortion_coeffs": [-0.2127, 0.1828, -0.0002, 0.0011],
            "resolution": [720, 540],
            "T_cn_cnm1": chain_T,
        },
    }
    p = tmp_path / "cams_calib.yaml"
    p.write_text(yaml.dump(config))
    return p


@pytest.fixture
def cam_imu_file(tmp_path):
    config = {
        "cam0": {
            "T_cam_imu": [
                [0.0, -1.0, 0.0, 0.05],
                [0.0, 0.0, -1.0, -0.03],
                [1.0, 0.0, 0.0, 0.02],
                [0.0, 0.0, 0.0, 1.0],
            ]
        }
    }
    p = tmp_path / "cam_imu.yaml"
    p.write_text(yaml.dump(config))
    return p


@pytest.fixture
def imu_file(tmp_path):
    config = {
        "imu0": {
            "update_rate": 200.0,
            "gyroscope_noise_density": 0.0001,
            "gyroscope_random_walk": 0.00001,
            "accelerometer_noise_density": 0.001,
            "accelerometer_random_walk": 0.0001,
        }
    }
    p = tmp_path / "imu.yaml"
    p.write_text(yaml.dump(config))
    return p


def test_intrinsics_from_kalibr():
    intr = CameraIntrinsics.from_kalibr(
        {
            "intrinsics": [891.08, 891.36, 368.84, 275.06],
            "resolution": [720, 540],
            "distortion_coeffs": [-0.2127, 0.1828, -0.0002, 0.0011],
        }
    )
    assert intr.fx == pytest.approx(891.08)
    assert (intr.width, intr.height) == (720, 540)
    K = intr.K()
    assert K[0, 2] == pytest.approx(368.84)


def test_load_cameras_and_chain(kalibr_file):
    cams = load_kalibr_cameras(kalibr_file)
    assert set(cams) == {"cam0", "cam1", "cam3"}
    assert cams["cam1"][1].translation[0] == pytest.approx(0.164)
    # cam0 has identity extrinsics
    np.testing.assert_allclose(cams["cam0"][1].T, np.eye(4))


def test_baseline_golden_values(kalibr_file):
    """Reference golden expectations (tests/test_calib_converter.py:161-177)."""
    cams = load_kalibr_cameras(kalibr_file)
    assert compute_stereo_baseline(cams, "cam0", "cam1") == pytest.approx(
        0.164, abs=1e-3
    )
    b13 = compute_stereo_baseline(cams, "cam1", "cam3")
    assert b13 == pytest.approx(0.164, abs=1e-3)  # only cam3's hop separates them
    assert compute_stereo_baseline(cams, "cam0", "cam3") == pytest.approx(
        0.328, abs=1e-3
    )


def test_orbslam3_required_keys(kalibr_file, tmp_path):
    cams = load_kalibr_cameras(kalibr_file)
    out = tmp_path / "orb.yaml"
    cfg = convert_to_orbslam3(cams, "cam0", "cam1", output_path=out)
    assert out.exists()
    for key in ("Camera1.fx", "Camera2.fx", "Stereo.b", "LoopClosing.Enabled: 0"):
        assert key in cfg
    assert "%YAML:1.0" in cfg
    assert f"Stereo.b: {0.164:.6f}" in cfg


def test_vins_required_keys_and_chained_cam1(
    kalibr_file, cam_imu_file, imu_file, tmp_path
):
    cams = load_kalibr_cameras(kalibr_file)
    T_cam_imu = load_camera_imu_calib(cam_imu_file)
    imu = load_imu_params(imu_file)
    out = tmp_path / "vins.yaml"
    cfg = convert_to_vins_fusion(cams, T_cam_imu, imu, "cam0", "cam1", out)
    assert out.exists()
    for key in ("imu: 1", "num_of_cam: 2", "loop_closure: 0", "body_T_cam0", "body_T_cam1"):
        assert key in cfg
    # body_T_cam1 must differ from body_T_cam0 by the stereo baseline
    # (the reference duplicated cam0 - we fix it)
    blocks = cfg.split("body_T_cam")
    assert blocks[1].split("data:")[1][:200] != blocks[2].split("data:")[1][:200]


def test_basalt_json_real_quaternion(kalibr_file, cam_imu_file, imu_file, tmp_path):
    cams = load_kalibr_cameras(kalibr_file)
    T_cam_imu = load_camera_imu_calib(cam_imu_file)
    imu = load_imu_params(imu_file)
    out = tmp_path / "basalt.json"
    cfg = json.loads(convert_to_basalt(cams, T_cam_imu, imu, "cam0", "cam1", out))
    assert out.exists()
    assert "value0" in cfg and len(cfg["value0"]["intrinsics"]) == 2

    # the reference emitted identity quaternions (TODO at :536-541); ours
    # must reproduce the actual rotation of inv(T_cam_imu)
    e = cfg["value0"]["T_imu_cam"][0]
    q = np.array([e["qx"], e["qy"], e["qz"], e["qw"]])
    R_expected = se3_inverse(T_cam_imu)[:3, :3]
    np.testing.assert_allclose(quat_to_matrix(q), R_expected, atol=1e-9)
    # second camera differs from first (chained, not copied)
    e1 = cfg["value0"]["T_imu_cam"][1]
    assert (e["px"], e["py"], e["pz"]) != (e1["px"], e1["py"], e1["pz"])


def test_imu_params_loading(imu_file):
    p = load_imu_params(imu_file)
    assert p.rate_hz == pytest.approx(200.0)
    assert p.gyro_noise_density == pytest.approx(1e-4)
    assert p.accel_noise_density == pytest.approx(1e-3)


def test_cam_imu_matrix(cam_imu_file):
    T = load_camera_imu_calib(cam_imu_file)
    assert T.shape == (4, 4)
    assert T[3, 3] == 1.0


def test_lego_loam_config():
    cfg = convert_to_lego_loam()
    assert "N_SCAN: 128" in cfg
    assert "Horizon_SCAN: 1024" in cfg
    assert "groundScanInd: 30" in cfg
    assert "/ouster/points" in cfg


def test_quat_matrix_roundtrip(rng):
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = quat_to_matrix(q)
        q2 = matrix_to_quat(R)
        # q and -q are the same rotation
        assert min(np.linalg.norm(q2 - q), np.linalg.norm(q2 + q)) < 1e-9


def test_stereo_transform_consistency(kalibr_file):
    cams = load_kalibr_cameras(kalibr_file)
    T = stereo_transform(cams, "cam0", "cam3")
    np.testing.assert_allclose(T[:3, 3], [0.328, 0, 0], atol=1e-9)
