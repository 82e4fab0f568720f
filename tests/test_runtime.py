"""Native runtime + bag reader round-trip tests."""

import numpy as np
import pytest

from mlis_tpu.core.bag import (
    BagReader,
    BagWriter,
    PointField,
    decode_image,
    decode_imu,
    decode_odometry,
    decode_pointcloud2,
    encode_imu,
    encode_odometry,
    encode_pointcloud2,
    extract_imu,
    extract_odometry_tum,
    extract_pointclouds,
)
from mlis_tpu.runtime.native import (
    decode_pointcloud,
    native_available,
    parse_imu_batch,
    parse_tum_native,
)


def _ouster_blob(rng, n=256, point_step=48):
    """Synthetic Ouster-layout blob: x@0 y@4 z@8 f32, ring@26 u16."""
    buf = np.zeros((n, point_step), np.uint8)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    rings = rng.integers(0, 128, n).astype(np.uint16)
    buf[:, 0:4] = xyz[:, 0:1].view(np.uint8)
    buf[:, 4:8] = xyz[:, 1:2].view(np.uint8)
    buf[:, 8:12] = xyz[:, 2:3].view(np.uint8)
    buf[:, 26:28] = rings[:, None].view(np.uint8)
    return buf.tobytes(), xyz, rings


def test_native_library_builds():
    # the toolchain is part of the environment contract; the native path
    # must actually build, not silently fall back
    assert native_available()


def test_decode_pointcloud_ouster_layout(rng):
    blob, xyz, rings = _ouster_blob(rng)
    out_xyz, out_ring = decode_pointcloud(blob, 48, 0, 4, 8, 26, 2)
    np.testing.assert_allclose(out_xyz, xyz, atol=0)
    np.testing.assert_array_equal(out_ring, rings.astype(np.int32))


def test_decode_pointcloud_no_ring(rng):
    blob, xyz, _ = _ouster_blob(rng)
    out_xyz, out_ring = decode_pointcloud(blob, 48, 0, 4, 8, -1)
    np.testing.assert_allclose(out_xyz, xyz)
    assert out_ring is None


def test_parse_tum_native_matches_python(tmp_path, rng):
    if not native_available():
        pytest.skip("native lib unavailable")
    rows = np.column_stack(
        [np.arange(50) + 1.6e9, rng.normal(size=(50, 7))]
    )
    p = tmp_path / "t.txt"
    with open(p, "w") as f:
        f.write("# comment line\n\n")
        for r in rows:
            f.write(" ".join(f"{v:.9f}" for v in r) + "\n")
    out = parse_tum_native(str(p))
    assert out.shape == (50, 8)
    np.testing.assert_allclose(out, rows, atol=1e-9)


def test_imu_roundtrip_and_batch(rng):
    msgs = []
    stamps = 1.6e9 + np.arange(10) * 0.005
    accel = rng.normal(size=(10, 3))
    gyro = rng.normal(size=(10, 3))
    for i in range(10):
        msgs.append(encode_imu(stamps[i], accel[i], gyro[i]))

    # single decode
    s0, a0, g0, q0 = decode_imu(msgs[0])
    assert s0 == pytest.approx(stamps[0], abs=1e-6)
    np.testing.assert_allclose(a0, accel[0])
    np.testing.assert_allclose(g0, gyro[0])

    # batch (native) decode
    blob = b"".join(msgs)
    offsets = np.cumsum([0] + [len(m) for m in msgs[:-1]])
    lengths = np.asarray([len(m) for m in msgs])
    s, a, g = parse_imu_batch(blob, offsets, lengths)
    np.testing.assert_allclose(s, stamps, atol=1e-6)
    np.testing.assert_allclose(a, accel)
    np.testing.assert_allclose(g, gyro)


def test_odometry_roundtrip(rng):
    pos = rng.normal(size=3)
    quat = rng.normal(size=4)
    quat /= np.linalg.norm(quat)
    msg = encode_odometry(1.5e9 + 0.25, pos, quat)
    stamp, p, q = decode_odometry(msg)
    assert stamp == pytest.approx(1.5e9 + 0.25, abs=1e-6)
    np.testing.assert_allclose(p, pos)
    np.testing.assert_allclose(q, quat)


def test_pointcloud2_roundtrip(rng):
    blob, xyz, rings = _ouster_blob(rng, n=64)
    fields = [
        PointField("x", 0, 7, 1),
        PointField("y", 4, 7, 1),
        PointField("z", 8, 7, 1),
        PointField("ring", 26, 4, 1),
    ]
    msg = encode_pointcloud2(2.0, blob, 48, fields)
    stamp, out_fields, step, out_blob = decode_pointcloud2(msg)
    assert stamp == pytest.approx(2.0)
    assert step == 48
    assert [f.name for f in out_fields] == ["x", "y", "z", "ring"]
    assert out_blob == blob


def test_xxh32_known_vectors():
    from mlis_tpu.core.lz4f import xxh32

    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"message digest") == 0x7C948494
    # >= 16 bytes exercises the 4-lane stripe path
    assert xxh32(b"abcdefghijklmnopqrstuvwxyz0123456789") == xxh32(
        bytes(b"abcdefghijklmnopqrstuvwxyz0123456789")
    )


def test_lz4_frame_roundtrip_and_pure_python_decoder(rng):
    from mlis_tpu.core import lz4f

    # compressible payload (repeats) + incompressible tail (random)
    data = b"semantic-gating-" * 4096 + rng.integers(
        0, 256, size=10_000, dtype=np.uint8
    ).tobytes()
    frame = lz4f.compress(data)
    assert frame[:4] == b"\x04\x22\x4d\x18"
    assert lz4f.decompress(frame, verify_checksums=True) == data

    # small block-size id forces the multi-block path
    frame64k = lz4f.compress(data, block_size_id=4)
    assert lz4f.decompress(frame64k) == data

    # the pure-Python block decoder must agree with liblz4's output
    if lz4f._LIB is not None:
        comp = lz4f.block_compress(data[:100_000])
        assert comp is not None
        assert lz4f._py_block_decompress(comp, 100_000) == data[:100_000]


def test_lz4_frame_rejects_garbage():
    from mlis_tpu.core import lz4f

    with pytest.raises(ValueError):
        lz4f.decompress(b"\x00" * 16)


def test_lz4_block_decoder_rejects_truncated_literals():
    """A token declaring more literals than remain is corruption: the
    pure-Python decoder must raise like liblz4, never silently truncate."""
    from mlis_tpu.core import lz4f

    # token 0xF0 = 15+ literals, extension byte 100 -> 115 literals declared,
    # but only 4 bytes follow
    corrupt = bytes([0xF0, 100]) + b"abcd"
    with pytest.raises(ValueError, match="literal run"):
        lz4f._py_block_decompress(corrupt, 1 << 20)


@pytest.mark.parametrize("compression", ["none", "bz2", "lz4"])
def test_bag_roundtrip(tmp_path, rng, compression):
    path = tmp_path / "test.bag"
    w = BagWriter(path)
    stamps = 1.6e9 + np.arange(20) * 0.005
    accel = rng.normal(size=(20, 3))
    gyro = rng.normal(size=(20, 3))
    for i in range(20):
        w.write(
            "/vectornav/imu", "sensor_msgs/Imu", stamps[i],
            encode_imu(stamps[i], accel[i], gyro[i]),
        )
    for i in range(5):
        w.write(
            "/odom", "nav_msgs/Odometry", stamps[i],
            encode_odometry(stamps[i], [i, 0, 0], [0, 0, 0, 1]),
        )
    w.close(compression=compression)

    reader = BagReader(path)
    msgs = list(reader.read_messages())
    assert len(msgs) == 25
    info = reader.info()
    assert info["message_counts"]["/vectornav/imu"] == 20
    assert info["topics"]["/odom"] == "nav_msgs/Odometry"
    assert info["duration"] == pytest.approx(stamps[19] - stamps[0], abs=1e-6)

    # topic filter
    only_imu = list(reader.read_messages(["/vectornav/imu"]))
    assert len(only_imu) == 20


def test_extract_imu_from_bag(tmp_path, rng):
    path = tmp_path / "imu.bag"
    w = BagWriter(path)
    stamps = 1.6e9 + np.arange(50) * 0.005
    accel = rng.normal(size=(50, 3))
    gyro = rng.normal(size=(50, 3))
    for i in range(50):
        w.write(
            "/vectornav/imu", "sensor_msgs/Imu", stamps[i],
            encode_imu(stamps[i], accel[i], gyro[i]),
        )
    w.close()
    t, a, g = extract_imu(path)
    np.testing.assert_allclose(t, stamps, atol=1e-6)
    np.testing.assert_allclose(a, accel)


def test_extract_odometry_topic_fallback(tmp_path, rng):
    path = tmp_path / "odo.bag"
    w = BagWriter(path)
    for i in range(8):
        w.write(
            "/integrated_to_init", "nav_msgs/Odometry", float(i),
            encode_odometry(float(i), [i, 0, 0], [0, 0, 0, 1]),
        )
    w.close()
    # first topic missing -> falls through to the second
    tum = extract_odometry_tum(path, ["/aft_mapped_to_init", "/integrated_to_init"])
    assert tum.shape == (8, 8)
    np.testing.assert_allclose(tum[:, 1], np.arange(8))


def test_extract_pointclouds_from_bag(tmp_path, rng):
    path = tmp_path / "pc.bag"
    w = BagWriter(path)
    blob, xyz, rings = _ouster_blob(rng, n=128)
    fields = [
        PointField("x", 0, 7, 1),
        PointField("y", 4, 7, 1),
        PointField("z", 8, 7, 1),
        PointField("ring", 26, 4, 1),
    ]
    for i in range(3):
        w.write(
            "/ouster/points", "sensor_msgs/PointCloud2", float(i),
            encode_pointcloud2(float(i), blob, 48, fields),
        )
    w.close()
    scans = list(extract_pointclouds(path))
    assert len(scans) == 3
    stamp, out_xyz, out_ring = scans[0]
    np.testing.assert_allclose(out_xyz, xyz)
    np.testing.assert_array_equal(out_ring, rings.astype(np.int32))


def test_image_roundtrip_and_stereo_sync(tmp_path, rng):
    from mlis_tpu.core.bag import encode_image, extract_stereo_pairs

    img_l = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    img_r = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)

    # single roundtrip
    stamp, out, enc = decode_image(encode_image(3.5, img_l))
    assert stamp == pytest.approx(3.5)
    np.testing.assert_array_equal(out, img_l)
    assert enc == "bgr8"

    path = tmp_path / "stereo.bag"
    w = BagWriter(path)
    # left at t, right at t+0.004 (within sync window); one unmatched right
    for i in range(6):
        t = 10.0 + i * 0.05
        w.write("/camera_array/cam1/image_raw", "sensor_msgs/Image", t,
                encode_image(t, img_l))
        w.write("/camera_array/cam3/image_raw", "sensor_msgs/Image", t + 0.004,
                encode_image(t + 0.004, img_r))
    w.write("/camera_array/cam3/image_raw", "sensor_msgs/Image", 99.0,
            encode_image(99.0, img_r))
    w.close()

    pairs = list(extract_stereo_pairs(path))
    assert len(pairs) == 6
    stamp, li, ri = pairs[0]
    np.testing.assert_array_equal(li, img_l)
    np.testing.assert_array_equal(ri, img_r)
    assert stamp == pytest.approx(10.002, abs=1e-6)
