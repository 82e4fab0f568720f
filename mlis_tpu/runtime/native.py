"""ctypes bindings for libmlis_runtime.so with numpy fallbacks.

Build the native library with `make -C mlis_tpu/runtime` (auto-attempted on
first import). Every entry point has a pure-numpy fallback so the framework
works without a toolchain; the native path exists because the reference's
equivalents are per-point/per-message Python loops (SURVEY §2.4).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_DIR = Path(__file__).parent
_LIB_PATH = _LIB_DIR / "libmlis_runtime.so"
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", str(_LIB_DIR)],
                capture_output=True,
                timeout=120,
                check=False,
            )
        except Exception:
            pass
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))

    lib.mlis_decode_pointcloud.restype = ctypes.c_long
    lib.mlis_decode_pointcloud.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
    ]
    lib.mlis_parse_tum.restype = ctypes.c_long
    lib.mlis_parse_tum.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_long,
    ]
    for fn in (lib.mlis_parse_imu_batch, lib.mlis_parse_odometry_batch):
        fn.restype = ctypes.c_long
    lib.mlis_parse_imu_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.mlis_parse_odometry_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.c_long,
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _lptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_long))


def decode_pointcloud(
    data: bytes,
    point_step: int,
    x_off: int = 0,
    y_off: int = 4,
    z_off: int = 8,
    ring_off: int = -1,
    ring_size: int = 2,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """PointCloud2 blob -> ((N, 3) float32 xyz, (N,) int32 ring or None)."""
    n = len(data) // point_step
    lib = _load()
    if lib is not None:
        xyz = np.empty((n, 3), np.float32)
        ring = np.empty(n, np.int32)
        got = lib.mlis_decode_pointcloud(
            data, len(data), point_step, x_off, y_off, z_off,
            ring_off, ring_size,
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ring.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        xyz = xyz[:got]
        return xyz, (ring[:got] if ring_off >= 0 else None)

    # numpy fallback: strided views over the raw buffer
    buf = np.frombuffer(data, np.uint8)[: n * point_step].reshape(n, point_step)
    xyz = np.empty((n, 3), np.float32)
    for j, off in enumerate((x_off, y_off, z_off)):
        xyz[:, j] = buf[:, off : off + 4].copy().view(np.float32)[:, 0]
    ring = None
    if ring_off >= 0:
        if ring_size == 1:
            ring = buf[:, ring_off].astype(np.int32)
        else:
            ring = (
                buf[:, ring_off : ring_off + 2].copy().view(np.uint16)[:, 0]
            ).astype(np.int32)
    return xyz, ring


def parse_tum_native(path: str, max_rows: int = 2_000_000) -> Optional[np.ndarray]:
    """Native TUM parse; None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((max_rows, 8), np.float64)
    got = lib.mlis_parse_tum(str(path).encode(), _dptr(out), max_rows)
    if got < 0:
        raise FileNotFoundError(path)
    return out[:got].copy()


def parse_imu_batch(blob: bytes, offsets: np.ndarray, lengths: np.ndarray):
    """Serialized Imu messages -> (stamps, accel (N,3), gyro (N,3)).

    Falls back to a vectorized-ish numpy loop when the library is missing.
    """
    n = len(offsets)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    lib = _load()
    if lib is not None:
        stamps = np.empty(n, np.float64)
        accel = np.empty((n, 3), np.float64)
        gyro = np.empty((n, 3), np.float64)
        got = lib.mlis_parse_imu_batch(
            blob, _lptr(offsets), _lptr(lengths), n,
            _dptr(stamps), _dptr(accel), _dptr(gyro),
        )
        return stamps[:got], accel[:got], gyro[:got]

    import struct

    stamps, accel, gyro = [], [], []
    for off, ln in zip(offsets, lengths):
        p = blob[off : off + ln]
        if len(p) < 16:
            continue
        sec, nsec, fid = struct.unpack_from("<III", p, 4)
        base = 16 + fid
        if len(p) < base + 104 + 96 + 96:
            continue
        stamps.append(sec + 1e-9 * nsec)
        gyro.append(struct.unpack_from("<3d", p, base + 104))
        accel.append(struct.unpack_from("<3d", p, base + 104 + 96))
    return (
        np.asarray(stamps),
        np.asarray(accel).reshape(-1, 3),
        np.asarray(gyro).reshape(-1, 3),
    )


def parse_odometry_batch(blob: bytes, offsets: np.ndarray, lengths: np.ndarray):
    """Serialized Odometry messages -> (N, 8) TUM rows."""
    n = len(offsets)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    lib = _load()
    if lib is not None:
        out = np.empty((n, 8), np.float64)
        got = lib.mlis_parse_odometry_batch(
            blob, _lptr(offsets), _lptr(lengths), n, _dptr(out)
        )
        return out[:got].copy()

    import struct

    rows = []
    for off, ln in zip(offsets, lengths):
        p = blob[off : off + ln]
        if len(p) < 16:
            continue
        sec, nsec, fid = struct.unpack_from("<III", p, 4)
        cur = 16 + fid
        (cid,) = struct.unpack_from("<I", p, cur)
        cur += 4 + cid
        if len(p) < cur + 56:
            continue
        vals = struct.unpack_from("<7d", p, cur)
        rows.append((sec + 1e-9 * nsec, *vals))
    return np.asarray(rows).reshape(-1, 8)
