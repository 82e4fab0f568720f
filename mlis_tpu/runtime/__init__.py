from mlis_tpu.runtime.native import (  # noqa: F401
    decode_pointcloud,
    native_available,
    parse_imu_batch,
    parse_odometry_batch,
    parse_tum_native,
)
