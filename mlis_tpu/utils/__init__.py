from mlis_tpu.utils.profiling import StageTimer, profile_trace  # noqa: F401
