from rgbdslam_tpu.utils import profiling, serialization  # noqa: F401
