from rgbdslam_tpu.mapping.keyframes import KeyframeStore  # noqa: F401
