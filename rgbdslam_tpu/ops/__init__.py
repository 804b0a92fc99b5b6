from rgbdslam_tpu.ops import image, fast, orb, hamming  # noqa: F401
