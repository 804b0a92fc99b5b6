from rgbdslam_tpu.io import datasets, synthetic, trajectory  # noqa: F401
