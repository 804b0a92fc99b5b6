from rgbdslam_tpu.slam.tracking import Tracker, TrackerState  # noqa: F401
