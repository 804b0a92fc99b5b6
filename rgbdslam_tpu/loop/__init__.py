from rgbdslam_tpu.loop.codebook import train_codebook, quantize  # noqa: F401
from rgbdslam_tpu.loop.bow import bow_vector, bow_scores  # noqa: F401
from rgbdslam_tpu.loop.detector import LoopDetector  # noqa: F401
