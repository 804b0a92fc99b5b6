"""Extractor factory: detector/descriptor variants + ADAPTIVE mode.

TPU-native Features/Extractor.{h,cpp}: the reference's factory offers 12
OpenCV detector types and a NORMAL/ADAPTIVE mode switch
(Features/Extractor.h:13-31). On TPU the meaningful axes collapse to:

- 'svo_fast' (the live path, main.cpp:31): FAST-10 gate + Shi-Tomasi grid
  ranking + upright BRIEF — the default.
- 'orb': same detection with IC-angle orientation + steered BRIEF
  (ORBextractor semantics, Features/ORBextractor.cpp:16-87).
- 'gftt': pure Shi-Tomasi ranking, no FAST gate (GFTT-class detectors).
  (The remaining OpenCV types — BRISK/FREAK/SURF/SIFT/... — are descriptor
  families foreign to the Hamming pipeline; the framework standardizes on
  256-bit binary descriptors, which is what the live reference path uses.)

ADAPTIVE mode replaces the DetectorAdjuster -> VideoDynamic -> VideoGrid
stack (Features/Extractor.cpp:82-109): instead of re-detecting up to 5 times
per frame, the FAST threshold is a *traced* scalar adjusted once per frame
from the previous frame's keypoint count with the reference's x0.7 / x1.3
rule (Features/DetectorAdjuster.cpp:45-57) — video statistics change slowly,
so the persistent-threshold feedback loop converges the same way with zero
extra detection passes (and no recompiles). The per-cell grid quota is
already enforced by detect_keypoints' best-per-cell reduction.
"""

from __future__ import annotations

import jax.numpy as jnp

from rgbdslam_tpu.config import ExtractorConfig
from rgbdslam_tpu.frontend.frame import FrameFeatures, build_frame_features
from rgbdslam_tpu.geometry.camera import Camera


class Extractor:
    DETECTORS = ("svo_fast", "orb", "gftt")

    def __init__(
        self,
        cam: Camera,
        cfg: ExtractorConfig = ExtractorConfig(),
        detector: str = "svo_fast",
        adaptive: bool = False,
        target_min: int = 600,     # Features/Extractor.cpp:95 (600-1020 band)
        target_max: int = 1020,
        th_min: float = 3.0,
        th_max: float = 80.0,
    ):
        if detector not in self.DETECTORS:
            raise ValueError(f"unknown detector {detector!r}; one of {self.DETECTORS}")
        self.cam = cam
        self.cfg = cfg
        self.detector = detector
        self.adaptive = adaptive
        self.target_min = target_min
        self.target_max = target_max
        self.th_min = th_min
        self.th_max = th_max
        self.threshold = float(cfg.fast_threshold)

    def __call__(self, gray, depth) -> FrameFeatures:
        f = build_frame_features(
            self.cam,
            jnp.asarray(gray),
            jnp.asarray(depth),
            self.cfg,
            use_orientation=(self.detector == "orb"),
            fast_threshold=jnp.float32(self.threshold),
            use_fast_gate=(self.detector != "gftt"),
        )
        if self.adaptive and self.detector != "gftt":
            n = int(f.valid.sum())
            # DetectorAdjuster::tooFew/tooMany (x0.7 / x1.3, clamped)
            if n < self.target_min:
                self.threshold = max(self.threshold * 0.7, self.th_min)
            elif n > self.target_max:
                self.threshold = min(self.threshold * 1.3, self.th_max)
        return f
