"""Per-frame feature extraction into a fixed-shape device pytree.

TPU-native Frame construction (Core/Frame.cpp:34-122): grayscale conversion &
depth scaling happen in the dataset layer; here a single jitted program runs
pyramid -> FAST/Shi-Tomasi grid detection -> (optional) IC orientation ->
BRIEF-256 description -> keypoint undistortion -> depth backprojection, all
under a fixed N-keypoint budget with validity masks (replacing the reference's
dynamic std::vector keypoints + 64x48 hash grid + per-keypoint loops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from rgbdslam_tpu.config import ExtractorConfig
from rgbdslam_tpu.geometry import camera as cam_mod
from rgbdslam_tpu.geometry.camera import Camera
from rgbdslam_tpu.ops import fast as fast_ops
from rgbdslam_tpu.ops import image as image_ops
from rgbdslam_tpu.ops import orb as orb_ops


@struct.dataclass
class FrameFeatures:
    """Fixed-budget per-frame features (the device-side Frame).

    Replaces Core/Frame.h:24-216's feature members: mvKeys/mvKeysUn ->
    uv/uv_undist, mvKeys3Dc -> xyz, mDescriptors -> desc, inlier/outlier and
    depth-validity flags -> masks.
    """

    uv: jnp.ndarray          # (N, 2) f32 detected (distorted) pixel coords
    uv_undist: jnp.ndarray   # (N, 2) f32 undistorted pixel coords
    xyz: jnp.ndarray         # (N, 3) f32 camera-frame 3D (z=0 when no depth)
    desc: jnp.ndarray        # (N, 8) u32 packed 256-bit descriptors
    score: jnp.ndarray       # (N,) f32 detector response
    level: jnp.ndarray       # (N,) i32 pyramid level
    valid: jnp.ndarray       # (N,) bool detected slot
    has_depth: jnp.ndarray   # (N,) bool valid metric depth at the keypoint
    intensity: jnp.ndarray   # (N,) f32 gray value (landmark "color",
                             #   Core/Frame.cpp:91-117 stores per-keypoint color)
    smooth: jnp.ndarray      # (N,) bool depth locally smooth (not an
                             #   occlusion boundary) — gate for landmark
                             #   tracks: depth at an edge corner flips
                             #   between fore/background across views and
                             #   poisons bundle adjustment
    surf_cov: jnp.ndarray    # (N, 3, 3) local surface covariance from the
                             #   depth-image patch (plane-to-plane GICP
                             #   weighting without the O(N^2) sparse-set kNN;
                             #   SURVEY.md §7 design stance)

    @property
    def num_slots(self) -> int:
        return self.uv.shape[0]

    @property
    def obs_valid(self) -> jnp.ndarray:
        """Usable observation: detected and has depth (Frame::isValidObs)."""
        return self.valid & self.has_depth


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 6, 7, 8))
def build_frame_features(
    cam: Camera,
    gray: jnp.ndarray,
    depth: jnp.ndarray,
    cfg: ExtractorConfig = ExtractorConfig(),
    use_orientation: bool = False,
    fast_threshold=None,
    use_fast_gate: bool = True,
    descriptor: str = "brief",
    response: str = "fast_st",
) -> FrameFeatures:
    """gray [H,W] f32 (0..255), depth [H,W] f32 meters -> FrameFeatures.

    Mirrors the frame-ingestion call stack (SURVEY.md §3.1) minus disk IO.
    `fast_threshold` may be a traced scalar override (adaptive mode varies it
    per frame without recompiling); `use_fast_gate=False` gives the
    GFTT-style pure Shi-Tomasi detector.

    `descriptor`: 'brief' (upright, the live path) | 'orb' (steered; also
    selected by use_orientation) | 'brisk' | 'freak' | 'latch' | 'sift'
    (float, L2-matched). `response`: 'fast_st' | 'star' | 'dog' | 'hessian'
    alternative detector responses (ops/fast.py) — together these cover the
    reference factory's 12 detector/descriptor types
    (Features/Extractor.h:13-26).
    """
    pyramid = image_ops.build_pyramid(gray, cfg.num_levels)
    kp = fast_ops.detect_keypoints(
        pyramid,
        num_features=cfg.num_features,
        cell_size=cfg.cell_size,
        fast_threshold=(cfg.fast_threshold if fast_threshold is None
                        else fast_threshold),
        min_response=cfg.min_response,
        min_border=cfg.min_border,
        use_fast_gate=use_fast_gate,
        subpixel=cfg.subpixel,
        response=response,
    )

    blurred = image_ops.gaussian_blur(gray, sigma=2.0, radius=3)
    if use_orientation:
        descriptor = "orb"
    if descriptor == "orb":
        # steered BRIEF via the binned-rotation matmul path (ORB semantics)
        desc, _angles = orb_ops.orb_descriptors_dense(
            blurred, gray, kp.uv, cfg.brief_patch_size
        )
    elif descriptor == "brief":
        # upright BRIEF: patch extraction + one-hot MXU matmuls
        desc = orb_ops.brief_descriptors_dense(blurred, kp.uv,
                                               cfg.brief_patch_size)
    elif descriptor in ("brisk", "freak"):
        from rgbdslam_tpu.ops.descriptors import pattern_descriptors_dense

        desc = pattern_descriptors_dense(blurred, kp.uv, descriptor,
                                         cfg.brief_patch_size)
    elif descriptor == "latch":
        from rgbdslam_tpu.ops.descriptors import latch_descriptors_dense

        box3 = image_ops.box_filter_sum(gray, 1) / 9.0
        desc = latch_descriptors_dense(box3, kp.uv, cfg.brief_patch_size)
    elif descriptor == "sift":
        from rgbdslam_tpu.ops.descriptors import sift_descriptors_dense

        desc = sift_descriptors_dense(blurred, kp.uv)
    else:
        raise ValueError(f"unknown descriptor {descriptor!r}")

    # Depth lookup at the detected (distorted) coords, like the reference
    # (Core/Frame.cpp:91-117 reads mImDepth at mvKeys); unprojection uses the
    # undistorted coords (Core/Frame.cpp:251-281 + uprojectCamera).
    z_n = image_ops.nearest_sample(depth, kp.uv)
    has_depth = cam_mod.valid_depth(cam, z_n) & kp.valid
    # depth-edge test: 3x3 min/max range around the keypoint
    zmin = jax.lax.reduce_window(depth, jnp.inf, jax.lax.min, (3, 3), (1, 1),
                                 "SAME")
    zmax = jax.lax.reduce_window(depth, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
                                 "SAME")
    zrange = image_ops.nearest_sample(zmax, kp.uv) - image_ops.nearest_sample(
        zmin, kp.uv)
    smooth = has_depth & (zrange <= 0.03 + 0.02 * z_n)
    # depth denoising on smooth surfaces: 3x3 valid-pixel mean (Kinect-class
    # per-pixel depth noise averages down ~3x; edges keep the center pixel —
    # averaging would mix fore/background there)
    valid_px = (depth > 0).astype(depth.dtype)
    zsum = image_ops.box_filter_sum(depth, 1)
    zcnt = image_ops.box_filter_sum(valid_px, 1)
    zmean = zsum / jnp.maximum(zcnt, 1.0)
    z = jnp.where(smooth, image_ops.nearest_sample(zmean, kp.uv), z_n)
    uv_undist = cam_mod.undistort_pixels(cam, kp.uv)
    z_safe = jnp.where(has_depth, z, 0.0)
    xyz = cam_mod.unproject(cam, uv_undist, z_safe)
    intensity = image_ops.nearest_sample(gray, kp.uv)

    from rgbdslam_tpu.solvers.icp import depth_patch_covariances

    surf_cov = depth_patch_covariances(cam, depth, kp.uv)

    return FrameFeatures(
        uv=kp.uv,
        uv_undist=uv_undist,
        xyz=xyz,
        desc=desc,
        score=kp.score,
        level=kp.level,
        valid=kp.valid,
        has_depth=has_depth,
        intensity=intensity,
        smooth=smooth,
        surf_cov=surf_cov,
    )
