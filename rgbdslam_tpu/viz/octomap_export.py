"""Occupancy-map export: rebuild the octomap-equivalent grid from keyframes.

The reference's octomap is (re)built by the viewer thread from the per-KF
filtered clouds whenever the map's big-change epoch advances
(Drawer/MapDrawer.cpp:48-71 -> OctomapDrawer::insertCloud,
Drawer/OctomapDrawer.cpp:38-79) — i.e. always from the CURRENT (optimized)
keyframe poses. This module is that rebuild as a batch job: the driver keeps
each keyframe's (gray, depth) images, and at export time every keyframe's
cloud (System/Tracking.cpp:234-237 recipe) is ray-integrated into one dense
log-odds grid (mapping/occupancy.py) under the final optimized poses.

Everything device-side is jitted and shape-stable (one compile for all
keyframes: clouds have a fixed max_points budget, the grid a fixed extent).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from rgbdslam_tpu.config import KeyframeConfig
from rgbdslam_tpu.geometry.camera import Camera
from rgbdslam_tpu.geometry import se3
from rgbdslam_tpu.mapping.cloud import keyframe_cloud, transform_cloud
from rgbdslam_tpu.mapping.occupancy import (OccupancyGrid, insert_cloud,
                                            make_grid)


def build_occupancy_from_keyframes(
    cam: Camera,
    kf_images: Dict[int, Tuple[np.ndarray, np.ndarray]],  # k -> (gray, depth)
    poses_cw: np.ndarray,                                  # (>=K, 4, 4) FINAL
    kf_cfg: KeyframeConfig = KeyframeConfig(),
    resolution: float = 0.08,          # OctomapDrawer.cpp:17
    margin: float = 0.5,
    max_points: int = 4096,
) -> OccupancyGrid:
    """One occupancy grid from all keyframes under their optimized poses."""
    ks = sorted(kf_images)
    if not ks:
        raise ValueError("no keyframe images retained")
    Twc = se3.inverse_np(np.stack([poses_cw[k] for k in ks])).astype(
        np.float32)
    centers = Twc[:, :3, 3]
    lo = centers.min(axis=0) - (kf_cfg.cloud_z_max + margin)
    hi = centers.max(axis=0) + (kf_cfg.cloud_z_max + margin)
    grid = make_grid(lo, hi, resolution=resolution)
    for i, k in enumerate(ks):
        gray, depth = kf_images[k]
        c = keyframe_cloud(
            cam, jnp.asarray(gray), jnp.asarray(depth),
            stride=kf_cfg.cloud_stride,
            z_min=kf_cfg.cloud_z_min, z_max=kf_cfg.cloud_z_max,
            voxel=kf_cfg.voxel_size, sor_k=kf_cfg.sor_neighbors,
            sor_std=kf_cfg.sor_std_mul, max_points=max_points,
        )
        T = jnp.asarray(Twc[i])
        grid = insert_cloud(grid, transform_cloud(c, T), T[:3, 3])
    return grid


class KeyframeImageKeeper:
    """Driver-side retention of keyframe (gray, depth) images for the
    export-time occupancy rebuild (the reference's Frame keeps its images
    for the same purpose, Core/Frame.h:24-216). Bounded by `max_frames`
    (stride-skips beyond it to stay within memory on long runs)."""

    def __init__(self, max_frames: int = 512):
        self.max_frames = max_frames
        self.images: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._skip = 1

    def offer(self, k: int, gray, depth) -> None:
        if k % self._skip != 0:
            return
        if len(self.images) >= self.max_frames:
            # thin: keep every other retained keyframe, double the stride
            self.images = {kk: v for kk, v in self.images.items()
                           if kk % (self._skip * 2) == 0}
            self._skip *= 2
            if k % self._skip != 0:
                return
        self.images[k] = (np.asarray(gray), np.asarray(depth))
