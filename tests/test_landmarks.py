"""Landmark store + system-integrated local BA tests."""

import numpy as np
import pytest

from rgbdslam_tpu.config import ExtractorConfig, SlamConfig
from rgbdslam_tpu.eval.ate import ate_rmse
from rgbdslam_tpu.geometry.camera import Camera
from rgbdslam_tpu.io.synthetic import SyntheticDataset
from rgbdslam_tpu.mapping.landmarks import LandmarkStore
from rgbdslam_tpu.slam.system import SlamSystem

CAM = Camera(200.0, 200.0, 159.5, 119.5, width=320, height=240)


def test_landmark_tracks_extend_and_spawn():
    store = LandmarkStore(max_landmarks=64, max_obs=4, num_features=8)
    uv = np.arange(16, dtype=np.float32).reshape(8, 2)
    xyz = np.tile(np.array([0.0, 0.0, 2.0], np.float32), (8, 1))
    ok = np.ones(8, bool)
    desc = np.zeros((8, 8), np.uint32)
    inten = np.zeros(8, np.float32)
    T = np.eye(4, dtype=np.float32)

    a0 = store.add_keyframe(0, uv, xyz, ok, desc, inten, T)
    assert store.count == 8
    assert (a0 >= 0).all()

    # KF1: keypoints 0..3 match previous 0..3; 4..7 unmatched -> new landmarks
    match_idx = np.array([0, 1, 2, 3, 0, 0, 0, 0], np.int32)
    match_valid = np.array([1, 1, 1, 1, 0, 0, 0, 0], bool)
    a1 = store.add_keyframe(1, uv, xyz, ok, desc, inten, T,
                            match_idx, match_valid, prev_kf=0)
    assert store.count == 12
    np.testing.assert_array_equal(a1[:4], a0[:4])     # tracks extended
    assert (store.obs_count[a0[:4]] == 2).all()
    assert (a1[4:] >= 8).all()                        # new landmarks

    problem, lm_ids, kf_ids = store.window_problem(0, 1, np.stack([T, T]))
    assert len(lm_ids) == 4  # only the 4 two-observation tracks
    assert problem.obs_kf.shape[0] >= 8  # padded bucket


def test_world_points_export():
    store = LandmarkStore(max_landmarks=16, max_obs=2, num_features=4)
    uv = np.zeros((4, 2), np.float32)
    xyz = np.tile(np.array([0.5, 0.0, 2.0], np.float32), (4, 1))
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0, 0, -1]  # camera at z=+1 in world... Tcw translation
    store.add_keyframe(0, uv, xyz, np.ones(4, bool),
                       np.zeros((4, 8), np.uint32), np.zeros(4, np.float32), T)
    pts, inten = store.world_points()
    assert pts.shape == (4, 3)
    # world point = Twc @ xyz_cam
    Twc = np.linalg.inv(T)
    ref = Twc[:3, :3] @ xyz.T + Twc[:3, 3:4]
    np.testing.assert_allclose(pts, ref.T, atol=1e-6)


@pytest.mark.slow
def test_system_with_local_ba_tracks():
    cfg = SlamConfig(
        extractor=ExtractorConfig(num_features=512, num_levels=3, cell_size=8,
                                  fast_threshold=15.0),
        use_local_ba=True,
        ba_window=4,
        max_landmarks=8192,
    )
    ds = SyntheticDataset(n_frames=40, cam=CAM, trajectory="sweep")
    system = SlamSystem(CAM, cfg, seed=0)
    for i in range(len(ds)):
        ts, g, d = ds.grab(i)
        system.track(ts, g, d)
    system.finish()
    assert system.landmarks.count > 100
    ts_e, poses = system.camera_trajectory()
    rmse, info = ate_rmse(ts_e, poses, ds.timestamps, ds.poses_twc)
    assert rmse < 0.06, f"ATE with local BA {rmse}"


def test_full_track_replacement_keeps_widest_baselines():
    """VERDICT r3 weak #5: when a track is full (M observations) a new
    observation replaces the least-baseline-diverse old one instead of
    being dropped — late, wide-baseline views are retained."""
    M = 4
    store = LandmarkStore(max_landmarks=8, max_obs=M, num_features=2)
    uv = np.zeros((2, 2), np.float32)
    xyz = np.tile(np.array([0.0, 0.0, 2.0], np.float32), (2, 1))
    ok = np.array([True, False])
    desc = np.zeros((2, 8), np.uint32)
    inten = np.zeros(2, np.float32)
    T = np.eye(4, dtype=np.float32)

    # KF centers: 0..3 clustered within 1 cm, KF 4 and 5 a metre away
    centers = np.zeros((8, 3), np.float32)
    centers[:4, 0] = np.arange(4) * 0.01
    centers[4, 0] = 1.0
    centers[5, 0] = 2.0

    a = store.add_keyframe(0, uv, xyz, ok, desc, inten, T)
    lm = a[0]
    ext = (np.array([0, 0], np.int32), np.array([True, False]))
    for kf in range(1, 4):   # fill the M=4 slots with clustered views
        store.add_keyframe(kf, uv, xyz, ok, desc, inten, T, ext[0], ext[1],
                           prev_kf=kf - 1, kf_centers=centers)
    assert store.obs_count[lm] == M

    # KF 4 (wide baseline): must displace one of the clustered views
    store.add_keyframe(4, uv, xyz, ok, desc, inten, T, ext[0], ext[1],
                       prev_kf=3, kf_centers=centers)
    kfs = set(store.obs_kf[lm][store.obs_valid[lm]])
    assert 4 in kfs, f"wide-baseline obs not retained: {kfs}"
    assert store.obs_replaced == 1 and store.obs_dropped == 0

    # KF 5 also wide: replaces another clustered view, keeps 4
    store.add_keyframe(5, uv, xyz, ok, desc, inten, T, ext[0], ext[1],
                       prev_kf=4, kf_centers=centers)
    kfs = set(store.obs_kf[lm][store.obs_valid[lm]])
    assert {4, 5} <= kfs
    assert store.obs_replaced == 2

    # without centers, a full track drops the new obs (and counts it)
    store2 = LandmarkStore(max_landmarks=8, max_obs=2, num_features=2)
    store2.add_keyframe(0, uv, xyz, ok, desc, inten, T)
    store2.add_keyframe(1, uv, xyz, ok, desc, inten, T, ext[0], ext[1],
                        prev_kf=0)
    store2.add_keyframe(2, uv, xyz, ok, desc, inten, T, ext[0], ext[1],
                        prev_kf=1)
    assert store2.obs_dropped == 1
