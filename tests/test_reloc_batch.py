"""Batched-path divergence stress + relocalization boundary (VERDICT r2
weak #6/#7).

The batched tracker documents two divergences from the per-frame path (no
second-reference retry; corrections at batch boundaries). These tests force
the UNDOCUMENTED-behavior corners: a mid-batch failure burst that drives the
system into LOST and out again via BoW relocalization, compared against the
per-frame path on the same frames; and the acceptance boundary at exactly
`reloc_min_inliers`.
"""

import numpy as np
import jax.numpy as jnp

import rgbdslam_tpu  # noqa: F401
from rgbdslam_tpu.config import ExtractorConfig, LoopConfig, SlamConfig
from rgbdslam_tpu.eval.ate import ate_rmse
from rgbdslam_tpu.geometry.camera import Camera
from rgbdslam_tpu.io.synthetic import SyntheticDataset
from rgbdslam_tpu.slam.system import SlamSystem

CAM = Camera(200.0, 200.0, 159.5, 119.5, width=320, height=240)
CFG = SlamConfig(
    extractor=ExtractorConfig(num_features=512, num_levels=3,
                              cell_size=8, fast_threshold=15.0),
    loop=LoopConfig(id_interval=12, min_kfs_since_loop=10, vocab_size=256),
    lost_after=2,
)


def _frames_with_blackout(n: int, lo: int, hi: int):
    """Orbit frames with frames [lo, hi) replaced by featureless noise
    (uniform gray + invalid depth): VO must fail there — the sensor-dropout
    scenario."""
    ds = SyntheticDataset(n_frames=n, cam=CAM, trajectory="orbit")
    rng = np.random.default_rng(7)
    frames = []
    for i in range(n):
        ts, gray, depth = ds.grab(i)
        if lo <= i < hi:
            gray = jnp.asarray(
                rng.normal(0.5, 0.003, (CAM.height, CAM.width))
                .astype(np.float32))
            depth = jnp.zeros((CAM.height, CAM.width), np.float32)
        frames.append((ts, gray, depth))
    return ds, frames


def test_mid_batch_failure_burst_relocalizes():
    """A 4-frame blackout inside a batch: both per-frame and batched paths
    must enter LOST, relocalize via BoW once real frames return, and finish
    with comparable trajectory quality on the surviving frames."""
    # 96-frame orbit (3.75 deg/frame — Kinect-class motion); a faster orbit
    # makes the post-blackout view share too little with the last keyframe
    # for ANY verifier (3 RANSAC inliers at 50 deg of unseen rotation)
    n, B = 96, 8
    lo, hi = 40, 44     # blackout spans a batch boundary (frames 40-43)
    ds, frames = _frames_with_blackout(n, lo, hi)

    def ate_of(system):
        ts_c, poses_c = system.camera_trajectory()
        keep = np.array([i < lo or i >= hi for i in range(n)])
        rmse, _ = ate_rmse(np.asarray(ts_c)[keep], poses_c[keep],
                           ds.timestamps, ds.poses_twc)
        return rmse

    s1 = SlamSystem(CAM, CFG, seed=0)
    for ts, g, d in frames:
        s1.track(ts, g, d)
    s1.finish()
    r1 = ate_of(s1)

    s2 = SlamSystem(CAM, CFG, seed=0)
    for i in range(0, n, B):
        c = frames[i:i + B]
        s2.track_batch([x[0] for x in c], [x[1] for x in c],
                       [x[2] for x in c])
    s2.finish()
    r2 = ate_of(s2)

    for s, r in ((s1, r1), (s2, r2)):
        assert s.tracker.stats.failures >= hi - lo - 1
        assert s.tracker.stats.relocalizations >= 1, (
            f"no relocalization (failures={s.tracker.stats.failures})")
        assert r < 0.15, f"post-burst ATE {r:.3f}"
    # batched recovery is allowed to differ (no ref2 retry) but must stay in
    # the same quality class
    assert r2 < max(2.0 * r1, 0.08), (r2, r1)


def test_reloc_acceptance_at_min_inliers_boundary():
    """_relocalize accepts a candidate iff RANSAC inliers >=
    reloc_min_inliers (System/Tracking.cpp:165-193's verification class);
    exactly-at-threshold must accept, one-below must reject."""
    system = SlamSystem(CAM, CFG, seed=0)
    ld = system.loop_detector
    # fake a trained detector + two database keyframes
    ld.words = jnp.zeros((CFG.loop.vocab_size, 8), jnp.uint32)
    ld.idf = jnp.ones((CFG.loop.vocab_size,), jnp.float32)
    ld.count = 2
    ld.bow_db[:2] = 1.0
    system.store.poses_cw[0] = np.eye(4, dtype=np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T1[0, 3] = 0.5
    system.store.poses_cw[1] = T1
    system.store.count = 2

    ds = SyntheticDataset(n_frames=2, cam=CAM, trajectory="orbit")
    _, gray, depth = ds.grab(0)
    f = system.tracker._extractor(gray, depth)

    calls = {}

    def fake_verify(cands, _f, ninl):
        calls["cands"] = list(cands)
        C = len(cands)
        T = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
        T[:, 1, 3] = 0.25   # recognizable relative transform
        return (T, np.full((C,), ninl, np.int32),
                np.ones((C,), bool), np.full((C,), ninl, np.int32))

    th = CFG.reloc_min_inliers

    system._verify_candidates = (
        lambda cands, ff: fake_verify(cands, ff, th - 1))
    ok, _ = system._relocalize(f)
    assert not ok, "accepted a candidate below reloc_min_inliers"

    system._verify_candidates = (
        lambda cands, ff: fake_verify(cands, ff, th))
    ok, Tcw = system._relocalize(f)
    assert ok, "rejected a candidate at exactly reloc_min_inliers"
    # Tcw = T_{query<-KF} @ Tcw_KF with the stubbed relative transform
    j = calls["cands"][0]
    expect = fake_verify([j], f, th)[0][0] @ system.store.poses_cw[j]
    np.testing.assert_allclose(Tcw, expect, atol=1e-6)
