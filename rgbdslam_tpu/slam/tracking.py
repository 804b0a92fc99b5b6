"""Tracking: the SLAM state machine, host-orchestrated, device-computed.

TPU-native System/Tracking.{h,cpp}: the per-frame hot path (feature build,
matching, RANSAC, optional GICP) runs as jitted device programs; the host owns
only the tiny data-dependent control flow (state machine, reference-frame
bookkeeping, keyframe gate) and 4x4 pose composition, mirroring SURVEY.md §7's
"keep control flow on host, jit the heavy steps".

Pose convention: Tcw (world -> camera), as the reference (Core/Frame.cpp).
VO estimates T21 (ref-camera -> cur-camera) and composes
Tcw_cur = T21 @ Tcw_ref (Solver/SolverSE3.cpp:124-126).
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgbdslam_tpu.config import SlamConfig
from rgbdslam_tpu.frontend.extractor import Extractor
from rgbdslam_tpu.geometry import se3
from rgbdslam_tpu.frontend.frame import FrameFeatures
from rgbdslam_tpu.frontend.matcher import gather_matched_points, match_frames
from rgbdslam_tpu.geometry.camera import Camera
from rgbdslam_tpu.solvers.dense_icp import dense_icp
from rgbdslam_tpu.solvers.icp import gicp_refine
from rgbdslam_tpu.solvers.ransac_se3 import ransac_se3
from rgbdslam_tpu.utils.rpccount import RPC


class TrackerState(enum.Enum):
    NOT_INITIALIZED = 0   # System/Tracking.h:23-27
    OK = 1
    LOST = 2


@dataclass
class TrackedFrame:
    """Host-side per-frame record (trajectory bookkeeping,
    System/Tracking.cpp:249-256)."""

    timestamp: float
    Tcw: np.ndarray                 # (4, 4)
    Tcr: np.ndarray                 # pose relative to reference KF
    ref_kf_index: int               # index into the keyframe list
    num_inliers: int = 0


@dataclass
class TrackStats:
    frames: int = 0
    failures: int = 0
    acum_inliers: int = 0
    relocalizations: int = 0

    @property
    def mean_inliers(self) -> int:
        return self.acum_inliers // max(self.frames, 1)


import functools


@functools.lru_cache(maxsize=32)
def _tracker_programs(cam: Camera, cfg: SlamConfig) -> dict:
    """Jitted device programs for one (camera, config) pair, SHARED across
    Tracker instances. Tracing + MLIR lowering of the fused scan programs
    costs seconds per program; instance-bound jits re-pay it for every new
    session (measured: ~10 s of a 15 s batched bench run was re-tracing).
    Every closure is pure w.r.t. instance state — Extractor.build takes the
    threshold as an argument, and cam/cfg are frozen dataclasses (the cache
    key)."""
    ex = Extractor(cam, cfg.extractor, detector=cfg.detector,
                   adaptive=cfg.adaptive)
    matcher_cfg, ransac_cfg = cfg.matcher, cfg.ransac

    icp_cfg, use_icp = cfg.icp, cfg.use_icp_refinement

    # fused per-frame program: feature build + match + gather + RANSAC +
    # the GICP plane-to-plane polish (rmse-triggered where-select,
    # System/Tracking.cpp:145-151) in ONE device dispatch, all
    # host-consumed scalars in ONE packed array — each extra dispatch or
    # fetch pays a ~10-25 ms RPC round trip over the remote-TPU tunnel.
    # Round 4: the GICP stage moved INSIDE (it used to be a separate
    # host-conditional dispatch + 2 fetches per triggered frame).
    def _fused(ref: FrameFeatures, cur: FrameFeatures, key):
        """-> (T21 polished, res, packed[T21(16) | success | rmse | ninl])"""
        m = match_frames(ref, cur, matcher_cfg.nn_ratio)
        p1, p2, w, valid = gather_matched_points(ref, cur, m)
        res = ransac_se3(p1, p2, w, valid, key, ransac_cfg)
        T21 = res.T21
        if use_icp:
            # matched surface covariances from depth-image patches
            # (cheaper + truer than sparse-set kNN); a non-converged GICP
            # keeps the RANSAC pose (divergence from the reference noted
            # in _visual_odometry's docstring)
            T_g, conv, _ = gicp_refine(p1, p2, res.inliers, T21, None,
                                       icp_cfg, C1=ref.surf_cov,
                                       C2=cur.surf_cov[m.idx2])
            use = (res.rmse >= icp_cfg.rmse_trigger) & conv & res.success
            T21 = jnp.where(use, T_g, T21)
        packed = jnp.concatenate([
            T21.reshape(16),
            jnp.stack([res.success.astype(jnp.float32),
                       res.rmse.astype(jnp.float32),
                       res.num_inliers.astype(jnp.float32)]),
        ])
        return T21, res, packed

    def _step(ref: FrameFeatures, gray, depth, key, threshold):
        # the PRNG key evolves ON DEVICE (a host-side split would be an
        # extra dispatch per frame) and `threshold` is a cached device
        # scalar — with every argument device-resident, the per-frame
        # cost is exactly one dispatch + one 20-float fetch
        key, sub = jax.random.split(key)
        cur = ex.build(gray, depth, threshold)
        _T21, _res, packed = _fused(ref, cur, sub)
        # + current valid-keypoint count (ADAPTIVE feedback reads it
        # from the same packed fetch)
        packed = jnp.concatenate(
            [packed, jnp.sum(cur.valid).astype(jnp.float32)[None]])
        return key, cur, packed

    # ---- pipelined per-frame step (depth-2 dispatch/fetch ring) -------
    # Identical per-frame semantics to _step, with the dense-ICP polish
    # (when configured) folded INTO the program so the ring never needs a
    # mid-frame host round trip. The ring (Tracker.track_pipelined)
    # dispatches frame i against frame i-1's device-resident features
    # BEFORE fetching frame i-1's scalars, so the per-frame blocking cost
    # collapses to ONE fetch RTT (VERDICT r4 item 3: the serial
    # dispatch->fetch chain paid ~2 blocking RTTs/frame).
    _use_dense_pipe = cfg.use_dense_icp

    def _pipe_step(ref: FrameFeatures, d_prev, gray, depth, key, threshold):
        key, sub = jax.random.split(key)
        cur = ex.build(gray, depth, threshold)
        T21, res, _packed = _fused(ref, cur, sub)
        if _use_dense_pipe:
            T_d = dense_icp(cam, d_prev, depth, T21,
                            levels=cfg.dense_icp_levels,
                            max_correction=(0.1, 0.1))
            T21 = jnp.where(res.success, T_d, T21)
        packed = jnp.concatenate([
            T21.reshape(16),
            jnp.stack([res.success.astype(jnp.float32),
                       res.rmse.astype(jnp.float32),
                       res.num_inliers.astype(jnp.float32)]),
            jnp.sum(cur.valid).astype(jnp.float32)[None],
        ])
        return key, cur, packed

    # ---- batched full-SLAM step: B frames per dispatch ----------------
    # The per-frame path pays one dispatch + one fetch per frame — each a
    # full RPC round trip on a remote-TPU link. Here a lax.scan chains B
    # frames (features, match, RANSAC, GICP select) AND evaluates the
    # keyframe gate on device (accumulated motion vs the last KF carried
    # as D = Tcw_cur Twc_kf), so a batch costs ONE dispatch + ONE (B, 21)
    # fetch; per-frame features come back stacked and stay on device for
    # the backend's fused keyframe program. Batched-mode divergences
    # (documented): no second-reference retry (a failed frame holds the
    # pose, recover() semantics) and backend pose corrections apply at
    # batch boundaries — the reference's backend thread is asynchronous
    # anyway, so batch-delayed corrections match its semantics class.
    kf_cfg = cfg.keyframe
    use_dense = cfg.use_dense_icp
    # batched ADAPTIVE mode (VERDICT r3 weak #6: the per-frame within-frame
    # retry loop costs up to 5 sequential round trips and had no batched
    # equivalent): the detection threshold joins the scan CARRY and the
    # DetectorAdjuster x0.7/x1.3 feedback (Features/DetectorAdjuster.cpp:
    # 45-57) runs ON DEVICE between frames — the cross-frame persistent-
    # threshold behavior of VideoDynamicAdaptedFeatureDetector with zero
    # host round trips. (Within-frame re-detection stays a per-frame-mode
    # feature; in a scan the budgeted top-N cap makes over-detection
    # harmless and under-detection recovers on the next frame.)
    _, _use_fast_gate, _, _ = ex._resolved()
    adaptive_on = cfg.adaptive and _use_fast_gate
    _tmin, _tmax = float(ex.target_min), float(ex.target_max)
    _thmin, _thmax = float(ex.th_min), float(ex.th_max)

    def _batch_body(carry, inp):
        f_prev, D, d_prev, thr, key = carry
        g, d = inp
        key, sub = jax.random.split(key)
        f_cur = ex.build(g, d, thr)
        T21, res, packed = _fused(f_prev, f_cur, sub)   # GICP fused inside
        if use_dense:
            # dense projective point-to-plane polish, as in the
            # per-frame path (there is no ref2 fallback in a batch, so
            # the skip-after-ref2 guard is moot here)
            T_d = dense_icp(cam, d_prev, d, T21,
                            levels=cfg.dense_icp_levels,
                            max_correction=(0.1, 0.1))
            T21 = jnp.where(res.success, T_d, T21)
        T21_eff = jnp.where(res.success, T21, jnp.eye(4, dtype=T21.dtype))
        D_new = T21_eff @ D
        tn = jnp.linalg.norm(D_new[:3, 3])
        cosr = jnp.clip(0.5 * (jnp.trace(D_new[:3, :3]) - 1.0),
                        -1.0, 1.0)
        rn = jnp.arccos(cosr)
        kf = res.success & ((tn > kf_cfg.min_translation)
                            | (rn > kf_cfg.min_rotation))
        D_out = jnp.where(kf, jnp.eye(4, dtype=D.dtype), D_new)
        n_valid = jnp.sum(f_cur.valid).astype(jnp.float32)
        if adaptive_on:
            thr_new = jnp.where(
                n_valid < _tmin, jnp.maximum(thr * 0.7, _thmin),
                jnp.where(n_valid > _tmax,
                          jnp.minimum(thr * 1.3, _thmax), thr))
        else:
            thr_new = thr
        out = jnp.concatenate([
            T21.reshape(16),
            jnp.stack([res.success.astype(jnp.float32),
                       res.rmse.astype(jnp.float32),
                       res.num_inliers.astype(jnp.float32),
                       kf.astype(jnp.float32),
                       n_valid,
                       thr_new.astype(jnp.float32)]),
        ])
        return (f_cur, D_out, d, thr_new, key), (f_cur, out)

    def _batch_step(f_ref, D0, d_ref, thr0, grays, depths, key):
        (f_fin, D_fin, d_fin, thr_fin, key), (feats, packed) = jax.lax.scan(
            _batch_body, (f_ref, D0, d_ref, thr0, key), (grays, depths)
        )
        return (f_fin, D_fin, d_fin, thr_fin), key, feats, packed

    return {
        "fused": jax.jit(_fused),
        "step": jax.jit(_step),
        "pipe_step": jax.jit(_pipe_step),
        # one fetch per frame: the frame's 20 scalars + the previous
        # completion's keyframe blob ride a single packed array
        "pipe_pack": jax.jit(lambda p, b: jnp.concatenate([p, b])),
        "batch_step": jax.jit(_batch_step),
        "slice_feats": jax.jit(lambda f, i: jax.tree.map(lambda x: x[i], f)),
    }


class Tracker:
    """Frame-to-frame visual odometry + keyframe selection.

    The backend (pose graph / loop closure) subscribes via `on_keyframe`; after
    a global optimization it calls `apply_correction` — the functional
    equivalent of the reference's cross-thread Tracking::correct callback
    (System/Tracking.cpp:165-193 / Solver/PoseGraph.cpp:72).
    """

    def __init__(self, cam: Camera, cfg: SlamConfig = SlamConfig(), seed: int = 0):
        self.cam = cam
        self.cfg = cfg
        self.state = TrackerState.NOT_INITIALIZED
        self.stats = TrackStats()
        self._key = jax.random.PRNGKey(seed)

        # reference frames (mpRefFrame.first / .second, System/Tracking.cpp:59-60)
        self.ref_frame: Optional[FrameFeatures] = None
        self.ref2_frame: Optional[FrameFeatures] = None
        self.ref_Tcw = np.eye(4, dtype=np.float32)
        self.ref2_Tcw = np.eye(4, dtype=np.float32)
        self.ref_depth = None          # kept only when dense ICP is on
        self._cur_depth = None
        # feature extraction via the factory (detector variant + ADAPTIVE
        # threshold feedback, frontend/extractor.py); this instance carries
        # the mutable ADAPTIVE threshold state — the pure device programs
        # come from the shared (cam, cfg) cache
        self._extractor = Extractor(cam, cfg.extractor, detector=cfg.detector,
                                    adaptive=cfg.adaptive)
        progs = _tracker_programs(cam, cfg)
        self._fused_estimate = progs["fused"]
        self._step = progs["step"]
        self._pipe_step = progs["pipe_step"]
        self._pipe_pack = progs["pipe_pack"]
        self._batch_step = progs["batch_step"]
        self._slice_feats = progs["slice_feats"]
        self._thr_dev = None
        self._thr_val = None
        # per-frame dispatch/fetch ring state (track_pipelined): the pending
        # frame's device handles, the last-dispatched frame's features/depth
        # (the NEXT dispatch's reference), and the keyframe handle whose
        # blob rides the next combined fetch
        self._pipe = None
        self._pipe_ref = None
        self._pipe_depth = None
        self._pipe_kf_pending = None
        self._empty_blob = None
        # device-resident scan carry (features, accumulated-motion D, depth)
        # chained across batches so batch i+1 can DISPATCH before batch i's
        # blob is fetched (double buffering: the fetch RPC of batch i
        # overlaps the device compute of batch i+1). None = rebuild from
        # host state (first batch, or after per-frame tracking).
        self._batch_carry = None

        # keyframes: host registry (features + poses); device-side stores for
        # the backend live in mapping/keyframes.py
        self.keyframes: List[Tuple[float, FrameFeatures, np.ndarray]] = []
        self.last_kf_Tcw = np.eye(4, dtype=np.float32)
        self.trajectory: List[TrackedFrame] = []
        self.velocity = np.eye(4, dtype=np.float32)  # motion model (Tracking.cpp:54)
        self.on_keyframe = None  # callback(kf_index, timestamp, features, Tcw)
        # optional pipelined backend hooks (batched tracking): dispatch
        # returns a handle with a lazy device blob; complete(handle, blob_row)
        # finishes the host bookkeeping after ONE stacked fetch per batch
        self.on_keyframe_dispatch = None
        self.on_keyframe_complete = None
        # LOST-state relocalization hook, installed by SlamSystem:
        # callback(FrameFeatures) -> (ok, Tcw). The reference's LOST never
        # persists (recover() holds the pose, System/Tracking.cpp:195-199);
        # with this hook, `lost_after` consecutive failures enter LOST and
        # the frame is re-localized against the BoW keyframe database.
        self.relocalize_fn = None
        self.consecutive_failures = 0

    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _estimate(self, ref: FrameFeatures, cur: FrameFeatures):
        """Fused match+RANSAC+GICP against an arbitrary reference (the ref2
        retry path); returns the packed device row."""
        _T21, _res, packed = self._fused_estimate(ref, cur, self._next_key())
        return packed

    # ------------------------------------------------------------------
    def track(self, timestamp: float, gray, depth) -> np.ndarray:
        """Process one frame; returns Tcw (Tracking::track,
        System/Tracking.cpp:39-75)."""
        if self._pipe is not None:
            self.track_pipelined_flush()   # mode switch drains the ring
        if self.cfg.use_dense_icp:
            self._cur_depth = jnp.asarray(depth)

        if self.state is TrackerState.NOT_INITIALIZED:
            f = self._extractor(gray, depth)
            Tcw = np.eye(4, dtype=np.float32)
            self._initialize(timestamp, f, Tcw)
        else:
            Tcw, f = self._visual_odometry(timestamp, gray, depth)
            if self.state is TrackerState.LOST and self.relocalize_fn is not None:
                ok, Tcw_r = self.relocalize_fn(f)
                if ok:
                    Tcw = np.asarray(Tcw_r, dtype=np.float32)
                    self.state = TrackerState.OK
                    self.consecutive_failures = 0
                    self.stats.relocalizations += 1
                    # recovered pose becomes the live reference
                    self.ref_frame, self.ref_Tcw = f, Tcw.copy()
                    self.ref2_frame, self.ref2_Tcw = f, Tcw.copy()

        # keyframe policy + bookkeeping
        if self.state is TrackerState.OK and len(self.keyframes) > 0:
            if self._need_keyframe(Tcw):
                self._create_keyframe(timestamp, f, Tcw)
                # the backend (local BA / loop closure) may have corrected
                # keyframe poses inside on_keyframe — adopt the corrected
                # pose for the frame that just became that keyframe, so its
                # trajectory entry stays identity-relative to itself
                Tcw = self.keyframes[-1][2].copy()
                self.ref_Tcw = Tcw.copy()

        ref_kf_idx = len(self.keyframes) - 1
        kf_Tcw = self.keyframes[ref_kf_idx][2]
        Tcr = Tcw @ se3.inverse_np(kf_Tcw)  # System/Tracking.cpp:252
        self.trajectory.append(
            TrackedFrame(timestamp, Tcw.copy(), Tcr, ref_kf_idx, self._last_inliers)
        )
        return Tcw

    # ------------------------------------------------------------------
    def track_batch(self, timestamps, grays, depths) -> np.ndarray:
        """Process B frames with ONE device dispatch + ONE small fetch.

        The deployment-shape counterpart of track(): the VO chain and the
        keyframe gate run in a lax.scan on device; the host completes each
        frame's bookkeeping (trajectory, keyframe backend, relocalization)
        from the (B, 21) packed result. Returns Tcw (B, 4, 4).

        For pipelined deployment call the two phases directly —
        track_batch_dispatch(batch i+1) BEFORE track_batch_complete(batch i)
        — so the fetch RPC of one batch overlaps the device compute of the
        next (the reference overlaps tracking and backend with threads,
        main.cpp:39-48 / Solver/PoseGraph.cpp:56-103; here the overlap is
        host/device instead).

        Divergences from the per-frame path (see _batch_step): no
        second-reference retry; corrections land at batch boundaries; the
        ADAPTIVE threshold feedback runs per-frame ON DEVICE in the scan
        carry (cross-frame persistence, DetectorAdjuster x0.7/x1.3) instead
        of the per-frame path's within-frame retry loop.
        """
        return self.track_batch_complete(
            self.track_batch_dispatch(timestamps, grays, depths))

    def track_batch_dispatch(self, timestamps, grays, depths) -> dict:
        """Dispatch phase: upload the batch and launch the fused VO scan —
        no fetch. The scan carry chains on device from the previous
        dispatch, so any number of batches can be in flight."""
        if self._pipe is not None:
            self.track_pipelined_flush()   # mode switch drains the ring
        B = len(timestamps)
        h = {"timestamps": list(timestamps), "B": B, "start": 0,
             "init_Tcw": None}
        if self.state is TrackerState.NOT_INITIALIZED:
            f0 = self._extractor(grays[0], depths[0])
            RPC.dispatches += 1
            Tcw0 = np.eye(4, dtype=np.float32)
            self._initialize(timestamps[0], f0, Tcw0)
            self.trajectory.append(
                TrackedFrame(timestamps[0], Tcw0,
                             np.eye(4, dtype=np.float32), 0, 0))
            h["init_Tcw"] = Tcw0
            h["start"] = 1
            if B == 1:
                return h
        if self._thr_val != self._extractor.threshold:
            self._thr_val = self._extractor.threshold
            self._thr_dev = jnp.float32(self._thr_val)

        start = h["start"]
        gs = jnp.stack([jnp.asarray(g) for g in grays[start:]])
        ds = jnp.stack([jnp.asarray(d) for d in depths[start:]])
        if self._batch_carry is None:
            D0 = jnp.asarray(
                (self.ref_Tcw
                 @ se3.inverse_np(self.last_kf_Tcw)).astype(np.float32))
            # reference depth seeds the dense-ICP carry (unused unless
            # cfg.use_dense_icp; an alias of a batch frame otherwise)
            d_ref = (self.ref_depth if self.ref_depth is not None
                     else jnp.asarray(depths[0]))
            # the ADAPTIVE threshold rides the scan carry (feedback runs on
            # device between frames); seeded from the host extractor state
            carry = (self.ref_frame, D0, jnp.asarray(d_ref), self._thr_dev)
        else:
            carry = self._batch_carry
        self._batch_carry, self._key, feats, packed = self._batch_step(
            *carry, gs, ds, self._key)
        RPC.dispatches += 1
        h["feats"] = feats
        h["packed"] = packed
        h["f_fin"] = self._batch_carry[0]
        h["d_fin"] = self._batch_carry[2]
        return h

    def track_batch_complete(self, h: dict) -> np.ndarray:
        """Completion phase: ONE packed fetch, then per-frame host
        bookkeeping (trajectory, keyframe backend, relocalization).
        Completions must run in dispatch order."""
        B, start = h["B"], h["start"]
        timestamps = h["timestamps"]
        out = np.zeros((B, 4, 4), np.float32)
        if h["init_Tcw"] is not None:
            out[0] = h["init_Tcw"]
            if B == 1:
                return out
        feats = h["feats"]
        pk = RPC.fetch(h["packed"])      # the ONE per-batch fetch

        Tcw = self.ref_Tcw.copy()
        pending = []                     # dispatched keyframe handles
        for i in range(B - start):
            ts = timestamps[start + i]
            T21 = pk[i, :16].reshape(4, 4)
            success = bool(pk[i, 16] > 0.5)
            n_inl = int(pk[i, 18]) if success else 0
            kf_flag = bool(pk[i, 19] > 0.5)
            self.stats.frames += 1
            self.stats.acum_inliers += n_inl
            self._last_inliers = n_inl
            if success:
                # polar projection keeps the chained pose on SE(3): the
                # closed-form inverse_np mirrors (not inverts) rotation
                # scale drift, so uncorrected f32 drift would feed back
                # through apply_correction and compound per loop closure
                # (se3.orthonormalize_np docstring has the measurement)
                Tcw = se3.orthonormalize_np(T21 @ Tcw)
                self.consecutive_failures = 0
                if self.state is TrackerState.LOST:
                    self.state = TrackerState.OK
            else:
                self.stats.failures += 1
                self.consecutive_failures += 1
                if (self.cfg.use_relocalization
                        and self.relocalize_fn is not None
                        and self.consecutive_failures >= self.cfg.lost_after):
                    self.state = TrackerState.LOST
                    ok, Tcw_r = self.relocalize_fn(
                        self._slice_feats(feats, i))
                    if ok:
                        Tcw = np.asarray(Tcw_r, dtype=np.float32)
                        self.state = TrackerState.OK
                        self.consecutive_failures = 0
                        self.stats.relocalizations += 1
            if kf_flag and self.state is TrackerState.OK and self.keyframes:
                if self.on_keyframe_dispatch is not None:
                    # pipelined backend: dispatch now (device-chained via the
                    # donated bank), complete after ONE stacked blob fetch.
                    # The keyframe's features are row i of the scan output —
                    # gathered INSIDE the fused program (feats_batch), so no
                    # per-KF slice launch; the host registry keeps no feature
                    # reference (nothing reads it — the store/bank are
                    # authoritative)
                    self.keyframes.append((ts, None, Tcw.copy()))
                    self.last_kf_Tcw = Tcw.copy()
                    pending.append(self.on_keyframe_dispatch(
                        len(self.keyframes) - 1, ts, None, Tcw.copy(),
                        feats_batch=feats, batch_row=i))
                else:
                    f_i = self._slice_feats(feats, i)
                    self._create_keyframe(ts, f_i, Tcw)
                    # adopt any backend correction of the keyframe's pose
                    Tcw = self.keyframes[-1][2].copy()
            ref_kf_idx = len(self.keyframes) - 1
            Tcr = Tcw @ se3.inverse_np(self.keyframes[ref_kf_idx][2])
            self.trajectory.append(
                TrackedFrame(ts, Tcw.copy(), Tcr, ref_kf_idx, n_inl))
            out[start + i] = Tcw
        # slide references to the batch's last frame
        self.velocity = Tcw @ np.linalg.inv(self.ref_Tcw)
        self.ref2_frame, self.ref2_Tcw = self.ref_frame, self.ref_Tcw
        self.ref_frame, self.ref_Tcw = h["f_fin"], Tcw.copy()
        self.ref_depth = h["d_fin"]
        if self._extractor.adaptive:
            # sync the host extractor with the device-evolved ADAPTIVE
            # threshold (authoritative for the next carry reseed / a switch
            # back to per-frame tracking)
            self._extractor.threshold = float(pk[B - start - 1, 21])
        # complete the batch's keyframes: ONE stacked fetch for all blobs
        if pending:
            blobs = RPC.fetch(jnp.stack([hk["blob"] for hk in pending]))
            for hk, row in zip(pending, blobs):
                self.on_keyframe_complete(hk, row)
        return out

    # ------------------------------------------------------------------
    # Per-frame dispatch/fetch RING (VERDICT r4 item 3): per-frame tracking
    # whose blocking cost is ONE fetch RTT per frame instead of the serial
    # dispatch->fetch(+KF dispatch->fetch) chain. Semantics are the serial
    # per-frame path's (host keyframe gate on corrected poses, ref2 retry,
    # relocalization), with two documented shifts: the keyframe BACKEND
    # completes one frame late (its blob rides the next frame's fetch — the
    # reference's backend thread is asynchronous by the same one-queue-slot
    # argument, Solver/PoseGraph.cpp:289-302), and the ADAPTIVE feedback
    # applies one frame late (no within-frame re-detection retry).
    # tests/test_system.py::test_pipelined_ring_matches_per_frame pins
    # trajectory parity with the serial path.
    # ------------------------------------------------------------------
    def track_pipelined(self, timestamp: float, gray, depth):
        """Feed frame i into the ring; completes and returns
        (ts, Tcw) of frame i-1, or None when nothing completed yet.
        Call track_pipelined_flush() after the last frame."""
        if self.state is TrackerState.NOT_INITIALIZED:
            Tcw = self.track(timestamp, gray, depth)
            self._pipe_ref = self.ref_frame
            self._pipe_depth = jnp.asarray(depth)
            return timestamp, Tcw
        self._batch_carry = None
        if self._thr_val != self._extractor.threshold:
            self._thr_val = self._extractor.threshold
            self._thr_dev = jnp.float32(self._thr_val)
        d_cur = jnp.asarray(depth)
        # 1. dispatch frame i against frame i-1's device-resident features
        #    BEFORE the blocking fetch below — the device computes frame i
        #    while the host waits for frame i-1's scalars
        self._key, f, packed = self._pipe_step(
            self._pipe_ref, self._pipe_depth, jnp.asarray(gray), d_cur,
            self._key, self._thr_dev)
        RPC.dispatches += 1
        key_snapshot = self._key
        # 2. complete frame i-1 (may dispatch a keyframe program — its blob
        #    joins THIS frame's combined fetch, completing next iteration)
        out = self._pipe_complete()
        kf_h = self._pipe_kf_pending
        self._pipe_kf_pending = None
        if self._empty_blob is None:
            self._empty_blob = jnp.zeros((0,), jnp.float32)
        blob = kf_h["blob"] if kf_h is not None else self._empty_blob
        combined = self._pipe_pack(packed, blob)
        RPC.dispatches += 1
        # the post-step key snapshot makes a (rare) ref2 retry draw the
        # SAME RANSAC hypotheses the serial path would — by completion
        # time self._key has already advanced past the next frame's
        # dispatch, and a different draw on a marginal frame flips the
        # retry outcome (observed: serial recovers with 20 inliers, ring
        # fails, trajectories fork)
        self._pipe = {"ts": timestamp, "f": f, "d": d_cur,
                      "combined": combined, "kf_h": kf_h,
                      "key": key_snapshot}
        self._pipe_ref = f
        self._pipe_depth = d_cur
        return out

    def track_pipelined_flush(self):
        """Drain the ring: complete the last pending frame (and any
        keyframe it created). Returns its (ts, Tcw) or None."""
        out = self._pipe_complete()
        if self._pipe_kf_pending is not None:
            h = self._pipe_kf_pending
            self._pipe_kf_pending = None
            self.on_keyframe_complete(h, RPC.fetch(h["blob"]))
        return out

    def _pipe_complete(self):
        """Complete the pending ring frame: ONE fetch covers its VO scalars
        AND the blob of the keyframe dispatched by the previous completion;
        then the serial per-frame host bookkeeping (mirrors
        _visual_odometry + track)."""
        p = self._pipe
        if p is None:
            return None
        self._pipe = None
        pk_all = RPC.fetch(p["combined"])
        if p["kf_h"] is not None:
            # backend completion for the PREVIOUS keyframe — runs before
            # this frame's pose composition, preserving the serial order
            # (corrections land via apply_correction, re-anchoring ref_Tcw)
            self.on_keyframe_complete(p["kf_h"], pk_all[20:])
        ts, f = p["ts"], p["f"]
        pk = pk_all[:20]
        T21_host = pk[:16].reshape(4, 4)
        success, rmse, n_inl = bool(pk[16] > 0.5), float(pk[17]), int(pk[18])
        self._extractor.adapt(int(pk[19]))   # one-frame-lagged feedback
        ref_Tcw = self.ref_Tcw
        if not success and self.ref2_frame is not None:
            # anti-drift hover heuristic (System/Tracking.cpp:136-143):
            # serial retry against the second reference — rare, so the
            # extra round trip is off the steady-state budget. The key
            # comes from the frame's post-step snapshot (see feed), so the
            # draw matches the serial path's exactly.
            sub = jax.random.split(p["key"])[1]
            _t, _r, packed2 = self._fused_estimate(self.ref2_frame, f, sub)
            RPC.dispatches += 1
            pk2 = RPC.fetch(packed2)
            T21_host, success, rmse, n_inl = (
                pk2[:16].reshape(4, 4), bool(pk2[16] > 0.5),
                float(pk2[17]), int(pk2[18]))
            ref_Tcw = self.ref2_Tcw

        n_inl = int(n_inl) if success else 0
        self._last_inliers = n_inl
        self.stats.frames += 1
        self.stats.acum_inliers += n_inl
        if success:
            # SE(3) projection — see the batch path / se3.orthonormalize_np
            Tcw = se3.orthonormalize_np(np.asarray(T21_host) @ ref_Tcw)
            self.consecutive_failures = 0
            if self.state is TrackerState.LOST:
                self.state = TrackerState.OK
        else:
            self.stats.failures += 1
            Tcw = self.ref_Tcw.copy()
            self.consecutive_failures += 1
            if (self.cfg.use_relocalization
                    and self.relocalize_fn is not None
                    and self.consecutive_failures >= self.cfg.lost_after):
                self.state = TrackerState.LOST
        self.velocity = Tcw @ np.linalg.inv(self.ref_Tcw)
        self.ref2_frame, self.ref2_Tcw = self.ref_frame, self.ref_Tcw
        self.ref_frame, self.ref_Tcw = f, Tcw.copy()
        self.ref_depth = p["d"]

        if self.state is TrackerState.LOST and self.relocalize_fn is not None:
            ok, Tcw_r = self.relocalize_fn(f)
            if ok:
                Tcw = np.asarray(Tcw_r, dtype=np.float32)
                self.state = TrackerState.OK
                self.consecutive_failures = 0
                self.stats.relocalizations += 1
                self.ref_frame, self.ref_Tcw = f, Tcw.copy()
                self.ref2_frame, self.ref2_Tcw = f, Tcw.copy()

        # host keyframe gate on corrected poses (per-frame parity)
        if (self.state is TrackerState.OK and self.keyframes
                and self._need_keyframe(Tcw)):
            self.keyframes.append((ts, None, Tcw.copy()))
            self.last_kf_Tcw = Tcw.copy()
            k = len(self.keyframes) - 1
            if self.on_keyframe_dispatch is not None:
                # backend dispatch now; blob fetched with the NEXT frame
                self._pipe_kf_pending = self.on_keyframe_dispatch(
                    k, ts, f, Tcw.copy())
            elif self.on_keyframe is not None:
                self.on_keyframe(k, ts, f, Tcw.copy())
                Tcw = self.keyframes[-1][2].copy()
                self.ref_Tcw = Tcw.copy()
        ref_kf_idx = len(self.keyframes) - 1
        Tcr = Tcw @ se3.inverse_np(self.keyframes[ref_kf_idx][2])
        self.trajectory.append(
            TrackedFrame(ts, Tcw.copy(), Tcr, ref_kf_idx, n_inl))
        return ts, Tcw

    # ------------------------------------------------------------------
    def _initialize(self, timestamp: float, f: FrameFeatures, Tcw: np.ndarray):
        """First frame: identity pose + first keyframe
        (System/Tracking.cpp:97-119; landmark creation is handled by the
        mapping layer on keyframe insertion)."""
        self.ref_frame = f
        self.ref2_frame = f
        self.ref_Tcw = Tcw.copy()
        self.ref2_Tcw = Tcw.copy()
        self.ref_depth = self._cur_depth
        self._last_inliers = 0
        self._batch_carry = None     # batch scans re-seed from host state
        self._create_keyframe(timestamp, f, Tcw)
        self.state = TrackerState.OK

    def _visual_odometry(self, timestamp: float, gray, depth):
        """Frame-to-frame VO with second-reference retry and GICP refinement
        (System/Tracking.cpp:121-163). Feature build + match + RANSAC + the
        rmse-triggered GICP polish is ONE device dispatch; all host-consumed
        scalars come back in ONE fetch. Divergence from the reference: a
        non-converged GICP keeps the RANSAC pose instead of declaring
        tracking lost — the reference overwrites its success flag with the
        GICP result (System/Tracking.cpp:150), discarding a valid RANSAC
        estimate."""
        ex = self._extractor
        for attempt in range(5):   # VideoDynamicAdaptedFeatureDetector's
            # <=5 within-frame re-detections (VideoDynamicAdapted-
            # FeatureDetector.cpp:24-44). With the fixed N-slot budget,
            # over-detection is harmless (top-N caps it), so only the
            # under-detection direction re-runs — a scene cut re-detects at
            # a lowered threshold in the SAME frame instead of under-
            # tracking until the cross-frame feedback converges.
            if self._thr_val != ex.threshold:
                self._thr_val = ex.threshold
                self._thr_dev = jnp.float32(self._thr_val)
            self._key, f, packed = self._step(
                self.ref_frame, jnp.asarray(gray), jnp.asarray(depth),
                self._key, self._thr_dev)
            RPC.dispatches += 1
            # ONE device->host read for all per-frame scalars (a tuple
            # device_get still fetches each array in its own tunnel RPC)
            pk = RPC.fetch(packed)
            n_valid = int(pk[19])
            ex.adapt(n_valid)
            if not (ex.adaptive and n_valid < ex.target_min
                    and ex.threshold < self._thr_val - 1e-9):
                break
        ref_Tcw = self.ref_Tcw
        used_ref2 = False
        T21_host, success, rmse, n_inl = (
            pk[:16].reshape(4, 4), bool(pk[16] > 0.5), float(pk[17]),
            int(pk[18]))

        if not success and self.ref2_frame is not None:
            # anti-drift hover heuristic (System/Tracking.cpp:136-143)
            packed, ref_Tcw = (
                self._estimate(self.ref2_frame, f), self.ref2_Tcw)
            used_ref2 = True
            RPC.dispatches += 1
            pk = RPC.fetch(packed)
            T21_host, success, rmse, n_inl = (
                pk[:16].reshape(4, 4), bool(pk[16] > 0.5), float(pk[17]),
                int(pk[18]))

        if (success and self.cfg.use_dense_icp and not used_ref2
                and self.ref_depth is not None):
            # dense projective point-to-plane polish of the sparse estimate.
            # Skipped after the ref2 fallback: only the most recent depth
            # image is retained, and refining a T(ref2->cur) estimate against
            # ref's depth would converge to T(ref->cur) and silently compose
            # it with ref2's pose.
            T_d = dense_icp(self.cam, self.ref_depth, self._cur_depth,
                            jnp.asarray(T21_host),
                            levels=self.cfg.dense_icp_levels,
                            max_correction=(0.1, 0.1))
            RPC.dispatches += 1
            _t0 = time.perf_counter()
            T21_host = jax.device_get(T_d)
            RPC.fetches += 1
            RPC.fetch_s += time.perf_counter() - _t0

        n_inl = int(n_inl) if success else 0
        self._last_inliers = n_inl
        self.stats.frames += 1
        self.stats.acum_inliers += n_inl

        if success:
            # SE(3) projection — see the batch path / se3.orthonormalize_np
            Tcw = se3.orthonormalize_np(np.asarray(T21_host) @ ref_Tcw)
            self.consecutive_failures = 0
            if self.state is TrackerState.LOST:
                self.state = TrackerState.OK
        else:
            # recover(): hold the reference pose (System/Tracking.cpp:195-199)
            self.stats.failures += 1
            Tcw = self.ref_Tcw.copy()
            self.consecutive_failures += 1
            if (self.cfg.use_relocalization
                    and self.relocalize_fn is not None
                    and self.consecutive_failures >= self.cfg.lost_after):
                self.state = TrackerState.LOST

        # motion model, updated for parity with the reference
        # (System/Tracking.cpp:54); the reference likewise only *computes* it —
        # its velocity-seeded recover() is commented out
        # (System/Tracking.cpp:197)
        self.velocity = Tcw @ np.linalg.inv(self.ref_Tcw)
        # slide references (System/Tracking.cpp:59-60)
        self.ref2_frame, self.ref2_Tcw = self.ref_frame, self.ref_Tcw
        self.ref_frame, self.ref_Tcw = f, Tcw.copy()
        self.ref_depth = self._cur_depth
        self._batch_carry = None     # per-frame path moved the references
        return Tcw, f

    # ------------------------------------------------------------------
    def _need_keyframe(self, Tcw: np.ndarray) -> bool:
        """>0.20 m or >10 deg accumulated motion since the last KF
        (System/Tracking.cpp:213-225)."""
        delta = se3.inverse_np(Tcw) @ self.last_kf_Tcw
        tn = float(np.linalg.norm(delta[:3, 3]))
        c = np.clip(0.5 * (np.trace(delta[:3, :3]) - 1.0), -1.0, 1.0)
        rn = float(np.arccos(c))
        kf_cfg = self.cfg.keyframe
        return tn > kf_cfg.min_translation or rn > kf_cfg.min_rotation

    def _create_keyframe(self, timestamp: float, f: FrameFeatures, Tcw: np.ndarray):
        """Register a keyframe and notify the backend
        (System/Tracking.cpp:227-240; BoW + cloud building happen in the
        backend/mapping layers)."""
        self.keyframes.append((timestamp, f, Tcw.copy()))
        self.last_kf_Tcw = Tcw.copy()
        if self.on_keyframe is not None:
            self.on_keyframe(len(self.keyframes) - 1, timestamp, f, Tcw.copy())

    # ------------------------------------------------------------------
    def apply_correction(self, kf_poses: np.ndarray, relocalize: bool = True):
        """Pull optimized KF poses back in after a loop closure.

        kf_poses: (K, 4, 4) optimized Tcw for the first K keyframes. The
        reference re-localizes the current frame against the latest distinct
        KF (Tracking::correct, System/Tracking.cpp:165-193); here the
        functional handoff re-anchors the live reference poses through the
        last keyframe's correction.
        """
        k = len(self.keyframes)
        kf_poses = np.asarray(kf_poses)[:k]
        old_last = self.keyframes[-1][2]
        new_last = kf_poses[len(self.keyframes) - 1]
        self.keyframes = [
            (ts, f, kf_poses[i].astype(np.float32))
            for i, (ts, f, _) in enumerate(self.keyframes)
        ]
        self.last_kf_Tcw = self.keyframes[-1][2]
        if relocalize:
            # re-anchor the live reference poses through the last KF's
            # correction: Tcw_ref' = (Tcw_ref @ Tkf^-1_old) @ Tkf_new
            # the projection here is the backstop that breaks the
            # per-closure error feedback (se3.orthonormalize_np docstring)
            self.ref_Tcw = se3.orthonormalize_np(
                self.ref_Tcw @ se3.inverse_np(old_last) @ new_last)
            self.ref2_Tcw = se3.orthonormalize_np(
                self.ref2_Tcw @ se3.inverse_np(old_last) @ new_last)

    # ------------------------------------------------------------------
    def camera_trajectory(self) -> Tuple[np.ndarray, np.ndarray]:
        """Full camera trajectory replayed through (possibly optimized) KF
        poses, rebased to KF0 (saveCameraTrajectory semantics,
        System/Tracking.cpp:286-317).

        Returns (timestamps [N], poses Twc [N, 4, 4]).
        """
        if not self.trajectory:
            return np.zeros((0,)), np.zeros((0, 4, 4), np.float32)
        Two = se3.inverse_np(self.keyframes[0][2])
        ts, poses = [], []
        for fr in self.trajectory:
            Trw = self.keyframes[fr.ref_kf_index][2] @ Two
            Tcw = fr.Tcr @ Trw
            Twc = se3.inverse_np(Tcw)
            ts.append(fr.timestamp)
            poses.append(Twc.astype(np.float32))
        return np.asarray(ts), np.stack(poses)

    def keyframe_trajectory(self) -> Tuple[np.ndarray, np.ndarray]:
        """KF trajectory as Twc (saveKeyFrameTrajectory,
        System/Tracking.cpp:270-284)."""
        ts = np.asarray([k[0] for k in self.keyframes])
        poses = se3.inverse_np(np.stack([k[2] for k in self.keyframes])).astype(np.float32)
        return ts, poses
