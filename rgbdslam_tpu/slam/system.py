"""Full SLAM system: tracking + pose-graph backend + loop closure.

TPU-native re-design of the reference's 3-thread runtime (SURVEY.md §2.7
P1-P4): the PoseGraph thread's polling loop (Solver/PoseGraph.cpp:59-103)
becomes a synchronous, functional backend step invoked per keyframe — state
handoff is explicit (arrays in, arrays out) instead of a mutex-guarded queue +
cross-thread callback. The heavy work (pairwise matching, RANSAC verification,
the Gauss-Newton graph solve, BoW scoring) runs as jitted device programs.

Backend step per keyframe (updateGraph semantics, Solver/PoseGraph.cpp:105-126):
  1. add vertex (Twc), odometry edge to the previous KF
     (createEdgeWithReference, info=100*I, from-state measurement),
  2. proximity edges: radius search over KF centers (0.5 m), candidates
     verified by match (>=30) + RANSAC before a measured edge is added
     (createLocalEdges, Solver/PoseGraph.cpp:128-184),
  3. loop detection: gated (>=15 KFs since last loop), BoW candidates,
     match threshold 0.2 * mean tracking inliers, RANSAC verification
     (detectLoop, Solver/PoseGraph.cpp:245-287),
  4. on a loop: optimize(20), write corrected poses back into the keyframe
     store and the tracker (Tracking::correct / Frame::correctPose semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rgbdslam_tpu.config import SlamConfig
from rgbdslam_tpu.frontend.frame import FrameFeatures
from rgbdslam_tpu.frontend.matcher import (correspondence_weights,
                                           match_descriptors)
from rgbdslam_tpu.geometry.camera import Camera
from rgbdslam_tpu.loop.detector import LoopDetector
from rgbdslam_tpu.mapping.keyframes import KeyframeStore
from rgbdslam_tpu.slam.tracking import Tracker
from rgbdslam_tpu.solvers.pose_graph import PoseGraph
from rgbdslam_tpu.solvers.ransac_se3 import ransac_se3


class SlamSystem:
    def __init__(self, cam: Camera, cfg: SlamConfig = SlamConfig(), seed: int = 0):
        self.cam = cam
        self.cfg = cfg
        kf_cfg = cfg.keyframe
        self.tracker = Tracker(cam, cfg, seed=seed)
        self.store = KeyframeStore(kf_cfg.max_keyframes, cfg.extractor.num_features)
        self.graph = PoseGraph(
            kf_cfg.max_keyframes,
            cfg.pose_graph.max_edges,
            information=cfg.pose_graph.edge_information,
            huber_delta=cfg.pose_graph.huber_delta,
            cg_threshold=cfg.pose_graph.cg_vertex_threshold,
            cg_iters=cfg.pose_graph.cg_iters,
        )
        self.loop_detector = LoopDetector(cfg.loop, kf_cfg.max_keyframes, seed=seed)
        from rgbdslam_tpu.mapping.landmarks import LandmarkStore

        self.landmarks = LandmarkStore(
            cfg.max_landmarks, cfg.max_obs_per_landmark,
            cfg.extractor.num_features,
        )
        self.kfs_since_loop = 0
        self.loops_closed = 0
        self.last_loop_candidates = 0   # viewer HUD counter analog
                                        # (Tracking::loopCandidates,
                                        #  Drawer/Viewer.cpp:113-120)
        self._key = jax.random.PRNGKey(seed + 12345)
        self.tracker.on_keyframe = self._on_keyframe
        if cfg.use_relocalization:
            self.tracker.relocalize_fn = self._relocalize

        # batched candidate verification: match + RANSAC vmapped over C
        # candidate keyframes against the current one in a single device
        # program — the sequential per-candidate loop costs C x 2 dispatch
        # round trips through the TPU tunnel
        matcher_cfg, ransac_cfg = cfg.matcher, cfg.ransac

        def _verify_one(desc_i, xyz_i, valid_i, desc_k, xyz_k, valid_k, key):
            m = match_descriptors(desc_i, valid_i, desc_k, valid_k,
                                  matcher_cfg.nn_ratio)
            mvalid = m.valid & valid_k[m.idx2]
            p1 = xyz_i
            p2 = xyz_k[m.idx2]
            w = correspondence_weights(p1, p2, mvalid)
            n_matches = jnp.sum(mvalid)
            res = ransac_se3(p1, p2, w, mvalid, key, ransac_cfg)
            return res.T21, res.num_inliers, res.success, n_matches

        def _verify_batch(descs, xyzs, valids, desc_k, xyz_k, valid_k, key):
            keys = jax.random.split(key, descs.shape[0])
            return jax.vmap(
                _verify_one, in_axes=(0, 0, 0, None, None, None, 0)
            )(descs, xyzs, valids, desc_k, xyz_k, valid_k, keys)

        self._verify_batch = jax.jit(_verify_batch)

    # ------------------------------------------------------------------
    def track(self, timestamp: float, gray, depth) -> np.ndarray:
        return self.tracker.track(timestamp, gray, depth)

    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _match_and_verify(self, i: int, j: int, min_matches: int):
        """Match KF i against KF j and verify with RANSAC.

        Returns (ok, T_ji, num_inliers): T_ji maps KF-i camera coords into
        KF-j camera coords (RansacSE3 with F1=i, F2=j).
        """
        di, xi, vi = self.store.features_of(i)
        dj, xj, vj = self.store.features_of(j)
        m = match_descriptors(
            jnp.asarray(di), jnp.asarray(vi), jnp.asarray(dj), jnp.asarray(vj),
            self.cfg.matcher.nn_ratio,
        )
        n_matches = int(m.num_matches)
        if n_matches < min_matches:
            return False, None, 0
        p1 = jnp.asarray(xi)
        p2 = jnp.asarray(xj)[m.idx2]
        w = correspondence_weights(p1, p2, m.valid)
        res = ransac_se3(p1, p2, w, m.valid, self._next_key(), self.cfg.ransac)
        if not bool(res.success) or int(res.num_inliers) < min_matches:
            return False, None, int(res.num_inliers)
        return True, np.asarray(res.T21), int(res.num_inliers)

    # ------------------------------------------------------------------
    def _on_keyframe(self, k: int, timestamp: float, f: FrameFeatures,
                     Tcw: np.ndarray):
        store_k = self.store.add(timestamp, f, Tcw)
        assert store_k == k
        Twc = np.linalg.inv(Tcw)
        vk = self.graph.add_vertex(Twc)
        assert vk == k
        self.kfs_since_loop += 1

        connections = set()
        if k > 0:
            # odometry edge (createEdgeWithReference)
            self.graph.add_odometry_edge(k, k - 1)
            connections.add(k - 1)

        # proximity edges (createLocalEdges), batched: all candidates are
        # matched + RANSAC-verified in one vmapped device call
        pg_cfg = self.cfg.pose_graph
        cands = [
            j for j in self.store.nearest(k, pg_cfg.proximity_radius,
                                          pg_cfg.max_proximity_candidates)
            if not self.graph.has_edge(k, j)
        ]
        if cands:
            C = pg_cfg.max_proximity_candidates
            idx = np.zeros((C,), np.int32)
            idx[: len(cands)] = cands
            descs = jnp.asarray(self.store.desc[idx])
            xyzs = jnp.asarray(self.store.xyz[idx])
            valids = jnp.asarray(self.store.obs_valid[idx])
            # padding slots point at candidate 0 with their results ignored
            T_b, ninl_b, ok_b, nm_b = self._verify_batch(
                descs, xyzs, valids,
                jnp.asarray(self.store.desc[k]),
                jnp.asarray(self.store.xyz[k]),
                jnp.asarray(self.store.obs_valid[k]),
                self._next_key(),
            )
            T_b, ninl_b, ok_b, nm_b = jax.device_get((T_b, ninl_b, ok_b, nm_b))
            for c, j in enumerate(cands):
                if not ok_b[c]:
                    continue
                if nm_b[c] < pg_cfg.proximity_min_matches:
                    continue
                if ninl_b[c] < pg_cfg.proximity_min_matches:
                    continue
                # RansacSE3(F1=j, F2=k) yields T with p_k = T p_j = T_{k<-j};
                # edge (a=k, b=j) needs Z = T_{a<-b} in Twc-vertex convention:
                # Z = X_k^-1 X_j = Tcw_k Twc_j = T_{k<-j}. Matches the
                # reference wiring (Solver/PoseGraph.cpp:147-153).
                self.graph.add_edge(k, j, np.asarray(T_b[c]))
                connections.add(j)
                self.loop_detector.connect(k, j)

        binary_desc = np.asarray(f.desc).dtype == np.uint32
        if binary_desc:
            self.loop_detector.add(np.asarray(f.desc),
                                   np.asarray(f.obs_valid), connections)

        # landmark-track extension (Landmark::addObservation analog): match
        # the previous keyframe's keypoints into this one
        match_idx = match_valid = None
        if k > 0:
            dp, xp, vp = self.store.features_of(k - 1)
            m = match_descriptors(
                jnp.asarray(dp), jnp.asarray(vp),
                jnp.asarray(self.store.desc[k]),
                jnp.asarray(self.store.obs_valid[k]),
                self.cfg.matcher.nn_ratio,
            )
            match_idx = np.asarray(m.idx2)
            match_valid = np.asarray(m.valid)
            # geometric gate on track extension: the relative KF pose is
            # known, so a correct association must map the old 3-D point
            # onto the new one (rejects descriptor aliasing). The metric
            # gate alone admits BA-poisoning associations (0.10 m at z=2 m
            # is a 10 px reprojection error for fx=200), so a pixel gate
            # on the predicted reprojection is applied as well.
            T21 = Tcw @ np.linalg.inv(self.store.poses_cw[k - 1])
            pred = xp @ T21[:3, :3].T + T21[:3, 3]
            err = np.linalg.norm(pred - self.store.xyz[k][match_idx], axis=-1)
            z_pred = np.maximum(pred[:, 2], 1e-6)
            u_pred = self.cam.fx * pred[:, 0] / z_pred + self.cam.cx
            v_pred = self.cam.fy * pred[:, 1] / z_pred + self.cam.cy
            uv_cur = self.store.uv[k][match_idx]
            err_px = np.hypot(u_pred - uv_cur[:, 0], v_pred - uv_cur[:, 1])
            match_valid = (match_valid & (err < 0.10)
                           & (err_px < self.cfg.track_gate_px)
                           & (pred[:, 2] > 0.05))
        # landmark tracks only accept depth-edge-free observations (depth at
        # occlusion-boundary corners flips between fore/background across
        # views, biasing BA)
        self.landmarks.add_keyframe(
            k, self.store.uv[k], self.store.xyz[k],
            self.store.obs_valid[k] & self.store.smooth[k],
            self.store.desc[k], self.store.intensity[k], Tcw,
            match_idx, match_valid, k - 1 if k > 0 else None,
        )

        # loop detection (detectLoop) — BoW quantization needs binary
        # descriptors; float (SIFT/SURF-class) runs are odometry+proximity
        loop_found = False
        if binary_desc and self.kfs_since_loop >= self.cfg.loop.min_kfs_since_loop:
            if self._detect_and_close_loop(k):
                self.kfs_since_loop = 0
                loop_found = True

        # local bundle adjustment over the sliding window (no reference
        # analog; BASELINE config 3)
        if self.cfg.use_local_ba and not loop_found:
            self._local_ba(k)

        # global BA polishes the pose-graph solution after a loop closure
        if self.cfg.use_global_ba and loop_found:
            self._global_ba(k)

    def _relocalize(self, f: FrameFeatures):
        """LOST-state global relocalization: BoW retrieval over the keyframe
        database + batched RANSAC verification of the top candidates.

        Beyond the reference (its recover() only holds the previous pose,
        System/Tracking.cpp:195-199); the retrieval follows
        LoopDetector::obtainCandidates' scoring and the geometric check
        mirrors Tracking::correct's RansacSE3 usage
        (System/Tracking.cpp:165-193). Returns (ok, Tcw) for the tracker.
        """
        from rgbdslam_tpu.loop.bow import bow_scores, bow_vector

        ld = self.loop_detector
        if ld.words is None or ld.count < 1:
            return False, None
        if np.asarray(f.desc).dtype != np.uint32:
            return False, None   # float-descriptor runs have no BoW database
        vec = bow_vector(f.desc, f.obs_valid, ld.words, ld.idf)
        scores = np.asarray(
            bow_scores(vec, jnp.asarray(ld.bow_db[: ld.count]))
        )
        n_cand = min(self.cfg.reloc_max_candidates, ld.count)
        cands = [int(j) for j in np.argsort(-scores)[:n_cand]]

        # batched match + RANSAC, reusing the proximity-verification program
        # (same padded candidate shape -> no new compile)
        C = self.cfg.pose_graph.max_proximity_candidates
        idx = np.zeros((C,), np.int32)
        idx[: len(cands)] = cands
        T_b, ninl_b, ok_b, _nm_b = self._verify_batch(
            jnp.asarray(self.store.desc[idx]),
            jnp.asarray(self.store.xyz[idx]),
            jnp.asarray(self.store.obs_valid[idx]),
            f.desc, f.xyz, f.obs_valid,
            self._next_key(),
        )
        T_b, ninl_b, ok_b = jax.device_get((T_b, ninl_b, ok_b))
        best, best_inl = -1, self.cfg.reloc_min_inliers - 1
        for c in range(len(cands)):
            if ok_b[c] and int(ninl_b[c]) > best_inl:
                best, best_inl = c, int(ninl_b[c])
        if best < 0:
            return False, None
        j = cands[best]
        # _verify_batch runs RansacSE3 with F1=candidate KF, F2=query frame,
        # so T_b = T_{query<-KF}: Tcw_query = T @ Tcw_KF
        # (Solver/SolverSE3.cpp:124-126 composition)
        Tcw = np.asarray(T_b[best]) @ self.store.poses_cw[j]
        return True, Tcw.astype(np.float32)

    def _detect_and_close_loop(self, k: int) -> bool:
        th = max(
            int(self.tracker.stats.mean_inliers * self.cfg.loop.match_fraction),
            self.cfg.ransac.min_inliers,
        )
        cands = self.loop_detector.candidates(k)
        self.last_loop_candidates = len(cands)
        for j in cands:
            if self.graph.has_edge(k, j):
                continue
            ok, T_jk, _ = self._match_and_verify(j, k, th)
            if not ok:
                continue
            self.graph.add_edge(k, j, T_jk)
            self.loop_detector.connect(k, j)
            self._optimize(self.cfg.pose_graph.opt_iters_loop)
            self.loops_closed += 1
            return True
        return False

    # ------------------------------------------------------------------
    def _local_ba(self, k: int):
        """Window BA: optimize the last `ba_window` keyframes + their
        landmarks (first window KF fixed as gauge)."""
        import jax.numpy as jnp

        from rgbdslam_tpu.solvers.ba import local_ba

        W = self.cfg.ba_window
        if k + 1 < W:
            return
        kf_lo = k - W + 1
        problem, lm_ids, kf_ids = self.landmarks.window_problem(
            kf_lo, k, self.store.poses_cw
        )
        if len(lm_ids) < 8:
            return
        fixed = jnp.zeros((W,), bool).at[0].set(True)
        Tcw_opt, Xw_opt, _cost = local_ba(
            self.cam, problem, fixed, self.cfg.ba_iterations
        )
        Tcw_opt = np.asarray(Tcw_opt)
        self.landmarks.update_from_solution(lm_ids, np.asarray(Xw_opt))
        self.store.poses_cw[kf_lo : k + 1] = Tcw_opt
        for i, kf in enumerate(kf_ids):
            self.graph.Twc[kf] = np.linalg.inv(Tcw_opt[i]).astype(np.float32)
        self.tracker.apply_correction(self.store.poses_cw[: k + 1],
                                      relocalize=True)

    # ------------------------------------------------------------------
    def _global_ba(self, k: int):
        """Full-map landmark-Schur bundle adjustment (beyond the reference:
        its backend is pose-graph-only, Solver/PoseGraph.cpp:350-368).

        Optimizes every keyframe pose and landmark jointly; the keyframe
        dimension is padded to a power-of-two bucket so the compiled program
        is reused as the map grows. KF 0 stays fixed as the gauge, matching
        the pose graph's vertex-0 anchor."""
        import jax.numpy as jnp

        from rgbdslam_tpu.solvers.ba import local_ba

        K = k + 1
        if K < 3:
            return
        pad_k = 4
        while pad_k < K:
            pad_k *= 2
        problem, lm_ids, kf_ids = self.landmarks.window_problem(
            0, k, self.store.poses_cw, pad_k=pad_k
        )
        if len(lm_ids) < 8:
            return
        fixed = np.zeros((pad_k,), bool)
        fixed[0] = True
        fixed[K:] = True   # padding keyframes must not move

        # joint optimization: the RANSAC-verified graph edges carry the
        # pairwise registration information (more accurate than drifting
        # landmark tracks); landmark terms add cross-view structure
        from rgbdslam_tpu.solvers.ba import BAEdges

        E = self.graph.n_edges
        Ep = 8
        while Ep < max(E, 1):
            Ep *= 2
        ea = np.zeros((Ep,), np.int32)
        eb = np.zeros((Ep,), np.int32)
        eZ = np.tile(np.eye(4, dtype=np.float32), (Ep, 1, 1))
        ew = np.zeros((Ep,), np.float32)
        ea[:E] = self.graph.e_a[:E]
        eb[:E] = self.graph.e_b[:E]
        eZ[:E] = self.graph.e_Z[:E]
        ew[:E] = self.graph.e_w[:E] * self.cfg.ba_edge_scale
        edges = BAEdges(a=jnp.asarray(ea), b=jnp.asarray(eb),
                        Z=jnp.asarray(eZ), w=jnp.asarray(ew))

        Tcw_opt, Xw_opt, _cost = local_ba(
            self.cam, problem, jnp.asarray(fixed),
            self.cfg.global_ba_iterations,
            edges=edges, edge_huber=self.graph.huber_delta,
        )
        Tcw_opt = np.asarray(Tcw_opt)[:K]
        self.landmarks.update_from_solution(lm_ids, np.asarray(Xw_opt))
        self.store.poses_cw[:K] = Tcw_opt
        for kf in kf_ids:
            self.graph.Twc[kf] = np.linalg.inv(Tcw_opt[kf]).astype(np.float32)
        self.tracker.apply_correction(self.store.poses_cw[:K],
                                      relocalize=True)

    # ------------------------------------------------------------------
    def _optimize(self, iterations: int):
        """Global pose-graph optimization + pose write-back
        (PoseGraph::optimize + Frame::correctPose + Tracking::correct)."""
        Twc_opt = self.graph.optimize(iterations)
        K = len(Twc_opt)
        old_poses_cw = self.store.poses_cw[:K].copy()
        Tcw_opt = np.stack([np.linalg.inv(T).astype(np.float32) for T in Twc_opt])
        # move the landmark cloud with its keyframes (Frame::correctPose
        # re-anchors landmarks after optimization, Core/Frame.cpp:437-454)
        self.landmarks.reanchor(old_poses_cw, Tcw_opt)
        self.store.set_poses(Tcw_opt)
        self.tracker.apply_correction(Tcw_opt)

    # ------------------------------------------------------------------
    def finish(self):
        """Drain + final optimization (PoseGraph::shutdown,
        Solver/PoseGraph.cpp:407-418)."""
        if self.graph.n_vertices > 5:
            self._optimize(self.cfg.pose_graph.opt_iters_default)
            if self.cfg.use_global_ba:
                self._global_ba(self.graph.n_vertices - 1)

    def camera_trajectory(self):
        return self.tracker.camera_trajectory()

    def keyframe_trajectory(self):
        return self.tracker.keyframe_trajectory()
