"""Map-growth stress run: hundreds of keyframes through the LIVE system.

Exercises the paths that only engage at scale (SURVEY.md §5.7's map-growth
axis): the pose graph's automatic dense-Cholesky -> matrix-free-CG switch
(PoseGraphConfig.cg_vertex_threshold), BoW retrieval over a few hundred
keyframes, landmark-budget saturation, and repeated loop closures over a
3-revolution tour of the multi-room world.

  python benchmarks/scale_run.py [--frames 360] [--loops 3] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=360)
    ap.add_argument("--loops", type=float, default=3.0)
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu"])
    ap.add_argument("--batch", type=int, default=0,
                    help="use track_batch with this B (0 = per-frame)")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        os.makedirs("/root/repo/.jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import numpy as np

    import rgbdslam_tpu  # noqa: F401
    from rgbdslam_tpu.config import ExtractorConfig, LoopConfig, SlamConfig
    from rgbdslam_tpu.eval.ate import ate_rmse
    from rgbdslam_tpu.geometry.camera import Camera
    from rgbdslam_tpu.io.synthetic import SyntheticDataset
    from rgbdslam_tpu.slam.system import SlamSystem

    cam = Camera(130.0, 130.0, 79.5, 59.5, width=160, height=120)
    cfg = SlamConfig(
        extractor=ExtractorConfig(num_features=384, num_levels=3, cell_size=6,
                                  fast_threshold=12.0, min_response=8.0,
                                  min_border=16),
        loop=LoopConfig(id_interval=40, min_kfs_since_loop=15,
                        vocab_size=1024),
    )
    n = args.frames
    ds = SyntheticDataset(n_frames=n, cam=cam, trajectory="tour",
                          loops=args.loops)
    system = SlamSystem(cam, cfg, seed=0)

    t0 = time.perf_counter()
    if args.batch:
        B = args.batch
        frames = [ds.grab(i) for i in range(n)]
        for i in range(0, n, B):
            c = frames[i:i + B]
            system.track_batch([x[0] for x in c], [x[1] for x in c],
                               [x[2] for x in c])
    else:
        for i in range(n):
            ts, gray, depth = ds.grab(i)
            system.track(ts, gray, depth)
            if (i + 1) % 60 == 0:
                print(f"frame {i+1}/{n}  KFs={system.store.count} "
                      f"edges={system.graph.n_edges} "
                      f"loops={system.loops_closed}", file=sys.stderr)
    system.finish()
    wall = time.perf_counter() - t0

    ts_c, poses_c = system.camera_trajectory()
    rmse, _ = ate_rmse(ts_c, poses_c, ds.timestamps, ds.poses_twc)
    from rgbdslam_tpu.solvers.pose_graph import PoseGraph

    Kp = PoseGraph._pad(system.graph.n_vertices)
    print(json.dumps({
        "metric": "scale_run",
        "frames": n,
        "loops_toured": args.loops,
        "keyframes": system.store.count,
        "graph_edges": system.graph.n_edges,
        "loops_closed": system.loops_closed,
        "landmarks": int(system.landmarks.count),
        "solver_path": "cg" if Kp >= cfg.pose_graph.cg_vertex_threshold
        else "dense",
        "ate_rmse": round(float(rmse), 4),
        "fps": round(n / wall, 2),
        "failures": system.tracker.stats.failures,
    }))


if __name__ == "__main__":
    main()
