"""Distributed pose-graph BA scaling harness.

Measures Gauss-Newton iterations/s of the edge-sharded distributed optimizer
(parallel/dist_ba.py) across mesh sizes. On real multi-chip/multi-host TPU
hardware this measures true ICI/DCN scaling; on the CPU `--virtual N` mesh it
validates the SPMD program and gives a lower-bound sanity check (virtual
devices share host cores, so virtual "scaling" understates real hardware —
BASELINE.md's >=70%-at-2-hosts target needs a pod slice to measure).

Usage:
  python benchmarks/dist_ba_bench.py --devices 1 2 4 8 --virtual 8
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
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (0 = use real devices)")
    ap.add_argument("--vertices", type=int, default=256)
    ap.add_argument("--edges", type=int, default=4096)
    ap.add_argument("--iterations", type=int, default=10)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np

    from rgbdslam_tpu.geometry import se3
    from rgbdslam_tpu.parallel.dist_ba import (
        distributed_pose_graph_optimize,
        make_mesh,
        shard_edges,
    )
    from rgbdslam_tpu.solvers.pose_graph import PoseGraphEdges

    K, E = args.vertices, args.edges
    rng = np.random.default_rng(0)
    xi = rng.normal(scale=0.1, size=(K, 6)).astype(np.float32)
    Twc = np.asarray(se3.exp(jnp.asarray(xi)))
    a = rng.integers(1, K, size=E).astype(np.int32)
    b = np.maximum(a - rng.integers(1, 8, size=E), 0).astype(np.int32)
    Z = np.stack([np.linalg.inv(Twc[i]) @ Twc[j] for i, j in zip(a, b)]).astype(np.float32)
    edges = PoseGraphEdges(
        a=jnp.asarray(a), b=jnp.asarray(b), Z=jnp.asarray(Z),
        weight=jnp.full((E,), 100.0, jnp.float32),
    )
    fixed = jnp.zeros((K,), bool).at[0].set(True)

    results = {}
    t1 = None
    for n_dev in args.devices:
        if n_dev > jax.device_count():
            print(f"skip {n_dev} devices (only {jax.device_count()})",
                  file=sys.stderr)
            continue
        mesh = make_mesh(n_dev)
        ed = shard_edges(edges, mesh)
        # warmup/compile
        out = distributed_pose_graph_optimize(
            jnp.asarray(Twc), ed, fixed, mesh, args.iterations)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = distributed_pose_graph_optimize(
                jnp.asarray(Twc), ed, fixed, mesh, args.iterations)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        iters_per_s = args.iterations / dt
        if t1 is None:
            t1 = dt
        eff = t1 / (dt * n_dev)
        results[n_dev] = {"iters_per_s": round(iters_per_s, 2),
                          "scaling_eff": round(eff, 3)}
        print(f"devices={n_dev:2d}: {iters_per_s:8.2f} GN iters/s "
              f"(eff {eff:.2f})", file=sys.stderr)

    print(json.dumps({
        "metric": "dist_ba_iters_per_s",
        "vertices": K, "edges": E,
        "results": results,
    }))


if __name__ == "__main__":
    main()
