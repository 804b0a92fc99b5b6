"""Probe: where the batched full-SLAM wall clock actually goes.

The batched modes are no longer RPC-count-bound (B=32: 1.42 RPCs/frame);
this probe measures each remaining component on the chip so the fps
ceiling is an accounting identity, not a guess:

1. per-keyframe fused backend program (bank insert + store packing +
   batched proximity RANSAC verification + landmark-track extension + BoW
   quantize & scores, slam/system.py::_kf_core) — slope-timed over chained
   dispatches (cancels the RTT constant). Two pose layouts bracket the
   proximity work: 'spread' (0.3 m apart -> few candidates, typical) and
   'stacked' (same pose -> the candidate list saturates at
   max_proximity_candidates, worst case).
2. the B-frame VO scan (slam/tracking.py::_batch_step) — one clean
   dispatch + block_until_ready (the device-compute term per batch).
3. the tunnel's fetch channel: base RTT (small fetch) + asymptotic
   bandwidth (16 MB fetch) — what the per-batch stacked keyframe-blob
   fetch (~90 KB/KF) pays.

Measured (v5 lite, 2026-08-20): per-KF 0.17-0.24 ms, VO 2.9 ms/frame at
B=32, RTT ~26 ms, bandwidth ~28 MB/s — i.e. at B=32 on the 128-frame tour
(84 KFs) the wall is ~0.37 s VO + ~0.02 s KF programs + ~0.4 s blob
transfer + ~0.3 s fetch RTTs + loop solve + host numpy: the tunnel's
bandwidth/RTT and host bookkeeping are the remaining levers, not device
compute.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_kfs(system_factory, layout: str, n1: int = 4, n2: int = 24) -> dict:
    """Slope-timed per-KF cost of the fused backend program.

    Measurement caveat (ADVICE r3): the timed loop runs `_kf_dispatch`, so
    the slope includes the per-KF HOST work inside it (center argsort,
    has_edge scans, meta packing) and the dispatch-enqueue overhead — it is
    an UPPER BOUND on a host+device pipeline step, not pure device compute.
    The device-only figure would need pre-built metas + direct _kf_fused
    calls; the pipeline bound is what the full-SLAM wall actually pays, so
    it is the number the BASELINE time-budget table wants."""
    import jax

    def run(n: int) -> float:
        system = system_factory()
        f = system._probe_feats
        t0 = time.perf_counter()
        for k in range(n):
            if layout == "spread":
                Tcw = np.eye(4, dtype=np.float32)
                Tcw[0, 3] = 0.3 * k
            else:
                Tcw = np.eye(4, dtype=np.float32)
            h = system._kf_dispatch(k, float(k), f, Tcw)
        jax.block_until_ready(h["blob"])
        return time.perf_counter() - t0

    run(2)                       # compile + warm
    best = {}
    for n in (n1, n2):
        best[n] = min(run(n) for _ in range(3))
    slope_ms = (best[n2] - best[n1]) / (n2 - n1) * 1e3
    return {"layout": layout, "per_kf_ms": round(slope_ms, 3),
            "wall_n1_s": round(best[n1], 3), "wall_n2_s": round(best[n2], 3)}


def time_vo_batch(tracker, feats, gs, dsb) -> dict:
    """One clean B-frame VO scan dispatch + block (device-compute term)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    carry = (feats, jnp.eye(4, dtype=jnp.float32), dsb[0],
             jnp.float32(20.0))
    key = jax.random.PRNGKey(0)
    _, _, _, packed = tracker._batch_step(*carry, gs, dsb, key)
    np.asarray(packed)                    # compile + drain
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, _, _, packed = tracker._batch_step(*carry, gs, dsb, key)
        jax.block_until_ready(packed)
        best = min(best, time.perf_counter() - t0)
    B = int(gs.shape[0])
    return {"B": B, "batch_ms": round(best * 1e3, 1),
            "per_frame_ms": round(best / B * 1e3, 2)}


def time_tunnel() -> dict:
    """Base RTT (small fetch) + asymptotic fetch bandwidth (16 MB)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    add = jax.jit(lambda x, c: x + c)
    base = jnp.arange(int(16e6 / 4), dtype=jnp.float32)
    jax.block_until_ready(base)

    def fetch_ms(n, reps=4):
        best = float("inf")
        for i in range(reps):
            y = add(base[:n], float(i))   # fresh buffer: np.asarray of the
            jax.block_until_ready(y)      # same buffer hits the host cache
            t0 = time.perf_counter()
            np.asarray(y)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3
    rtt = fetch_ms(64)
    big = fetch_ms(int(16e6 / 4))
    bw = 16.0 / max(big - rtt, 1e-3) * 1e3
    return {"rtt_ms": round(rtt, 1), "bandwidth_mb_s": round(bw, 1)}


def main():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import jax.numpy as jnp

    from rgbdslam_tpu.config import SlamConfig
    from rgbdslam_tpu.frontend.frame import build_frame_features
    from rgbdslam_tpu.geometry.camera import SYNTHETIC
    from rgbdslam_tpu.io.synthetic import SyntheticDataset
    from rgbdslam_tpu.loop.vocabulary import shipped_vocabulary
    from rgbdslam_tpu.slam.system import SlamSystem

    cam = SYNTHETIC
    cfg = SlamConfig()
    ds = SyntheticDataset(n_frames=1, cam=cam, trajectory="tour")
    _, gray, depth = ds.grab(0)
    feats = build_frame_features(cam, gray, depth, cfg.extractor)
    jax.block_until_ready(feats.desc)
    voc = shipped_vocabulary("svo_fast")

    def factory():
        s = SlamSystem(cam, cfg, seed=0)
        if voc:
            s.load_vocabulary(voc)
        s._probe_feats = feats
        return s

    out = {"device": str(jax.devices()[0]),
           "C_max_proximity": cfg.pose_graph.max_proximity_candidates}
    for layout in ("spread", "stacked"):
        r = time_kfs(factory, layout)
        out[layout] = r
        print(f"{layout}: {r['per_kf_ms']} ms/KF "
              f"(wall {r['wall_n1_s']}s -> {r['wall_n2_s']}s)",
              file=sys.stderr)

    B = 32
    dsb_frames = SyntheticDataset(n_frames=B, cam=cam, trajectory="tour")
    fs = [dsb_frames.grab(i)[1:] for i in range(B)]
    gs = jnp.stack([f[0] for f in fs])
    dsb = jnp.stack([f[1] for f in fs])
    np.asarray(dsb[0])
    vo = time_vo_batch(factory().tracker, feats, gs, dsb)
    out["vo_batch"] = vo
    print(f"VO scan B={vo['B']}: {vo['batch_ms']} ms/batch = "
          f"{vo['per_frame_ms']} ms/frame", file=sys.stderr)

    tun = time_tunnel()
    out["tunnel"] = tun
    print(f"tunnel: RTT {tun['rtt_ms']} ms, fetch bandwidth "
          f"{tun['bandwidth_mb_s']} MB/s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
