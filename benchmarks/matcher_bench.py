"""Hamming matcher micro-benchmark: XLA formulation vs Pallas kernel.

Usage:  python benchmarks/matcher_bench.py [--n 1024] [--reps 50]
Prints one JSON line with both timings (runs on whatever backend jax picks;
the Pallas kernel requires TPU — it falls back to interpret mode elsewhere,
which is not a performance measurement).
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
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from rgbdslam_tpu.frontend.matcher import match_descriptors

    n = args.n
    rng = np.random.default_rng(0)
    d1 = jnp.asarray(rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32))
    v = jnp.ones((n,), bool)

    on_tpu = jax.default_backend() == "tpu"
    results = {"backend": jax.default_backend(), "n": n}

    for name in (["xla", "pallas"] if on_tpu else ["xla"]):
        fn = jax.jit(
            lambda a, b: match_descriptors(a, v, b, v, 0.9, backend=name)
        )
        out = fn(d1, d2)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(d1, d2)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        results[f"{name}_ms"] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
