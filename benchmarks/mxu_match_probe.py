"""Probe: MXU (matmul) Hamming 2-NN vs the Pallas VPU kernel, on-chip.

Hamming distance over packed bits has a matmul form:
    d(i, j) = pop(a_i) + pop(b_j) - 2 * <bits(a_i), bits(b_j)>
so the N x M x 256-bit contraction becomes one (N, 256) x (256, M) int8
matmul on the MXU plus O(N*M) VPU epilogue (the 2-NN reductions).

Timing: R chained calls with a data dependency inside ONE jitted program,
so tunnel latency is excluded (same method as bench.py
measure_kernel_utilization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import rgbdslam_tpu  # noqa: F401  (precision config)
    from rgbdslam_tpu.ops import hamming
    from rgbdslam_tpu.ops.pallas_kernels import hamming_match_2nn

    N = M = 1024
    rng = np.random.default_rng(0)
    d1 = jnp.asarray(rng.integers(0, 2**32, (N, 8)).astype(np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2**32, (M, 8)).astype(np.uint32))
    v = jnp.ones((N,), bool)
    R = 64

    def unpack_bits(desc, dtype):
        n, w = desc.shape
        shifts = jnp.arange(32, dtype=jnp.uint32)
        bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
        return bits.reshape(n, w * 32).astype(dtype)

    def match_mxu(a, b, dtype):
        b1 = unpack_bits(a, dtype)
        b2 = unpack_bits(b, dtype)
        common = jax.lax.dot_general(
            b1, b2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32 if dtype == jnp.int8 else jnp.float32,
        )
        common = common.astype(jnp.int32)
        p1 = hamming.popcount_rows(a)
        p2 = hamming.popcount_rows(b)
        d = p1[:, None] + p2[None, :] - 2 * common
        d = jnp.where(v[:, None] & v[None, :], d, hamming.BIG_DIST)
        bi, bd, sd = hamming.knn2(d)
        cbr = jnp.argmin(d, axis=0).astype(jnp.int32)
        return bi, bd, sd, cbr

    results = {"backend": jax.default_backend(), "n": N, "reps": R}

    def time_loop(name, fn):
        @jax.jit
        def loop(d1c):
            def body(_, d):
                bi, bd, sd, cbr = fn(d, d2)
                return d ^ (bd.astype(jnp.uint32) % 2)[:, None]
            return jax.lax.fori_loop(0, R, body, d1c)

        jax.block_until_ready(loop(d1))
        t0 = time.perf_counter()
        jax.block_until_ready(loop(d1))
        ms = (time.perf_counter() - t0) / R * 1e3
        results[f"{name}_ms"] = round(ms, 4)
        print(f"{name}: {ms:.4f} ms", file=sys.stderr)

    # correctness cross-check first (one call each, compare). The Pallas
    # kernel's on-TPU f32 argmin breaks exact-distance ties differently from
    # jnp.argmin, so indices are compared through the distance they select.
    ref = [np.asarray(x) for x in match_mxu(d1, d2, jnp.int8)]
    alt = [np.asarray(x) for x in match_mxu(d1, d2, jnp.bfloat16)]
    pal = [np.asarray(x) for x in hamming_match_2nn(d1, d2, v, v)]
    for k, (r, a) in enumerate(zip(ref, alt)):
        assert np.array_equal(r, a), f"int8 vs bf16 mismatch at output {k}"
    dm = np.asarray(hamming.hamming_distance_matrix(d1, d2, v, v))
    rows = np.arange(N)
    assert np.array_equal(ref[1], pal[1]), "best_dist mismatch"
    assert np.array_equal(ref[2], pal[2]), "second_dist mismatch"
    assert np.array_equal(dm[rows, ref[0]], dm[rows, pal[0]]), "best idx dist"
    print("distances bit-exact; idx ties allowed", file=sys.stderr)

    time_loop("pallas", lambda a, b: hamming_match_2nn(a, b, v, v))
    time_loop("mxu_int8", lambda a, b: match_mxu(a, b, jnp.int8))
    time_loop("mxu_bf16", lambda a, b: match_mxu(a, b, jnp.bfloat16))
    # second pass to expose tunnel variance
    time_loop("pallas2", lambda a, b: hamming_match_2nn(a, b, v, v))
    time_loop("mxu_int8_2", lambda a, b: match_mxu(a, b, jnp.int8))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
