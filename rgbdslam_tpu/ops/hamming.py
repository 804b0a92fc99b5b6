"""Hamming distance matrix + 2-NN over packed 256-bit descriptors.

TPU-native replacement of cv::BFMatcher::knnMatch with NORM_HAMMING
(Features/Matcher.cpp:113). Two bit-exact formulations of the N x M
contraction:

- ``popcount``: XOR + population count over the packed words — a regular
  VPU workload, the natural form on CPU.
- ``mxu``: the matmul identity  d(i,j) = pop(a_i) + pop(b_j) - 2 * common
  where ``common = bits(a) @ bits(b)^T`` is one (N, 32W) x (32W, M) int8
  matmul. On TPU this rides the MXU systolic array and XLA fuses the
  unpack + epilogue around it; measured ~20x faster than both the popcount
  form and the hand-tiled Pallas kernel at 1024x1024x256
  (benchmarks/mxu_match_probe.py — the Pallas kernel in
  ops/pallas_kernels.py is kept as a comparison point and CPU-interpret
  oracle).

Distances use int32; invalid descriptor slots are masked to BIG_DIST.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

BIG_DIST = 1 << 20


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """(N, W) packed uint words -> (N, W * bits_per_word) int8 of 0/1.

    Bit order (LSB-first within each word) is irrelevant to the distance —
    both operands unpack identically.
    """
    n, w = desc.shape
    nbits = desc.dtype.itemsize * 8
    shifts = jnp.arange(nbits, dtype=desc.dtype)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & desc.dtype.type(1)
    return bits.reshape(n, w * nbits).astype(jnp.int8)


def hamming_distance_matrix(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid1: jnp.ndarray | None = None,
    valid2: jnp.ndarray | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """(N, W) uint32 x (M, W) uint32 -> (N, M) int32 Hamming distances.

    impl: 'auto' (MXU matmul form on TPU, popcount elsewhere), 'mxu', or
    'popcount'. Both forms are bit-exact. Invalid rows/cols are forced to
    BIG_DIST so downstream argmins never pick them.
    """
    if impl == "auto":
        impl = "mxu" if jax.default_backend() == "tpu" else "popcount"
    if impl == "mxu":
        common = jax.lax.dot_general(
            unpack_bits(desc1), unpack_bits(desc2),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        d = popcount_rows(desc1)[:, None] + popcount_rows(desc2)[None, :]
        d = d - 2 * common
    else:
        x = desc1[:, None, :] ^ desc2[None, :, :]  # (N, M, W)
        d = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
    if valid1 is not None:
        d = jnp.where(valid1[:, None], d, BIG_DIST)
    if valid2 is not None:
        d = jnp.where(valid2[None, :], d, BIG_DIST)
    return d


def knn2(dist: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-row 2 nearest neighbors of a distance matrix.

    Returns (best_idx [N], best_dist [N], second_dist [N]). The runner-up is
    found by masking the winner's column with an iota compare — scatter/gather
    epilogues (`at[].set`, fancy indexing) defeat XLA's fusion on TPU and are
    ~100x slower than this form.
    """
    best_idx = jnp.argmin(dist, axis=1).astype(jnp.int32)
    best_dist = jnp.min(dist, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    masked = jnp.where(col == best_idx[:, None], BIG_DIST, dist)
    second_dist = jnp.min(masked, axis=1)
    return best_idx, best_dist, second_dist


def popcount_rows(desc: jnp.ndarray) -> jnp.ndarray:
    """Row-wise popcount (number of set bits per descriptor)."""
    return jnp.sum(jax.lax.population_count(desc), axis=-1).astype(jnp.int32)
