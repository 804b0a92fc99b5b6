"""Hamming distance matrix + 2-NN over packed 256-bit descriptors.

TPU-native replacement of cv::BFMatcher::knnMatch with NORM_HAMMING
(Features/Matcher.cpp:113): the N x M x 8-word XOR+popcount contraction is a
dense, perfectly regular VPU workload. The XLA path below lets the compiler
fuse xor/popcount/reduce; a hand-tiled Pallas kernel for the same contraction
lives in ops/pallas_kernels.py and is used on TPU backends for the hot loop.

Distances use int32; invalid descriptor slots are masked to BIG_DIST.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

BIG_DIST = 1 << 20


def hamming_distance_matrix(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid1: jnp.ndarray | None = None,
    valid2: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(N, W) uint32 x (M, W) uint32 -> (N, M) int32 Hamming distances.

    Invalid rows/cols are forced to BIG_DIST so downstream argmins never pick
    them.
    """
    x = desc1[:, None, :] ^ desc2[None, :, :]  # (N, M, W)
    d = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
    if valid1 is not None:
        d = jnp.where(valid1[:, None], d, BIG_DIST)
    if valid2 is not None:
        d = jnp.where(valid2[None, :], d, BIG_DIST)
    return d


def knn2(dist: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-row 2 nearest neighbors of a distance matrix.

    Returns (best_idx [N], best_dist [N], second_dist [N]).
    """
    best_idx = jnp.argmin(dist, axis=1).astype(jnp.int32)
    n = dist.shape[0]
    rows = jnp.arange(n)
    best_dist = dist[rows, best_idx]
    masked = dist.at[rows, best_idx].set(BIG_DIST)
    second_dist = jnp.min(masked, axis=1)
    return best_idx, best_dist, second_dist


def popcount_rows(desc: jnp.ndarray) -> jnp.ndarray:
    """Row-wise popcount (number of set bits per descriptor)."""
    return jnp.sum(jax.lax.population_count(desc), axis=-1).astype(jnp.int32)
