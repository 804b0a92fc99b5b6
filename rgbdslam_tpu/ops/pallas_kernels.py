"""Pallas TPU kernels for the matching hot loop.

The 2-NN 256-bit Hamming matcher is the per-frame inner loop of the whole
system (Features/Matcher.cpp:113's BFMatcher knnMatch). The XLA formulation
materializes the (N, M, 8) XOR tensor in HBM; this kernel keeps everything in
VMEM: each grid program owns a row tile of query descriptors, holds the full
train set (32 KB) in VMEM, computes the (BN, M) distance tile with
XOR+popcount on the VPU, and reduces per-row best/second-best (and the
column-best needed for mutual-nearest dedup) without ever writing the
distance matrix to HBM.

Falls back to interpret mode off-TPU (tests run it on CPU bit-exactly).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1 << 20


def _popcount_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Branch-free 32-bit popcount in uint32 arithmetic (Mosaic-safe)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _match_kernel(d1_ref, d2_ref, v1_ref, v2_ref,
                  bi_ref, bd_ref, sd_ref, cbd_ref, cbr_ref):
    """One row tile: distances to all M train descriptors + reductions.

    d1_ref: (BN, 8) u32; d2_ref: (M, 8) u32; v1: (BN, 1) i32; v2: (M, 1) i32.
    Per-row outputs (BN, 1): best idx / best dist / second dist.
    Per-tile column outputs (1, M): this tile's column-best dist + global row.
    """
    bn = d1_ref.shape[0]
    m = d2_ref.shape[0]
    row_id0 = pl.program_id(0) * bn

    d1 = d1_ref[...]
    d2 = d2_ref[...]

    # distance tile: sum over the 8 words, keeping (BN, M) 2-D shapes per word
    dist = jnp.zeros((bn, m), dtype=jnp.int32)
    for k in range(8):
        xw = d1[:, k][:, None] ^ d2[:, k][None, :]       # (BN, M) u32
        dist = dist + _popcount_u32(xw)

    valid1 = v1_ref[...][:, 0] != 0                      # (BN,)
    valid2 = v2_ref[...][:, 0] != 0                      # (M,)
    # Mosaic's argmin lowering supports only f32; Hamming distances (<=256)
    # and BIG (2^20) are exactly representable
    distf = jnp.where(
        valid1[:, None] & valid2[None, :], dist.astype(jnp.float32),
        jnp.float32(BIG),
    )

    best_d = jnp.min(distf, axis=1)                      # (BN,)
    best_i = jnp.argmin(distf, axis=1).astype(jnp.int32)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (bn, m), 1)
    masked = jnp.where(col_iota == best_i[:, None], jnp.float32(BIG), distf)
    second_d = jnp.min(masked, axis=1)

    bi_ref[...] = best_i[:, None]
    bd_ref[...] = best_d.astype(jnp.int32)[:, None]
    sd_ref[...] = second_d.astype(jnp.int32)[:, None]

    # full-array output blocks: each (sequentially executed) grid step writes
    # its own row — per-tile blocks of shape (1, M) violate the TPU tiling
    # rule (second-to-last dim must divide 8 or equal the array dim)
    i = pl.program_id(0)
    cbd_ref[i, :] = jnp.min(distf, axis=0).astype(jnp.int32)
    cbr_ref[i, :] = jnp.argmin(distf, axis=0).astype(jnp.int32) + row_id0


@functools.partial(jax.jit, static_argnums=(4, 5))
def hamming_match_2nn(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    block_rows: int = 256,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused 2-NN Hamming matching.

    Returns (best_idx [N], best_dist [N], second_dist [N], col_best_row [M])
    where col_best_row[j] is the query row whose distance to train j is
    minimal — the mutual-nearest dedup input. Distances of invalid pairs are
    BIG.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_orig = desc1.shape[0]
    m = desc2.shape[0]
    bn = min(block_rows, n_orig)
    # pad the query side to a whole number of row tiles (padding rows are
    # invalid and can never win a column-best: their distances are BIG)
    pad = (-n_orig) % bn
    if pad:
        desc1 = jnp.concatenate(
            [desc1, jnp.zeros((pad, desc1.shape[1]), desc1.dtype)]
        )
        valid1 = jnp.concatenate([valid1, jnp.zeros((pad,), bool)])
    n = n_orig + pad
    n_tiles = n // bn

    v1 = valid1.astype(jnp.int32).reshape(n, 1)
    v2 = valid2.astype(jnp.int32).reshape(m, 1)

    bi, bd, sd, cbd, cbr = pl.pallas_call(
        _match_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((bn, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, m), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, m), jnp.int32),
        ],
        interpret=interpret,
    )(desc1, desc2, v1, v2)

    # merge per-tile column bests (tiny: n_tiles x M)
    t_best = jnp.argmin(cbd, axis=0)                      # (M,)
    col_best_row = jnp.take_along_axis(cbr, t_best[None, :], axis=0)[0]
    return bi[:n_orig, 0], bd[:n_orig, 0], sd[:n_orig, 0], col_best_row
