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
NEG_INF = float("-inf")


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


# ---------------------------------------------------------------------------
# Fused detector kernel: FAST segment test + Shi-Tomasi + 3x3 NMS in one pass
# ---------------------------------------------------------------------------
#
# The XLA formulation (ops/fast.py) materializes the (16, H, W) ring stack and
# the arc-window tensors in HBM; at 640x480 that is the dominant cost of the
# frame feature build. This kernel holds the whole pyramid level in VMEM and
# emits only the final masked score map:
#
#   out[y, x] = shi_tomasi(y, x)   if FAST-corner(y, x) and 3x3-NMS-winner
#             = -inf               otherwise
#
# Semantics are bit-compatible with the XLA path (ops/fast.py):
#   - FAST ring reads outside the image differ (zero fill vs roll wraparound)
#     only inside the 3-px border that both paths mask out;
#   - Shi-Tomasi gradients and box sums use zero padding, matching
#     image_ops.sobel_gradients / box_filter_sum (reduce_window "SAME");
#   - the contiguous-arc test packs the 16 brighter/darker flags into one
#     int32 lane-plane and tests all 16 wrap-around windows with shift+compare
#     (16 passes) instead of 16 x arc boolean ANDs (160 passes).


def _shift2d(a: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """b[y, x] = a[y + dy, x + dx], `fill` outside. Static concat/slice only
    (Mosaic-friendly; no dynamic shapes)."""
    h, w = a.shape
    if dy > 0:
        a = jnp.concatenate([a[dy:, :], jnp.full((dy, w), fill, a.dtype)], 0)
    elif dy < 0:
        a = jnp.concatenate([jnp.full((-dy, w), fill, a.dtype), a[:dy, :]], 0)
    if dx > 0:
        a = jnp.concatenate([a[:, dx:], jnp.full((h, dx), fill, a.dtype)], 1)
    elif dx < 0:
        a = jnp.concatenate([jnp.full((h, -dx), fill, a.dtype), a[:, :dx]], 1)
    return a


def _detect_core(img, thr, row0, h_total, *, ring, arc, st_radius,
                 use_fast_gate):
    """Masked score on an image slab whose row 0 is global row `row0`.

    Rows outside [0, h_total) must already be zeroed by the caller; all
    row-dependent masks (gradient validity, FAST 3-px interior) are evaluated
    in global coordinates so tiled and whole-image invocations agree.
    """
    h, w = img.shape

    # --- Shi-Tomasi min-eigenvalue score (zero-padded, SVO normalization) ---
    right = _shift2d(img, 0, 1, 0.0)
    left = _shift2d(img, 0, -1, 0.0)
    down = _shift2d(img, 1, 0, 0.0)
    up = _shift2d(img, -1, 0, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + row0
    in_x = (col >= 1) & (col < w - 1)
    in_y = (row >= 1) & (row < h_total - 1)
    dx = jnp.where(in_x, right - left, 0.0)
    dy = jnp.where(in_y, down - up, 0.0)

    def box_sum(a):
        acc_h = a
        for s in range(1, st_radius + 1):
            acc_h = acc_h + _shift2d(a, 0, s, 0.0) + _shift2d(a, 0, -s, 0.0)
        acc = acc_h
        for s in range(1, st_radius + 1):
            acc = acc + _shift2d(acc_h, s, 0, 0.0) + _shift2d(acc_h, -s, 0, 0.0)
        return acc

    area = float((2 * st_radius + 1) ** 2)
    inv = 1.0 / (2.0 * area)
    dxx = box_sum(dx * dx) * inv
    dyy = box_sum(dy * dy) * inv
    dxy = box_sum(dx * dy) * inv
    tr = dxx + dyy
    det_term = jnp.sqrt(jnp.maximum((dxx - dyy) ** 2 + 4.0 * dxy * dxy, 0.0))
    score = 0.5 * (tr - det_term)

    # --- FAST-`arc` segment test, bit-packed ------------------------------
    if use_fast_gate:
        hi = img + thr
        lo = img - thr
        bmask = jnp.zeros((h, w), jnp.int32)
        dmask = jnp.zeros((h, w), jnp.int32)
        for k, (rdx, rdy) in enumerate(ring):
            # ring[k][y, x] = img[y + rdy, x + rdx]; zero fill only affects
            # the masked 3-px border
            rk = _shift2d(img, rdy, rdx, 0.0)
            bit = jnp.int32(1 << k)
            bmask = bmask | jnp.where(rk > hi, bit, 0)
            dmask = dmask | jnp.where(rk < lo, bit, 0)
        window = jnp.int32((1 << arc) - 1)
        bext = bmask | (bmask << 16)  # wrap-around: duplicate the 16 bits
        dext = dmask | (dmask << 16)
        corner = jnp.zeros((h, w), bool)
        for s in range(16):
            corner = corner | (((bext >> s) & window) == window)
            corner = corner | (((dext >> s) & window) == window)
        interior = ((row >= 3) & (row < h_total - 3)
                    & (col >= 3) & (col < w - 3))
        corner = corner & interior
    else:
        corner = jnp.ones((h, w), bool)  # GFTT: rank every pixel

    # --- 3x3 NMS over corner pixels (self included, >= as in nms3x3) ------
    corner_score = jnp.where(corner, score, NEG_INF)
    nbmax = corner_score
    for ndy in (-1, 0, 1):
        for ndx in (-1, 0, 1):
            if ndy == 0 and ndx == 0:
                continue
            nbmax = jnp.maximum(nbmax,
                                _shift2d(corner_score, ndy, ndx, NEG_INF))
    keep = corner & (corner_score >= nbmax)
    return jnp.where(keep, score, NEG_INF), score


def _detect_kernel(img_ref, thr_ref, out_ref, raw_ref, *, ring, arc,
                   st_radius, use_fast_gate):
    """Whole-level kernel (small pyramid levels: everything fits VMEM)."""
    img = img_ref[...]
    masked, raw = _detect_core(
        img, thr_ref[0, 0], 0, img.shape[0],
        ring=ring, arc=arc, st_radius=st_radius, use_fast_gate=use_fast_gate,
    )
    out_ref[...] = masked
    raw_ref[...] = raw


# halo: NMS (1) needs corner_score at +-1, which needs Shi-Tomasi at +-1
# (box radius 4 + gradient 1 -> +-5) and the FAST ring at +-1 (+-4): 6 rows.
_DETECT_HALO = 6


def _detect_kernel_tiled(top_ref, mid_ref, bot_ref, thr_ref, out_ref,
                         raw_ref, *, ring, arc, st_radius, use_fast_gate,
                         h_total):
    """Row-tiled kernel for big levels: the image is passed three times with
    shifted index maps (previous / current / next row block); the kernel
    assembles a (BR + 2*halo, W) slab, computes, and writes the center rows.
    VMEM footprint scales with the block, not the image (the whole-image
    kernel runs out of scoped VMEM at 640x480)."""
    i = pl.program_id(0)
    br, w = mid_ref.shape
    H = _DETECT_HALO
    slab = jnp.concatenate(
        [top_ref[br - H :, :], mid_ref[...], bot_ref[:H, :]], axis=0
    )
    row0 = i * br - H
    # zero rows outside the true image (block indices clamp at the ends, so
    # the top/bottom programs see duplicated blocks there)
    grow = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 0) + row0
    slab = jnp.where((grow >= 0) & (grow < h_total), slab, 0.0)
    masked, raw = _detect_core(
        slab, thr_ref[0, 0], row0, h_total,
        ring=ring, arc=arc, st_radius=st_radius, use_fast_gate=use_fast_gate,
    )
    out_ref[...] = masked[H : H + br, :]
    raw_ref[...] = raw[H : H + br, :]


# levels at or below this pixel count run as one whole-image program
# (~30 live slab-sized f32 intermediates must fit in 16 MB of VMEM)
_DETECT_WHOLE_IMAGE_MAX_PIX = 128 * 1024
_DETECT_BLOCK_ROWS = 64


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def detect_score_map(
    img: jnp.ndarray,
    fast_threshold,
    arc: int = 10,
    st_radius: int = 4,
    use_fast_gate: bool = True,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused FAST + Shi-Tomasi + NMS masked score map for one pyramid level.

    Replaces the fast_corner_mask/shi_tomasi_map/nms3x3 composition of
    ops/fast.py (reference semantics: Features/SVOextractor.cpp:79-133).
    Returns (masked, raw): masked (H, W) f32 is the Shi-Tomasi score where
    the pixel is a FAST corner that wins its 3x3 neighborhood, -inf
    elsewhere; raw is the dense Shi-Tomasi map (the subpixel-refinement
    surface). Border handling matches the XLA path everywhere outside the
    always-masked 3-px frame.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from rgbdslam_tpu.ops.fast import FAST_RING

    ring = tuple((int(dx), int(dy)) for dx, dy in FAST_RING)
    thr = jnp.asarray(fast_threshold, jnp.float32).reshape(1, 1)
    h, w = img.shape
    img = img.astype(jnp.float32)

    if h * w <= _DETECT_WHOLE_IMAGE_MAX_PIX:
        kernel = functools.partial(
            _detect_kernel, ring=ring, arc=arc, st_radius=st_radius,
            use_fast_gate=use_fast_gate,
        )
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            ],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct(img.shape, jnp.float32),
                       jax.ShapeDtypeStruct(img.shape, jnp.float32)],
            interpret=interpret,
        )(img, thr)

    br = _DETECT_BLOCK_ROWS
    pad = (-h) % br
    if pad:
        img = jnp.concatenate([img, jnp.zeros((pad, w), jnp.float32)], axis=0)
    hp = h + pad
    n = hp // br
    kernel = functools.partial(
        _detect_kernel_tiled, ring=ring, arc=arc, st_radius=st_radius,
        use_fast_gate=use_fast_gate, h_total=h,
    )
    img_spec_prev = pl.BlockSpec(
        (br, w), lambda i: (jnp.maximum(i - 1, 0), 0),
        memory_space=pltpu.VMEM)
    img_spec_mid = pl.BlockSpec((br, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    img_spec_next = pl.BlockSpec(
        (br, w), lambda i: (jnp.minimum(i + 1, n - 1), 0),
        memory_space=pltpu.VMEM)
    out, raw = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[img_spec_prev, img_spec_mid, img_spec_next,
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((br, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((br, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((hp, w), jnp.float32),
                   jax.ShapeDtypeStruct((hp, w), jnp.float32)],
        interpret=interpret,
    )(img, img, img, thr)
    return out[:h], raw[:h]
