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


# ---------------------------------------------------------------------------
# Fused RANSAC Mahalanobis hypothesis scorer
# ---------------------------------------------------------------------------


def _mahal_kernel(rt_ref, planes_ref, out_ref, *, th: float):
    """Score one tile of BH hypotheses against all N correspondences.

    rt_ref: (BH, 12) f32 — [R.ravel(9) | t(3)] per hypothesis.
    planes_ref: (16, N) f32 — rows [p1.x p1.y p1.z | p2.x p2.y p2.z |
      s1.x s1.y s1.z | s2.x s2.y s2.z | valid | 0 0 0] (sensor-noise
      covariance diagonals s from the Khoshelham model).
    out_ref: (BH, 128) f32 — col 0 = inlier count, col 1 = Mahalanobis^2 sum
      over inliers (the rest is tile padding).

    The XLA plane formulation (solvers/ransac_se3.mahalanobis_sq) is exact
    but streams ~25 (H, N) f32 intermediates through HBM per call; here every
    (BH, N) temporary lives in VMEM/registers and only 2 scalars per
    hypothesis are written out.
    """
    rt = rt_ref[...]                      # (BH, 12)
    P = planes_ref[...]                   # (16, N)

    def row(i):
        return P[i:i + 1, :]              # (1, N)

    x1, y1, z1 = row(0), row(1), row(2)
    x2, y2, z2 = row(3), row(4), row(5)
    s1 = (row(6), row(7), row(8))
    s2 = (row(9), row(10), row(11))
    vld = row(12) != 0.0

    Rk = [rt[:, k:k + 1] for k in range(9)]      # each (BH, 1)
    tx, ty, tz = rt[:, 9:10], rt[:, 10:11], rt[:, 11:12]

    d1 = Rk[0] * x1 + Rk[1] * y1 + Rk[2] * z1 + tx - x2   # (BH, N)
    d2 = Rk[3] * x1 + Rk[4] * y1 + Rk[5] * z1 + ty - y2
    d3 = Rk[6] * x1 + Rk[7] * y1 + Rk[8] * z1 + tz - z2

    # C = R diag(s1) R^T + diag(s2): six unique entries as (BH, N) planes
    def centry(i, j, diag):
        c = (Rk[3 * i] * Rk[3 * j] * s1[0]
             + Rk[3 * i + 1] * Rk[3 * j + 1] * s1[1]
             + Rk[3 * i + 2] * Rk[3 * j + 2] * s1[2])
        if diag is not None:
            c = c + s2[diag]
        return c

    a = centry(0, 0, 0)
    b = centry(0, 1, None)
    c_ = centry(0, 2, None)
    d = centry(1, 1, 1)
    e = centry(1, 2, None)
    f = centry(2, 2, 2)

    # m2 = delta^T adj(C) delta / det(C)
    A11 = d * f - e * e
    A12 = c_ * e - b * f
    A13 = b * e - c_ * d
    A22 = a * f - c_ * c_
    A23 = b * c_ - a * e
    A33 = a * d - b * b
    det = a * A11 + b * A12 + c_ * A13
    quad = (A11 * d1 * d1 + A22 * d2 * d2 + A33 * d3 * d3
            + 2.0 * (A12 * d1 * d2 + A13 * d1 * d3 + A23 * d2 * d3))
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    m2 = jnp.maximum(quad * inv_det, 0.0)

    inl = (m2 <= th) & vld
    cnt = jnp.sum(inl.astype(jnp.float32), axis=1)            # (BH,)
    errsum = jnp.sum(jnp.where(inl, m2, 0.0), axis=1)

    cols = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[...] = jnp.where(
        cols == 0, cnt[:, None],
        jnp.where(cols == 1, errsum[:, None], 0.0),
    )


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def mahal_hypothesis_scores(
    T_h: jnp.ndarray,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    s1: jnp.ndarray,
    s2: jnp.ndarray,
    valid: jnp.ndarray,
    th: float,
    block_h: int = 32,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inlier count (H,) i32 and Mahalanobis^2 sum (H,) f32 per hypothesis.

    T_h (H, 4, 4); p1/p2 (N, 3); s1/s2 (N, 3) per-point sensor-covariance
    diagonals; th = max_mahalanobis^2. Bit-exact vs the XLA plane scorer
    (same arithmetic, same order) — see tests/test_pallas_ransac.py.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H = T_h.shape[0]
    N = p1.shape[0]
    bh = min(block_h, H)
    assert H % bh == 0, (H, bh)

    rt = jnp.concatenate(
        [T_h[:, :3, :3].reshape(H, 9), T_h[:, :3, 3]], axis=1
    ).astype(jnp.float32)                                     # (H, 12)
    planes = jnp.concatenate(
        [p1.T, p2.T, s1.T, s2.T,
         valid.astype(jnp.float32)[None, :],
         jnp.zeros((3, N), jnp.float32)],
        axis=0,
    ).astype(jnp.float32)                                     # (16, N)

    out = pl.pallas_call(
        functools.partial(_mahal_kernel, th=float(th)),
        grid=(H // bh,),
        in_specs=[
            pl.BlockSpec((bh, 12), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, 128), jnp.float32),
        interpret=interpret,
    )(rt, planes)
    return out[:, 0].astype(jnp.int32), out[:, 1]


# ---------------------------------------------------------------------------
# Fused GICP Gauss-Newton normal-equation builder
# ---------------------------------------------------------------------------


def _unpack_gicp_planes(P):
    """planes (24*8, N/8) -> (p1, p2, c1, c2, vld) plane accessors; plane i
    lives in rows 8i..8i+8 (each per-point plane reshaped (8, N/8) for full
    VPU sublane utilization)."""

    def row(i):
        return P[8 * i:8 * (i + 1), :]         # (8, N/8)

    p1 = (row(0), row(1), row(2))
    p2 = (row(3), row(4), row(5))
    C1 = {(0, 0): row(6), (0, 1): row(7), (0, 2): row(8),
          (1, 1): row(9), (1, 2): row(10), (2, 2): row(11)}
    C2 = {(0, 0): row(12), (0, 1): row(13), (0, 2): row(14),
          (1, 1): row(15), (1, 2): row(16), (2, 2): row(17)}
    vld = row(18) != 0.0

    def c1(i, j):
        return C1[(i, j)] if i <= j else C1[(j, i)]

    def c2(i, j):
        return C2[(i, j)] if i <= j else C2[(j, i)]

    return p1, p2, c1, c2, vld


def _gicp_iteration(Rm, tv, p1, p2, c1, c2, vld, max_dist: float):
    """One plane-to-plane GN normal-equation build, all VPU planes.

    Rm: 3x3 nested list of scalars; tv: 3-list of scalars.
    Returns (Hs: 21 upper-tri scalars, bs: 6 scalars, cost, count).
    """
    # q = R p1 + t; r = q - p2
    q = [Rm[i][0] * p1[0] + Rm[i][1] * p1[1] + Rm[i][2] * p1[2] + tv[i]
         for i in range(3)]
    r = [q[i] - p2[i] for i in range(3)]

    # S = R C1 R^T + C2 (6 unique planes)
    def s_entry(i, j):
        acc = None
        for k in range(3):
            for l in range(3):
                term = (Rm[i][k] * Rm[j][l]) * c1(k, l)
                acc = term if acc is None else acc + term
        return acc + c2(i, j)

    a = s_entry(0, 0)
    b_ = s_entry(0, 1)
    c_ = s_entry(0, 2)
    d_ = s_entry(1, 1)
    e_ = s_entry(1, 2)
    f_ = s_entry(2, 2)

    # W = S^-1 via adjugate/det (S symmetric positive definite)
    A11 = d_ * f_ - e_ * e_
    A12 = c_ * e_ - b_ * f_
    A13 = b_ * e_ - c_ * d_
    A22 = a * f_ - c_ * c_
    A23 = b_ * c_ - a * e_
    A33 = a * d_ - b_ * b_
    det = a * A11 + b_ * A12 + c_ * A13
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    W = {(0, 0): A11 * inv_det, (0, 1): A12 * inv_det, (0, 2): A13 * inv_det,
         (1, 1): A22 * inv_det, (1, 2): A23 * inv_det, (2, 2): A33 * inv_det}

    def w(i, j):
        return W[(i, j)] if i <= j else W[(j, i)]

    dist2 = r[0] * r[0] + r[1] * r[1] + r[2] * r[2]
    gate = (vld & (dist2 < max_dist * max_dist)).astype(jnp.float32)

    # J = [I3 | -hat(q)]; -hat(q) = [[0, qz, -qy], [-qz, 0, qx], [qy, -qx, 0]]
    zero = jnp.zeros_like(q[0])
    Jr = [[zero, q[2], -q[1]],
          [-q[2], zero, q[0]],
          [q[1], -q[0], zero]]

    def jcol(c):
        if c < 3:
            return [jnp.full_like(q[0], 1.0) if i == c else zero
                    for i in range(3)]
        return [Jr[i][c - 3] for i in range(3)]

    cols = [jcol(c) for c in range(6)]
    Wcols = [[w(i, 0) * col[0] + w(i, 1) * col[1] + w(i, 2) * col[2]
              for i in range(3)] for col in cols]

    Hs = []
    for i in range(6):
        for j in range(i, 6):
            hij = (cols[i][0] * Wcols[j][0] + cols[i][1] * Wcols[j][1]
                   + cols[i][2] * Wcols[j][2])
            Hs.append(jnp.sum(hij * gate))
    bs = []
    for i in range(6):
        bi = (Wcols[i][0] * r[0] + Wcols[i][1] * r[1] + Wcols[i][2] * r[2])
        bs.append(jnp.sum(bi * gate))
    wr = [w(i, 0) * r[0] + w(i, 1) * r[1] + w(i, 2) * r[2] for i in range(3)]
    cost = jnp.sum((r[0] * wr[0] + r[1] * wr[1] + r[2] * wr[2]) * gate)
    return Hs, bs, cost, jnp.sum(gate)


def _chol6_solve_neg(Hs, bs, damping: float):
    """x = -(H + damping I)^-1 b on scalars: unrolled 6x6 Cholesky +
    forward/back substitution (Hs = 21 upper-triangular entries)."""
    A = [[None] * 6 for _ in range(6)]
    k = 0
    for i in range(6):
        for j in range(i, 6):
            A[i][j] = Hs[k]
            A[j][i] = Hs[k]
            k += 1
        A[i][i] = A[i][i] + damping

    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[i][j]
            for m in range(j):
                s = s - L[i][m] * L[j][m]
            if i == j:
                L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    # forward: L y = -b
    y = [None] * 6
    for i in range(6):
        s = -bs[i]
        for m in range(i):
            s = s - L[i][m] * y[m]
        y[i] = s / L[i][i]
    # back: L^T x = y
    x = [None] * 6
    for i in range(5, -1, -1):
        s = y[i]
        for m in range(i + 1, 6):
            s = s - L[m][i] * x[m]
        x[i] = s / L[i][i]
    return x


def _se3_exp_compose(xi, Rm, tv):
    """(R', t') = exp(xi) (R, t) on scalars — xi = [rho, phi], the same
    [rho | phi] left-increment convention as geometry/se3.exp."""
    rho = xi[:3]
    phi = xi[3:]
    th2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
    th = jnp.sqrt(th2)
    small = th2 < 1e-12
    # series-safe coefficients
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / jnp.where(small, 1.0, th))
    B = jnp.where(small, 0.5 - th2 / 24.0,
                  (1.0 - jnp.cos(th)) / jnp.where(small, 1.0, th2))
    C = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (th - jnp.sin(th)) / jnp.where(small, 1.0, th2 * th))

    def hat_sq(i, j):
        # (hat(phi)^2)_ij = phi_i phi_j - delta_ij th2
        v = phi[i] * phi[j]
        return v - th2 if i == j else v

    hat = [[0.0, -phi[2], phi[1]],
           [phi[2], 0.0, -phi[0]],
           [-phi[1], phi[0], 0.0]]
    Re = [[(1.0 if i == j else 0.0) + A * hat[i][j] + B * hat_sq(i, j)
           for j in range(3)] for i in range(3)]
    V = [[(1.0 if i == j else 0.0) + B * hat[i][j] + C * hat_sq(i, j)
          for j in range(3)] for i in range(3)]
    te = [V[i][0] * rho[0] + V[i][1] * rho[1] + V[i][2] * rho[2]
          for i in range(3)]
    R_new = [[Re[i][0] * Rm[0][j] + Re[i][1] * Rm[1][j] + Re[i][2] * Rm[2][j]
              for j in range(3)] for i in range(3)]
    t_new = [Re[i][0] * tv[0] + Re[i][1] * tv[1] + Re[i][2] * tv[2] + te[i]
             for i in range(3)]
    return R_new, t_new


def _gicp_gn_kernel(rt_ref, planes_ref, out_ref, *, max_dist: float):
    """Single GN normal-equation build (see gicp_gn_normal_equations).

    out_ref: (32, 128) f32 — col 0 rows 0..20 = upper-triangular H, rows
    21..26 = b, row 27 = cost, row 28 = gated count.
    """
    rt = rt_ref[...]
    Rm = [[rt[0, 3 * i + j] for j in range(3)] for i in range(3)]
    tv = [rt[0, 9], rt[0, 10], rt[0, 11]]
    p1, p2, c1, c2, vld = _unpack_gicp_planes(planes_ref[...])
    Hs, bs, cost, cnt = _gicp_iteration(Rm, tv, p1, p2, c1, c2, vld, max_dist)
    vals = Hs + bs + [cost, cnt]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1) == 0
    out = jnp.zeros((32, 128), jnp.float32)
    for k, val in enumerate(vals):
        out = out + jnp.where((row_iota == k) & col0, val, 0.0)
    out_ref[...] = out


def _gicp_loop_kernel(rt_ref, planes_ref, out_ref, *, iters: int,
                      max_dist: float, damping: float):
    """The ENTIRE plane-to-plane GN refinement in one kernel launch: `iters`
    unrolled rounds of (normal-equation build -> scalar 6x6 Cholesky solve ->
    scalar SE(3) exp/compose). One pallas_call replaces iters kernel/op
    launches — at N~1k the per-iteration work is launch-bound, not
    compute-bound, so this is where the time actually goes.

    out_ref: (8, 128) f32 — col 0 rows 0..8 = R.ravel, 9..11 = t,
    12 = final cost, 13 = final gated count.
    """
    rt = rt_ref[...]
    Rm = [[rt[0, 3 * i + j] for j in range(3)] for i in range(3)]
    tv = [rt[0, 9], rt[0, 10], rt[0, 11]]
    p1, p2, c1, c2, vld = _unpack_gicp_planes(planes_ref[...])

    cost = jnp.float32(0.0)
    cnt = jnp.float32(0.0)
    for _ in range(iters):
        Hs, bs, cost, cnt = _gicp_iteration(Rm, tv, p1, p2, c1, c2, vld,
                                            max_dist)
        xi = _chol6_solve_neg(Hs, bs, damping)
        Rm, tv = _se3_exp_compose(xi, Rm, tv)

    vals = [Rm[i][j] for i in range(3) for j in range(3)] + tv + [cost, cnt]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.zeros((8, 128), jnp.float32)
    for k, val in enumerate(vals):
        out = out + jnp.where((row_iota == k % 8) & (col_iota == k // 8),
                              val, 0.0)
    out_ref[...] = out


_TRIU6 = [(i, j) for i in range(6) for j in range(i, 6)]


def _pack_gicp_inputs(T, p1, p2, C1, C2, valid):
    """rt (1, 16) + planes (24*8, N/8) for the GICP kernels."""
    N = p1.shape[0]
    assert N % 8 == 0, N
    rt = jnp.concatenate(
        [T[:3, :3].reshape(9), T[:3, 3], jnp.zeros((4,), T.dtype)]
    ).astype(jnp.float32)[None, :]                               # (1, 16)

    def sym6(C):
        return jnp.stack([C[:, 0, 0], C[:, 0, 1], C[:, 0, 2],
                          C[:, 1, 1], C[:, 1, 2], C[:, 2, 2]])    # (6, N)

    planes = jnp.concatenate(
        [p1.T, p2.T, sym6(C1), sym6(C2),
         valid.astype(jnp.float32)[None, :],
         jnp.zeros((5, N), jnp.float32)],
        axis=0,
    ).astype(jnp.float32)                                        # (24, N)
    # (24, N) -> (24*8, N/8): full sublane utilization in the kernel
    return rt, planes.reshape(24 * 8, N // 8)


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9))
def gicp_refine_kernel(
    T_init: jnp.ndarray,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    C1: jnp.ndarray,
    C2: jnp.ndarray,
    valid: jnp.ndarray,
    iters: int,
    max_dist: float,
    damping: float = 1e-6,
    interpret: bool | None = None,
):
    """Complete plane-to-plane GN refinement in ONE kernel launch.

    Returns (T (4,4), final cost (), final gated count ()). Matches the
    XLA fori_loop in solvers/icp.gicp_refine (same math per round:
    normal equations -> damped Cholesky -> left-multiplied SE(3) update).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rt, planes = _pack_gicp_inputs(T_init, p1, p2, C1, C2, valid)
    out = pl.pallas_call(
        functools.partial(_gicp_loop_kernel, iters=int(iters),
                          max_dist=float(max_dist), damping=float(damping)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(rt, planes)
    R = jnp.stack([out[(3 * i + j) % 8, (3 * i + j) // 8]
                   for i in range(3) for j in range(3)]).reshape(3, 3)
    t = jnp.stack([out[(9 + i) % 8, (9 + i) // 8] for i in range(3)])
    T = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(R).at[:3, 3].set(t)
    return T, out[12 % 8, 12 // 8], out[13 % 8, 13 // 8]


@functools.partial(jax.jit, static_argnums=(6, 7))
def gicp_gn_normal_equations(
    T: jnp.ndarray,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    C1: jnp.ndarray,
    C2: jnp.ndarray,
    valid: jnp.ndarray,
    max_dist: float,
    interpret: bool | None = None,
):
    """(H (6,6), b (6,), cost (), count ()) of the plane-to-plane GN step.

    T (4,4); p1/p2 (N,3); C1/C2 (N,3,3) symmetric surface covariances.
    Bit-parity-tested against the XLA einsum form (tests/test_pallas_ransac.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rt, planes = _pack_gicp_inputs(T, p1, p2, C1, C2, valid)
    out = pl.pallas_call(
        functools.partial(_gicp_gn_kernel, max_dist=float(max_dist)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        interpret=interpret,
    )(rt, planes)
    v = out[:, 0]
    H = jnp.zeros((6, 6), jnp.float32)
    for k, (i, j) in enumerate(_TRIU6):
        H = H.at[i, j].set(v[k])
        if i != j:
            H = H.at[j, i].set(v[k])
    b = v[21:27]
    return H, b, v[27], v[28]
