"""Binary descriptors (BRIEF-256 / rotated ORB-style) + intensity-centroid
orientation, vectorized over a fixed keypoint budget.

The reference's live path uses OpenCV's (upright) BRIEF descriptor on SVO-FAST
keypoints (main.cpp:31, Features/Extractor.cpp:59); the alternative
ORBextractor implements rotated BRIEF with the learned 256-pair pattern and
IC-angle orientation (Features/ORBextractor.cpp:16-87). We implement both
behaviors behind a `use_orientation` flag with a deterministic Gaussian
sampling pattern (BRIEF-GII): pairs drawn N(0, (patch/5)^2), clipped to the
patch, fixed seed — internal consistency is what matters since the loop-closure
vocabulary is trained on our own descriptors, not DBoW3's.

Descriptors are packed 256 bits -> (N, 8) uint32 for XOR+popcount Hamming
matching on the VPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgbdslam_tpu.ops import image as image_ops

DESC_BITS = 256
DESC_WORDS = DESC_BITS // 32


@functools.lru_cache()
def brief_pattern(patch_size: int = 31, seed: int = 7) -> np.ndarray:
    """Deterministic BRIEF-GII pattern: (256, 2, 2) float32 offsets (a, b)."""
    rng = np.random.default_rng(seed)
    half = patch_size // 2
    sigma = patch_size / 5.0
    pts = rng.normal(scale=sigma, size=(DESC_BITS, 2, 2))
    return np.clip(pts, -half, half).astype(np.float32)


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) bool -> (N, 8) uint32, bit i of word w = bits[:, 32*w + i]."""
    n = bits.shape[0]
    b = bits.reshape(n, DESC_WORDS, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def ic_angles(img: jnp.ndarray, uv: jnp.ndarray, radius: int = 15) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint (ORB IC_Angle,
    Features/ORBextractor.cpp:16-41): angle of (m10, m01) moments over a
    circular patch of the given radius. uv: (N, 2) -> (N,) radians."""
    d = 2 * radius + 1
    ys, xs = np.meshgrid(
        np.arange(-radius, radius + 1), np.arange(-radius, radius + 1), indexing="ij"
    )
    circle = (xs * xs + ys * ys) <= radius * radius
    offs = np.stack([xs[circle], ys[circle]], axis=-1).astype(np.float32)  # (M, 2)
    offs_j = jnp.asarray(offs)

    def one(kp):
        coords = kp[None, :] + offs_j  # (M, 2)
        vals = image_ops.bilinear_sample(img, coords)
        m10 = jnp.sum(vals * offs_j[:, 0])
        m01 = jnp.sum(vals * offs_j[:, 1])
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(uv)


def brief_descriptors(
    img_blurred: jnp.ndarray,
    uv: jnp.ndarray,
    angles: jnp.ndarray | None = None,
    patch_size: int = 31,
) -> jnp.ndarray:
    """Compute packed 256-bit descriptors at level-0 coords on a pre-blurred
    image (the reference blurs before describing, Features/ORBextractor.cpp:746).

    uv: (N, 2); angles: optional (N,) for steered (rotated) BRIEF.
    Returns (N, 8) uint32.
    """
    pat = jnp.asarray(brief_pattern(patch_size))  # (256, 2, 2)
    a = pat[:, 0, :]  # (256, 2)
    b = pat[:, 1, :]

    if angles is not None:
        cos = jnp.cos(angles)
        sin = jnp.sin(angles)

        def rotate(offs, c, s):
            x, y = offs[:, 0], offs[:, 1]
            return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)

        def one(kp, c, s):
            pa = kp[None, :] + rotate(a, c, s)
            pb = kp[None, :] + rotate(b, c, s)
            ia = image_ops.bilinear_sample(img_blurred, pa)
            ib = image_ops.bilinear_sample(img_blurred, pb)
            return ia < ib

        bits = jax.vmap(one)(uv, cos, sin)
    else:

        def one_upright(kp):
            ia = image_ops.bilinear_sample(img_blurred, kp[None, :] + a)
            ib = image_ops.bilinear_sample(img_blurred, kp[None, :] + b)
            return ia < ib

        bits = jax.vmap(one_upright)(uv)

    return _pack_bits(bits)
