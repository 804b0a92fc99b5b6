"""Fused Pallas detector kernel vs the XLA composition (oracle).

The fused kernel (ops/pallas_kernels.detect_score_map) must reproduce the
FAST + Shi-Tomasi + 3x3-NMS semantics of the XLA path in ops/fast.py
(reference semantics: Features/SVOextractor.cpp:79-133). Runs in interpret
mode on CPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbdslam_tpu.ops import fast as fast_ops


def _random_image(shape, seed=0):
    rng = np.random.default_rng(seed)
    # integer-valued f32: box sums are exact in both summation orders
    return jnp.asarray(rng.integers(0, 256, shape).astype(np.float32))


@pytest.mark.parametrize("shape", [(480, 640), (240, 320), (60, 80), (30, 40)])
def test_fused_detect_matches_xla(shape):
    img = _random_image(shape, seed=hash(shape) % 1000)
    a, ra = fast_ops.masked_score_map(img, 20.0, use_pallas=False)
    b, rb = fast_ops.masked_score_map(img, 20.0, use_pallas=True)
    a, b = np.asarray(a), np.asarray(b)
    np.testing.assert_allclose(np.asarray(ra), np.asarray(rb),
                               rtol=1e-5, atol=1e-3)
    ka, kb = np.isfinite(a), np.isfinite(b)
    # identical keep decisions (corner + NMS winners)
    np.testing.assert_array_equal(ka, kb)
    assert ka.sum() > 0
    # scores equal up to summation-order rounding
    np.testing.assert_allclose(a[ka], b[ka], rtol=1e-5, atol=1e-3)


def test_fused_detect_gftt_mode():
    img = _random_image((120, 160), seed=7)
    a = np.asarray(fast_ops.masked_score_map(img, 20.0, use_fast_gate=False,
                                             use_pallas=False)[0])
    b = np.asarray(fast_ops.masked_score_map(img, 20.0, use_fast_gate=False,
                                             use_pallas=True)[0])
    ka, kb = np.isfinite(a), np.isfinite(b)
    np.testing.assert_array_equal(ka, kb)
    np.testing.assert_allclose(a[ka], b[ka], rtol=1e-5, atol=1e-3)


def test_fused_detect_threshold_is_traced():
    """Threshold enters via SMEM: different thresholds, same compiled kernel,
    different corner counts (adaptive-mode requirement)."""
    img = _random_image((120, 160), seed=3)
    lo = np.isfinite(np.asarray(fast_ops.masked_score_map(img, 10.0)[0])).sum()
    hi = np.isfinite(np.asarray(fast_ops.masked_score_map(img, 60.0)[0])).sum()
    assert lo > hi > 0


def test_detect_keypoints_pallas_end_to_end():
    """detect_keypoints produces the same keypoint set through both paths
    (integer detections; subpixel offsets differ only by float rounding)."""
    img = _random_image((240, 320), seed=11)
    pyr = [img, jnp.asarray(np.asarray(img)[::2, ::2])]
    kw = dict(num_features=256, cell_size=10, fast_threshold=20.0,
              min_response=20.0, min_border=8, subpixel=False)
    kp_a = fast_ops.detect_keypoints(pyr, use_pallas=False, **kw)
    kp_b = fast_ops.detect_keypoints(pyr, use_pallas=True, **kw)
    assert bool(jnp.array_equal(kp_a.valid, kp_b.valid))
    a_uv = np.asarray(kp_a.uv)[np.asarray(kp_a.valid)]
    b_uv = np.asarray(kp_b.uv)[np.asarray(kp_b.valid)]
    # same cells win; allow reordering within equal scores
    assert {tuple(r) for r in a_uv} == {tuple(r) for r in b_uv}


def test_detect_keypoints_subpixel():
    """Subpixel refinement moves winners by at most +-0.5 px per axis (scaled
    by the pyramid level) and recovers a synthetic corner's true offset."""
    img = _random_image((240, 320), seed=13)
    pyr = [img]
    kw = dict(num_features=256, cell_size=10, fast_threshold=20.0,
              min_response=20.0, min_border=8)
    kp_i = fast_ops.detect_keypoints(pyr, subpixel=False, **kw)
    kp_s = fast_ops.detect_keypoints(pyr, subpixel=True, **kw)
    v = np.asarray(kp_i.valid)
    d = np.abs(np.asarray(kp_s.uv) - np.asarray(kp_i.uv))[v]
    assert d.max() <= 0.5 + 1e-5
    assert d.max() > 0.0   # something actually moved
