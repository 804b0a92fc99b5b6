"""Pallas Mahalanobis hypothesis scorer: bit-parity with the XLA plane form
(interpret mode on CPU, the same kernel runs compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import rgbdslam_tpu  # noqa: F401
from rgbdslam_tpu.config import RansacConfig
from rgbdslam_tpu.ops.pallas_kernels import mahal_hypothesis_scores
from rgbdslam_tpu.solvers.ransac_se3 import _score, _sigma_diag
from rgbdslam_tpu.geometry import se3


def _random_problem(rng, H=64, N=256):
    xi = rng.normal(scale=0.1, size=(H, 6)).astype(np.float32)
    T_h = np.asarray(se3.exp(jnp.asarray(xi)))
    p1 = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    p1[:, 2] = rng.uniform(0.5, 4.0, N)
    T_true = np.asarray(se3.exp(jnp.asarray(
        rng.normal(scale=0.05, size=6).astype(np.float32))))
    p2 = (p1 @ T_true[:3, :3].T + T_true[:3, 3]
          + rng.normal(scale=0.005, size=(N, 3))).astype(np.float32)
    valid = rng.uniform(size=N) > 0.2
    return jnp.asarray(T_h), jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(valid)


def test_mahal_kernel_matches_xla_scorer():
    rng = np.random.default_rng(0)
    cfg = RansacConfig()
    T_h, p1, p2, valid = _random_problem(rng)
    s1 = _sigma_diag(p1[:, 2], cfg)
    s2 = _sigma_diag(p2[:, 2], cfg)
    th = cfg.max_mahalanobis * cfg.max_mahalanobis

    cnt_k, err_k = mahal_hypothesis_scores(
        T_h, p1, p2, s1, s2, valid, th, interpret=True)

    _inl, cnt_x, rmse_x = _score(T_h, p1, p2, valid, cfg)
    np.testing.assert_array_equal(np.asarray(cnt_k), np.asarray(cnt_x))
    rmse_k = np.where(np.asarray(cnt_k) >= 3,
                      np.sqrt(np.asarray(err_k) / np.maximum(np.asarray(cnt_k), 1)),
                      1e9)
    np.testing.assert_allclose(rmse_k, np.asarray(rmse_x), rtol=1e-5)


def test_mahal_kernel_handles_all_invalid():
    rng = np.random.default_rng(1)
    cfg = RansacConfig()
    T_h, p1, p2, _ = _random_problem(rng, H=32, N=128)
    valid = jnp.zeros((128,), bool)
    s1 = _sigma_diag(p1[:, 2], cfg)
    s2 = _sigma_diag(p2[:, 2], cfg)
    cnt_k, err_k = mahal_hypothesis_scores(
        T_h, p1, p2, s1, s2, valid, 9.0, interpret=True)
    assert int(jnp.sum(cnt_k)) == 0
    assert float(jnp.sum(err_k)) == 0.0


def test_gicp_gn_kernel_matches_xla():
    """The fused GN builder must reproduce the XLA einsum chain's H, b,
    cost, and gate count exactly (same arithmetic, one VMEM pass)."""
    from rgbdslam_tpu.ops.pallas_kernels import gicp_gn_normal_equations
    from rgbdslam_tpu.solvers.ransac_se3 import _inv3x3
    from rgbdslam_tpu.solvers.icp import _gn_step

    rng = np.random.default_rng(3)
    N = 256
    p1 = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    p1[:, 2] += 2.5
    T = np.asarray(se3.exp(jnp.asarray(
        rng.normal(scale=0.05, size=6).astype(np.float32))))
    p2 = (p1 @ T[:3, :3].T + T[:3, 3]
          + rng.normal(scale=0.01, size=(N, 3))).astype(np.float32)
    # random SPD covariances
    A = rng.normal(scale=0.02, size=(N, 3, 3)).astype(np.float32)
    C1 = A @ A.transpose(0, 2, 1) + 1e-4 * np.eye(3, dtype=np.float32)
    B = rng.normal(scale=0.02, size=(N, 3, 3)).astype(np.float32)
    C2 = B @ B.transpose(0, 2, 1) + 1e-4 * np.eye(3, dtype=np.float32)
    valid = rng.uniform(size=N) > 0.25
    max_dist = 0.15

    Tj = jnp.asarray(T)
    H_k, b_k, cost_k, cnt_k = gicp_gn_normal_equations(
        Tj, jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(C1),
        jnp.asarray(C2), jnp.asarray(valid), max_dist, interpret=True)

    # XLA reference: same quantities via the einsum path
    R = Tj[:3, :3]
    C1r = jnp.einsum("ij,njk,lk->nil", R, jnp.asarray(C1), R)
    W = _inv3x3(C1r + jnp.asarray(C2))
    q = jnp.asarray(p1) @ R.T + Tj[:3, 3]
    r = q - jnp.asarray(p2)
    dist = jnp.linalg.norm(r, axis=-1)
    gate = jnp.asarray(valid) & (dist < max_dist)
    wm = gate.astype(jnp.float32)
    from rgbdslam_tpu.geometry import se3 as _se3
    eye = jnp.broadcast_to(jnp.eye(3), (N, 3, 3))
    J = jnp.concatenate([eye, -_se3.hat(q)], axis=-1)
    WJ = W @ J
    H_x = jnp.einsum("nij,nik,n->jk", J, WJ, wm)
    b_x = jnp.einsum("nij,ni,n->j", WJ, r, wm)
    cost_x = jnp.sum(jnp.einsum("ni,nij,nj->n", r, W, r) * wm)

    np.testing.assert_allclose(np.asarray(H_k), np.asarray(H_x),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(b_k), np.asarray(b_x),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(cost_k), float(cost_x), rtol=1e-4)
    assert int(cnt_k) == int(jnp.sum(wm))


def test_gicp_loop_kernel_matches_xla_loop():
    """The one-launch full-loop GICP kernel must match the XLA fori_loop
    (same per-round math: normal equations -> damped Cholesky -> SE(3)
    exp-compose)."""
    from rgbdslam_tpu.config import IcpConfig
    from rgbdslam_tpu.ops.pallas_kernels import gicp_refine_kernel
    from rgbdslam_tpu.solvers.icp import gicp_refine

    rng = np.random.default_rng(5)
    N = 256
    p1 = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    p1[:, 2] += 2.5
    T = np.asarray(se3.exp(jnp.asarray(
        rng.normal(scale=0.03, size=6).astype(np.float32))))
    p2 = (p1 @ T[:3, :3].T + T[:3, 3]
          + rng.normal(scale=0.004, size=(N, 3))).astype(np.float32)
    A = rng.normal(scale=0.02, size=(N, 3, 3)).astype(np.float32)
    C1 = A @ A.transpose(0, 2, 1) + 1e-4 * np.eye(3, dtype=np.float32)
    B = rng.normal(scale=0.02, size=(N, 3, 3)).astype(np.float32)
    C2 = B @ B.transpose(0, 2, 1) + 1e-4 * np.eye(3, dtype=np.float32)
    valid = rng.uniform(size=N) > 0.2
    T0 = np.asarray(se3.exp(jnp.asarray(
        rng.normal(scale=0.02, size=6).astype(np.float32)))) @ T
    cfg = IcpConfig(max_iterations=8, max_correspondence_dist=0.15)

    # XLA reference path (kernel path only engages on the TPU backend)
    T_x, conv_x, n_x = gicp_refine(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(valid),
        jnp.asarray(T0), None, cfg, C1=jnp.asarray(C1), C2=jnp.asarray(C2))
    assert bool(conv_x)

    T_k, cost_k, cnt_k = gicp_refine_kernel(
        jnp.asarray(T0), jnp.asarray(p1), jnp.asarray(p2),
        jnp.asarray(C1), jnp.asarray(C2), jnp.asarray(valid),
        cfg.max_iterations, cfg.max_correspondence_dist, interpret=True)

    np.testing.assert_allclose(np.asarray(T_k), np.asarray(T_x),
                               rtol=1e-4, atol=1e-5)
    # and it actually recovered the ground-truth transform
    err = np.linalg.norm(np.asarray(T_k)[:3, 3] - T[:3, 3])
    assert err < 5e-3, err
