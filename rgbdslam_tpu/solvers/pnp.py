"""PnP family: motion-only bundle adjustment + batched PnP RANSAC.

TPU-native equivalents of the reference's (off-live-path but shipped) absolute
-pose solvers (SURVEY.md §2.4):

- `motion_only_ba` = Solver/PnPSolver.cpp: g2o motion-only BA — one SE(3)
  vertex, per-match reprojection edges with Huber delta = sqrt(5.991), 4
  rounds of 10 LM iterations with chi^2 > 5.991 outlier demotion
  (Solver/PnPSolver.cpp:46-133). Here: fixed 4x10 damped Gauss-Newton
  rounds with outlier masking between rounds — one 6x6 solve per iteration,
  residuals/Jacobians batched over matches.

- `pnp_ransac` = Solver/PnPRansac.cpp (cv::solvePnPRansac semantics:
  iterations, pixel threshold, confidence-free fixed budget): batched
  hypotheses, each fit by 6-point DLT + polar-decomposition projection onto
  SE(3), scored by reprojection error, best refined with motion_only_ba.
  (The opengv KNEIP/GAO/EPNP selection in Solver/PnP.cpp collapses into this
  single batched minimal solver on TPU.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rgbdslam_tpu.geometry import se3
from rgbdslam_tpu.geometry.camera import Camera

CHI2_TH = 5.991  # Solver/PnPSolver.cpp:97,121 (95% 2-DoF chi-square)


def _project(cam: Camera, pts_c: jnp.ndarray) -> jnp.ndarray:
    z = jnp.where(jnp.abs(pts_c[..., 2]) < 1e-9, 1e-9, pts_c[..., 2])
    u = cam.fx * pts_c[..., 0] / z + cam.cx
    v = cam.fy * pts_c[..., 1] / z + cam.cy
    return jnp.stack([u, v], axis=-1)


def reproj_residuals(cam: Camera, Tcw: jnp.ndarray, Xw: jnp.ndarray,
                     uv: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 2) pixel residuals of world points under Tcw."""
    Xc = se3.transform_points(Tcw, Xw)
    return _project(cam, Xc) - uv


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def motion_only_ba(
    cam: Camera,
    Tcw_init: jnp.ndarray,
    Xw: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    rounds: int = 4,
    iters_per_round: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Motion-only BA with Huber + chi^2 outlier demotion between rounds.

    Returns (Tcw_opt, inlier_mask). Mirrors PnPSolver::compute
    (Solver/PnPSolver.cpp:102-133): demoted matches are excluded from later
    rounds; the last round drops the robust kernel (delta -> inf).
    """
    delta = jnp.sqrt(CHI2_TH)

    def gn_iter(T, inl, use_huber):
        def res_fn(xi):
            return reproj_residuals(cam, se3.exp(xi) @ T, Xw, uv)

        zero = jnp.zeros((6,), T.dtype)
        r = res_fn(zero)                      # (N, 2)
        J = jax.jacfwd(res_fn)(zero)          # (N, 2, 6)
        r_norm = jnp.linalg.norm(r, axis=-1)
        w_h = jnp.where(
            use_huber & (r_norm > delta),
            delta / jnp.maximum(r_norm, 1e-9),
            1.0,
        )
        w = w_h * inl.astype(T.dtype)
        H = jnp.einsum("nri,nrj,n->ij", J, J, w) + 1e-6 * jnp.eye(6, dtype=T.dtype)
        g = jnp.einsum("nri,nr,n->i", J, r, w)
        xi = -jnp.linalg.solve(H, g)
        return se3.exp(xi) @ T

    T = Tcw_init
    inl = valid
    for rd in range(rounds):
        use_huber = jnp.asarray(rd < rounds - 1)  # kernel removed last round
        T = jax.lax.fori_loop(
            0, iters_per_round, lambda i, Tc: gn_iter(Tc, inl, use_huber), T
        )
        r = reproj_residuals(cam, T, Xw, uv)
        chi2 = jnp.sum(r * r, axis=-1)
        inl = valid & (chi2 <= CHI2_TH)       # demotion (PnPSolver.cpp:117-124)
    return T, inl


def _dlt_pose(Xw: jnp.ndarray, uv_n: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """6+-point DLT for [R|t] from world points and *normalized* image coords,
    followed by polar-decomposition projection onto SO(3). Batched over
    leading dims. Xw: (..., S, 3), uv_n: (..., S, 2), w: (..., S)."""
    S = Xw.shape[-2]
    X = jnp.concatenate([Xw, jnp.ones(Xw.shape[:-1] + (1,), Xw.dtype)], axis=-1)
    zero = jnp.zeros_like(X)
    x, y = uv_n[..., 0:1], uv_n[..., 1:2]
    row_u = jnp.concatenate([X, zero, -x * X], axis=-1)     # (..., S, 12)
    row_v = jnp.concatenate([zero, X, -y * X], axis=-1)
    A = jnp.concatenate([row_u, row_v], axis=-2)            # (..., 2S, 12)
    ws = jnp.concatenate([w, w], axis=-1)[..., None]
    AtA = jnp.einsum("...ni,...nj->...ij", A * ws, A)       # (..., 12, 12)
    # null vector = smallest eigenvector
    evals, evecs = jnp.linalg.eigh(AtA)
    p = evecs[..., :, 0]
    P = p.reshape(p.shape[:-1] + (3, 4))
    M = P[..., :3]
    # fix sign: points must be in front (positive depth for centroid)
    cent = jnp.mean(Xw, axis=-2)
    zc = jnp.einsum("...ij,...j->...i", M, cent)[..., 2] + P[..., 2, 3]
    sign = jnp.where(zc < 0, -1.0, 1.0)[..., None, None]
    P = P * sign
    M = P[..., :3]
    t = P[..., 3]
    # scale: det(M)^(1/3) -> unit rotation
    det = jnp.linalg.det(M)
    scale = jnp.sign(det) * jnp.abs(det) ** (1.0 / 3.0)
    scale = jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    M = M / scale[..., None, None]
    t = t / scale[..., None]
    # polar decomposition via Newton iteration: R <- (R + R^-T)/2
    R = M
    for _ in range(6):
        R = 0.5 * (R + jnp.linalg.inv(jnp.swapaxes(R, -1, -2)))
    return se3.from_Rt(R, t)


class PnPResult(NamedTuple):
    Tcw: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray
    success: jnp.ndarray


@functools.partial(jax.jit, static_argnums=(0, 5))
def pnp_ransac(
    cam: Camera,
    Xw: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    key: jnp.ndarray,
    cfg=None,
) -> PnPResult:
    """Batched PnP RANSAC: 6-point DLT hypotheses + reprojection scoring +
    motion-only BA refinement of the winner.

    Defaults mirror Solver/PnPRansac.cpp:14-56: pixel threshold 3.0,
    hypothesis budget ~ its 500 iterations, min inliers gate from caller.
    """
    H = 128
    S = 6
    px_th = 3.0
    min_inliers = 10

    n = Xw.shape[0]
    logits = jnp.where(valid, 0.0, -jnp.inf)
    any_valid = jnp.any(valid)
    logits = jnp.where(any_valid, logits, jnp.zeros_like(logits))
    idx = jax.random.categorical(key, logits, shape=(H, S))

    uv_n = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    T_h = _dlt_pose(Xw[idx], uv_n[idx], valid[idx].astype(Xw.dtype))  # (H,4,4)

    # batched residuals: (H, N, 2)
    Xc = jnp.einsum("hij,nj->hni", T_h[:, :3, :3], Xw) + T_h[:, None, :3, 3]
    pr = _project(cam, Xc)
    err2 = jnp.sum((pr - uv[None]) ** 2, axis=-1)
    inl_h = (err2 <= px_th * px_th) & valid[None, :] & (Xc[..., 2] > 0.05)
    cnt_h = jnp.sum(inl_h, axis=-1)
    best = jnp.argmax(cnt_h)

    T0 = T_h[best]
    inl0 = inl_h[best]
    T_ref, inl_ref = motion_only_ba(cam, T0, Xw, uv, inl0 & valid)
    cnt = jnp.sum(inl_ref)
    success = (cnt >= min_inliers) & any_valid
    return PnPResult(
        Tcw=jnp.where(success, T_ref, jnp.eye(4, dtype=T_ref.dtype)),
        inliers=inl_ref & success,
        num_inliers=cnt.astype(jnp.int32),
        success=success,
    )
