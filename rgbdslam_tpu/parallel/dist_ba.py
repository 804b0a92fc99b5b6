"""Distributed pose-graph / bundle-adjustment over a device mesh.

The reference is single-process (SURVEY.md §2.7: no distributed backend);
this module adds the TPU-native scaling axis (§2.7 P7/P8): shard the *edge*
set (the O(E) work: residuals, Jacobians, block outer products) across a 1-D
`Mesh` with `shard_map`, reduce the Gauss-Newton normal equations with `psum`
over ICI, and solve the (replicated) 6Kx6K system on every device — the solve
is O(K^3) but K (keyframes) is orders of magnitude smaller than E after
proximity/loop densification, so edge-sharding is where the parallel win is.

Also provides the data-parallel frontend: a batch of frames sharded across
devices, each running the full feature pipeline locally (embarrassingly
parallel — the reference's per-cell OpenMP loop, P5, scaled to chips).

All functions are pure and mesh-parameterized; they run identically on a real
pod slice or on the `--xla_force_host_platform_device_count` CPU mesh used in
tests and the driver's multi-chip dry run.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rgbdslam_tpu.geometry import se3
from rgbdslam_tpu.solvers.pose_graph import (
    PoseGraphEdges,
    _huber_weight,
    _residual_and_jacobians,
)


def make_mesh(n_devices: int | None = None, axis: str = "edges") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_edges(edges: PoseGraphEdges, mesh: Mesh, axis: str = "edges") -> PoseGraphEdges:
    """Pad E to a multiple of the mesh size and device_put with edge sharding."""
    n_dev = mesh.shape[axis]
    E = edges.a.shape[0]
    Ep = ((E + n_dev - 1) // n_dev) * n_dev
    pad = Ep - E

    def pad_arr(x, fill=0):
        if pad == 0:
            return x
        pad_width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=fill)

    Z_pad = edges.Z
    if pad:
        Z_pad = jnp.concatenate(
            [edges.Z, jnp.broadcast_to(jnp.eye(4, dtype=edges.Z.dtype), (pad, 4, 4))]
        )
    padded = PoseGraphEdges(
        a=pad_arr(edges.a), b=pad_arr(edges.b), Z=Z_pad, weight=pad_arr(edges.weight)
    )
    sharding = NamedSharding(mesh, P(axis))
    return PoseGraphEdges(
        a=jax.device_put(padded.a, sharding),
        b=jax.device_put(padded.b, sharding),
        Z=jax.device_put(padded.Z, sharding),
        weight=jax.device_put(padded.weight, sharding),
    )


def _local_normal_equations(Twc, edges: PoseGraphEdges, huber_delta: float, K: int):
    """H, g, cost from this shard's edges (runs per device under shard_map)."""
    Ta = Twc[edges.a]
    Tb = Twc[edges.b]
    r, Ja, Jb = jax.vmap(_residual_and_jacobians)(Ta, Tb, edges.Z)
    r_norm = jnp.linalg.norm(r, axis=-1)
    w = edges.weight * _huber_weight(r_norm, huber_delta)
    cost = jnp.sum(w * r_norm * r_norm)

    Haa = jnp.einsum("eij,eik,e->ejk", Ja, Ja, w)
    Hbb = jnp.einsum("eij,eik,e->ejk", Jb, Jb, w)
    Hab = jnp.einsum("eij,eik,e->ejk", Ja, Jb, w)
    ga = jnp.einsum("eij,ei,e->ej", Ja, r, w)
    gb = jnp.einsum("eij,ei,e->ej", Jb, r, w)

    H = jnp.zeros((K, 6, K, 6), dtype=Twc.dtype)
    H = H.at[edges.a, :, edges.a, :].add(Haa)
    H = H.at[edges.b, :, edges.b, :].add(Hbb)
    H = H.at[edges.a, :, edges.b, :].add(Hab)
    H = H.at[edges.b, :, edges.a, :].add(jnp.swapaxes(Hab, -1, -2))
    g = jnp.zeros((K, 6), dtype=Twc.dtype)
    g = g.at[edges.a].add(ga)
    g = g.at[edges.b].add(gb)
    return H.reshape(K * 6, K * 6), g.reshape(K * 6), cost


def distributed_pose_graph_optimize(
    Twc: jnp.ndarray,
    edges: PoseGraphEdges,
    fixed: jnp.ndarray,
    mesh: Mesh,
    iterations: int = 10,
    huber_delta: float = 1.0,
    damping: float = 1e-6,
    axis: str = "edges",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Edge-sharded Gauss-Newton: identical math to
    solvers.pose_graph.optimize_pose_graph, with the per-edge work SPMD over
    the mesh and H/g reduced via psum over ICI.

    Twc (K,4,4) and fixed (K,) are replicated; edges are sharded on `axis`
    (see shard_edges). Returns (Twc_opt, final_cost).
    """
    K = Twc.shape[0]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), PoseGraphEdges(P(axis), P(axis), P(axis), P(axis)), P()),
        out_specs=(P(), P()),
    )
    def run(Twc0, ed, fixed_m):
        def gn_iter(_, state):
            Twc_cur, _prev = state
            H, g, cost = _local_normal_equations(Twc_cur, ed, huber_delta, K)
            # ICI all-reduce of the normal equations
            H = jax.lax.psum(H, axis)
            g = jax.lax.psum(g, axis)
            cost = jax.lax.psum(cost, axis)

            diag_boost = jnp.where(jnp.repeat(fixed_m, 6), 1e9, damping + 1e-8)
            H = H + jnp.diag(diag_boost) + damping * jnp.diag(jnp.diag(H))
            xi = -jnp.linalg.solve(H, g).reshape(K, 6)
            xi = jnp.where(fixed_m[:, None], 0.0, xi)
            return (se3.exp(xi) @ Twc_cur, cost)

        return jax.lax.fori_loop(
            0, iterations, gn_iter, (Twc0, jnp.asarray(jnp.inf, Twc0.dtype))
        )

    return jax.jit(run)(Twc, edges, fixed)


# ---------------------------------------------------------------------------
# Data-parallel frontend: batch of frames sharded across devices
# ---------------------------------------------------------------------------


def batched_frontend(cam, cfg):
    """Returns a jitted fn (grays [B,H,W], depths [B,H,W]) -> FrameFeatures
    batch, to be invoked with B-sharded inputs; XLA partitions the whole
    pipeline (pyramid/FAST/descriptors) per device with zero collectives —
    the P5 OpenMP-grid analog at chip granularity."""
    from rgbdslam_tpu.frontend.frame import build_frame_features

    def run(grays, depths):
        return jax.vmap(lambda g, d: build_frame_features(cam, g, d, cfg))(
            grays, depths
        )

    return jax.jit(run)
