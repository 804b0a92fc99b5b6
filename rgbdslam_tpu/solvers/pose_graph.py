"""SE(3) pose-graph optimization: batched Gauss-Newton/LM with a dense solve.

TPU-native replacement for the g2o backend (Solver/PoseGraph.cpp:30-57:
BlockSolver<6,3> + CSparse + Levenberg; vertices are Twc, edges are relative
SE(3) measurements with information 100*I6 and Huber kernels,
Solver/PoseGraph.cpp:186-243).

Re-design: the graph is arrays — vertex poses Twc [K,4,4], edges
(a[E], b[E], Z[E,4,4], valid[E]) with measurement convention
Z = T_{a<-b} (g2o setMeasurementFromState: Z = X_a^{-1} X_b). Per-iteration:

1. per-edge residual r = log(Z^{-1} Twc_a^{-1} Twc_b) and its exact Jacobians
   wrt left-multiplied increments of both endpoints via vmapped forward-mode
   autodiff (12 dual evaluations of a 4x4 chain — trivially parallel),
2. Huber IRLS reweighting,
3. scatter-add of 6x6 blocks into the dense H [6K, 6K] and rhs,
4. gauge fixing by a strong prior on fixed vertices
   (Solver/PoseGraph.cpp:354-360 fixes vertex 0),
5. damped dense Cholesky solve — O((6K)^3) maps straight onto the MXU and
   beats sparse scalar pivoting on TPU for K up to ~1k; the Schur/CG path for
   larger maps lives in parallel/dist_ba.py.

Shapes are static: the host pads K and E to budget sizes, so the jitted
optimizer compiles once per budget.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgbdslam_tpu.geometry import se3


class PoseGraphEdges(NamedTuple):
    a: jnp.ndarray        # (E,) i32 vertex index (edge's "current" side)
    b: jnp.ndarray        # (E,) i32 vertex index (edge's "other" side)
    Z: jnp.ndarray        # (E, 4, 4) measurement T_{a<-b}
    weight: jnp.ndarray   # (E,) f32 information scale (0 = invalid slot)


def edge_residual(Ta: jnp.ndarray, Tb: jnp.ndarray, Z: jnp.ndarray) -> jnp.ndarray:
    """r = log(Z^{-1} Ta^{-1} Tb) — g2o EdgeSE3 error convention.

    Uses the autodiff-safe log: residuals live near identity, where the
    general branchy log has NaN derivatives.
    """
    return se3.log_smooth(se3.inverse(Z) @ se3.inverse(Ta) @ Tb)


def _residual_and_jacobians(Ta, Tb, Z):
    """Residual (6,) and Jacobians (6,6)x2 wrt left increments of Ta, Tb."""

    def f(xi_ab):
        xa, xb = xi_ab[:6], xi_ab[6:]
        return edge_residual(se3.exp(xa) @ Ta, se3.exp(xb) @ Tb, Z)

    zero = jnp.zeros((12,), dtype=Ta.dtype)
    r = f(zero)
    J = jax.jacfwd(f)(zero)  # (6, 12)
    return r, J[:, :6], J[:, 6:]


def _huber_weight(r_norm: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight of the Huber kernel (g2o RobustKernelHuber)."""
    return jnp.where(r_norm <= delta, 1.0, delta / jnp.maximum(r_norm, 1e-12))


def _huber_cost(r_norm: jnp.ndarray, weight: jnp.ndarray,
                delta: float) -> jnp.ndarray:
    """True robust objective sum_e w_e * rho_delta(|r_e|) — the quantity
    Levenberg's accept/reject compares (g2o OptimizationAlgorithmLevenberg
    computes chi2 before and after the tentative step)."""
    quad = r_norm * r_norm
    lin = 2.0 * delta * r_norm - delta * delta
    return jnp.sum(weight * jnp.where(r_norm <= delta, quad, lin))


def graph_cost(Twc: jnp.ndarray, edges: PoseGraphEdges,
               huber_delta: float) -> jnp.ndarray:
    """Robust pose-graph objective at `Twc` (residual-only pass)."""
    r = jax.vmap(edge_residual)(Twc[edges.a], Twc[edges.b], edges.Z)
    return _huber_cost(jnp.linalg.norm(r, axis=-1), edges.weight, huber_delta)


# LM lambda schedule (VERDICT r3 item 3): x2 on a rejected step, /3 on an
# accepted one — the fixed-trip, masked-accept analog of g2o Levenberg's
# adaptive lambda (Solver/PoseGraph.cpp:30-57 uses
# OptimizationAlgorithmLevenberg). Clamps keep a long reject streak from
# overflowing f32.
LM_REJECT_FACTOR = 2.0
LM_ACCEPT_FACTOR = 1.0 / 3.0
LM_LAMBDA_MIN = 1e-9
LM_LAMBDA_MAX = 1e8


def _lm_update(accept, lam, cost, cost_new, x_cur, x_cand):
    """Masked LM accept/reject shared by every solver here: returns
    (x_next, lam_next, cost_next). `x_cur`/`x_cand` are pytrees."""
    lam_next = jnp.clip(
        jnp.where(accept, lam * LM_ACCEPT_FACTOR, lam * LM_REJECT_FACTOR),
        LM_LAMBDA_MIN, LM_LAMBDA_MAX,
    )
    x_next = jax.tree.map(
        lambda c, n: jnp.where(accept, n, c), x_cur, x_cand
    )
    return x_next, lam_next, jnp.where(accept, cost_new, cost)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def optimize_pose_graph(
    Twc: jnp.ndarray,
    edges: PoseGraphEdges,
    fixed: jnp.ndarray,
    iterations: int = 10,
    huber_delta: float = 1.0,
    lm_lambda0: float = 1e-4,
    adaptive: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Optimize vertex poses. Returns (Twc_opt [K,4,4], final_cost []).

    Twc: (K, 4, 4) vertex estimates (camera-to-world, like g2o VertexSE3
      seeded with pose inverse, Solver/PoseGraph.cpp:190).
    edges: padded edge arrays; weight==0 slots are ignored.
    fixed: (K,) bool — gauge-fixed vertices get a 1e9 prior on their increment
      (vertex 0, Solver/PoseGraph.cpp:191,358).
    adaptive: True = Levenberg-Marquardt with step accept/reject and the
      x2 / /3 lambda schedule starting at lm_lambda0 (the reference backend is
      g2o *Levenberg*, Solver/PoseGraph.cpp:30-57); False = fixed-damping
      Gauss-Newton (kept for A/B tests — it diverges on bad initializations
      where LM recovers, tests/test_pose_graph.py).
    """
    K = Twc.shape[0]
    dtype = Twc.dtype

    def lm_iter(_, state):
        Twc_cur, lam, _prev_cost = state
        Ta = Twc_cur[edges.a]
        Tb = Twc_cur[edges.b]
        r, Ja, Jb = jax.vmap(_residual_and_jacobians)(Ta, Tb, edges.Z)  # (E,6),(E,6,6)

        r_norm = jnp.linalg.norm(r, axis=-1)
        w = edges.weight * _huber_weight(r_norm, huber_delta)  # (E,)
        cost = _huber_cost(r_norm, edges.weight, huber_delta)

        # normal equations blocks
        Haa = jnp.einsum("eij,eik,e->ejk", Ja, Ja, w)
        Hbb = jnp.einsum("eij,eik,e->ejk", Jb, Jb, w)
        Hab = jnp.einsum("eij,eik,e->ejk", Ja, Jb, w)
        ga = jnp.einsum("eij,ei,e->ej", Ja, r, w)
        gb = jnp.einsum("eij,ei,e->ej", Jb, r, w)

        H = jnp.zeros((K, 6, K, 6), dtype=dtype)
        H = H.at[edges.a, :, edges.a, :].add(Haa)
        H = H.at[edges.b, :, edges.b, :].add(Hbb)
        H = H.at[edges.a, :, edges.b, :].add(Hab)
        H = H.at[edges.b, :, edges.a, :].add(jnp.swapaxes(Hab, -1, -2))
        g = jnp.zeros((K, 6), dtype=dtype)
        g = g.at[edges.a].add(ga)
        g = g.at[edges.b].add(gb)

        Hm = H.reshape(K * 6, K * 6)
        gv = g.reshape(K * 6)

        # gauge prior + Marquardt damping (lam scales the diagonal)
        diag_boost = jnp.where(jnp.repeat(fixed, 6), 1e9, lam + 1e-8)
        Hm = Hm + jnp.diag(diag_boost) + lam * jnp.diag(jnp.diag(Hm))

        xi = -jnp.linalg.solve(Hm, gv).reshape(K, 6)
        xi = jnp.where(fixed[:, None], 0.0, xi)
        Twc_cand = se3.exp(xi) @ Twc_cur
        if not adaptive:
            return (Twc_cand, lam, cost)
        cost_new = graph_cost(Twc_cand, edges, huber_delta)
        accept = cost_new < cost
        Twc_next, lam_next, cost_next = _lm_update(
            accept, lam, cost, cost_new, Twc_cur, Twc_cand)
        return (Twc_next, lam_next, cost_next)

    Twc_opt, _lam, cost = jax.lax.fori_loop(
        0, iterations, lm_iter,
        (Twc, jnp.asarray(lm_lambda0, dtype), jnp.asarray(jnp.inf, dtype)),
    )
    return Twc_opt, cost


# ---------------------------------------------------------------------------
# Sim(3) pose-graph variant — scale-drift-aware optimization (the north-star
# "Sim(3)/SE(3) pose graph"; RGB-D runs default to SE(3) since depth pins
# scale, but loop closure across scale drift / map merging uses this).
# ---------------------------------------------------------------------------


def sim3_edge_residual(Sa: jnp.ndarray, Sb: jnp.ndarray, Z: jnp.ndarray) -> jnp.ndarray:
    """r = log_sim3(Z^-1 Sa^-1 Sb) in R^7."""
    from rgbdslam_tpu.geometry import sim3

    return sim3.log(sim3.inverse(Z) @ sim3.inverse(Sa) @ Sb)


def _sim3_residual_and_jacobians(Sa, Sb, Z):
    from rgbdslam_tpu.geometry import sim3

    def f(xi_ab):
        xa, xb = xi_ab[:7], xi_ab[7:]
        return sim3_edge_residual(sim3.exp(xa) @ Sa, sim3.exp(xb) @ Sb, Z)

    zero = jnp.zeros((14,), dtype=Sa.dtype)
    r = f(zero)
    J = jax.jacfwd(f)(zero)
    return r, J[:, :7], J[:, 7:]


def _sim3_cost(S, edges: PoseGraphEdges, huber_delta: float):
    r = jax.vmap(sim3_edge_residual)(S[edges.a], S[edges.b], edges.Z)
    return _huber_cost(jnp.linalg.norm(r, axis=-1), edges.weight, huber_delta)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def optimize_sim3_graph(
    Swc: jnp.ndarray,
    edges: PoseGraphEdges,
    fixed: jnp.ndarray,
    iterations: int = 10,
    huber_delta: float = 1.0,
    lm_lambda0: float = 1e-4,
    adaptive: bool = True,
):
    """Levenberg-Marquardt over Sim(3) vertices (K, 4, 4) with sim3
    measurements. Same structure as optimize_pose_graph with 7-dof blocks.
    """
    from rgbdslam_tpu.geometry import sim3

    K = Swc.shape[0]
    dtype = Swc.dtype
    D = 7

    def lm_iter(_, state):
        S_cur, lam, _prev = state
        Sa = S_cur[edges.a]
        Sb = S_cur[edges.b]
        r, Ja, Jb = jax.vmap(_sim3_residual_and_jacobians)(Sa, Sb, edges.Z)
        r_norm = jnp.linalg.norm(r, axis=-1)
        w = edges.weight * _huber_weight(r_norm, huber_delta)
        cost = _huber_cost(r_norm, edges.weight, huber_delta)

        Haa = jnp.einsum("eij,eik,e->ejk", Ja, Ja, w)
        Hbb = jnp.einsum("eij,eik,e->ejk", Jb, Jb, w)
        Hab = jnp.einsum("eij,eik,e->ejk", Ja, Jb, w)
        ga = jnp.einsum("eij,ei,e->ej", Ja, r, w)
        gb = jnp.einsum("eij,ei,e->ej", Jb, r, w)

        H = jnp.zeros((K, D, K, D), dtype=dtype)
        H = H.at[edges.a, :, edges.a, :].add(Haa)
        H = H.at[edges.b, :, edges.b, :].add(Hbb)
        H = H.at[edges.a, :, edges.b, :].add(Hab)
        H = H.at[edges.b, :, edges.a, :].add(jnp.swapaxes(Hab, -1, -2))
        g = jnp.zeros((K, D), dtype=dtype)
        g = g.at[edges.a].add(ga)
        g = g.at[edges.b].add(gb)

        Hm = H.reshape(K * D, K * D)
        gv = g.reshape(K * D)
        diag_boost = jnp.where(jnp.repeat(fixed, D), 1e9, lam + 1e-8)
        Hm = Hm + jnp.diag(diag_boost) + lam * jnp.diag(jnp.diag(Hm))
        xi = -jnp.linalg.solve(Hm, gv).reshape(K, D)
        xi = jnp.where(fixed[:, None], 0.0, xi)
        S_cand = sim3.exp(xi) @ S_cur
        if not adaptive:
            return (S_cand, lam, cost)
        cost_new = _sim3_cost(S_cand, edges, huber_delta)
        accept = cost_new < cost
        S_next, lam_next, cost_next = _lm_update(
            accept, lam, cost, cost_new, S_cur, S_cand)
        return (S_next, lam_next, cost_next)

    S_opt, _lam, cost = jax.lax.fori_loop(
        0, iterations, lm_iter,
        (Swc, jnp.asarray(lm_lambda0, dtype), jnp.asarray(jnp.inf, dtype)),
    )
    return S_opt, cost


# ---------------------------------------------------------------------------
# Host-side graph container (edge registry semantics of Solver/PoseGraph.cpp)
# ---------------------------------------------------------------------------


class PoseGraph:
    """Host registry of vertices/edges + padded-device optimization calls.

    Mirrors PoseGraph's graph bookkeeping: odometry edge to the previous KF
    (createEdgeWithReference), measured proximity/loop edges (createEdge),
    (a,b)-keyed dedup (existEdge, Solver/PoseGraph.cpp:370-381).
    """

    def __init__(self, max_vertices: int, max_edges: int,
                 information: float = 100.0, huber_delta: float = 1.0,
                 cg_threshold: int = 256, cg_iters: int = 64,
                 lm_lambda0: float = 1e-4):
        self.max_vertices = max_vertices
        self.max_edges = max_edges
        self.information = information
        self.huber_delta = huber_delta
        self.lm_lambda0 = lm_lambda0    # Levenberg start (PoseGraphConfig)
        # when set (SlamSystem with SlamConfig.distributed on a multi-device
        # runtime), every solve rides the mesh: edge-sharded shard_map LM
        # with the matrix-free CG inner solve (parallel/dist_ba.py) — the
        # reference's backend IS its live optimizer (Solver/PoseGraph.cpp:
        # 59-103); here the live optimizer IS the distributed solver.
        self.mesh = None
        self.dist_solves = 0     # observability: solves that rode the mesh
        # multi-process publisher hooks (parallel/mp_slam.py): the tracking
        # process announces every vertex/edge/solve over the async DCN
        # channel so backend peer processes hold an identical graph mirror
        # and join each collective solve — the cross-process analog of the
        # reference's PoseGraph thread consuming the tracker's queue
        # (Solver/PoseGraph.cpp:289-302)
        self.on_vertex = None    # callback(k, Twc_4x4)
        self.on_edge = None      # callback(a, b, Z, raw_weight, kind)
        self.on_solve = None     # callback(iterations, n_vertices, n_edges)
        # padded-K switch point from the dense (6K)^2 Cholesky to the
        # matrix-free CG solve (solvers/cg.py) — keeps the solve O(K + E)
        self.cg_threshold = cg_threshold
        self.cg_iters = cg_iters
        self.Twc = np.tile(np.eye(4, dtype=np.float32), (max_vertices, 1, 1))
        self.n_vertices = 0
        self.e_a = np.zeros((max_edges,), dtype=np.int32)
        self.e_b = np.zeros((max_edges,), dtype=np.int32)
        self.e_Z = np.tile(np.eye(4, dtype=np.float32), (max_edges, 1, 1))
        self.e_w = np.zeros((max_edges,), dtype=np.float32)
        self.n_edges = 0
        self._edge_keys = set()

    def add_vertex(self, Twc: np.ndarray) -> int:
        k = self.n_vertices
        if k >= self.max_vertices:
            # budget-doubling: the reference's graph grows unboundedly
            # (Core/Map.cpp:10-132); padded power-of-two buckets mean the
            # device solve recompiles once per doubling, not per vertex
            self.Twc = np.concatenate(
                [self.Twc,
                 np.tile(np.eye(4, dtype=np.float32), (self.max_vertices, 1, 1))])
            self.max_vertices *= 2
        self.Twc[k] = Twc.astype(np.float32)
        self.n_vertices += 1
        if self.on_vertex is not None:
            self.on_vertex(k, self.Twc[k])
        return k

    def has_edge(self, a: int, b: int) -> bool:
        return a == b or (a, b) in self._edge_keys or (b, a) in self._edge_keys

    def add_edge(self, a: int, b: int, Z_ab: np.ndarray, weight: float = 1.0,
                 kind: int = 2):
        """Edge with measurement Z = T_{a<-b} (a = 'current' side).

        kind: provenance tag for the multi-process publisher (1 = odometry,
        2 = proximity/measured, 3 = loop closure) — purely observability,
        no effect on the solve."""
        if self.n_edges >= self.max_edges:
            E = self.max_edges
            self.e_a = np.concatenate([self.e_a, np.zeros((E,), np.int32)])
            self.e_b = np.concatenate([self.e_b, np.zeros((E,), np.int32)])
            self.e_Z = np.concatenate(
                [self.e_Z, np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))])
            self.e_w = np.concatenate([self.e_w, np.zeros((E,), np.float32)])
            self.max_edges *= 2
        e = self.n_edges
        self.e_a[e] = a
        self.e_b[e] = b
        self.e_Z[e] = Z_ab.astype(np.float32)
        self.e_w[e] = weight * self.information
        self.n_edges += 1
        self._edge_keys.add((a, b))
        if self.on_edge is not None:
            self.on_edge(a, b, self.e_Z[e], float(weight), int(kind))

    def add_odometry_edge(self, a: int, b: int):
        """setMeasurementFromState (Solver/PoseGraph.cpp:204): Z from the
        current estimates."""
        Z = se3.inverse_np(self.Twc[a]) @ self.Twc[b]
        self.add_edge(a, b, Z, kind=1)

    @staticmethod
    def _pad(n: int) -> int:
        p = 8
        while p < n:
            p *= 2
        return p

    def optimize(self, iterations: int = 10) -> np.ndarray:
        """Run the device solve; updates and returns Twc[:n_vertices].

        Like the reference, requires >5 vertices (Solver/PoseGraph.cpp:354).
        """
        K = self.n_vertices
        if K <= 5:
            return self.Twc[:K]
        if self.on_solve is not None:
            # announce the solve to backend peer processes BEFORE entering
            # the collective (they must join the shard_map program with an
            # identical mirror; parallel/mp_slam.py)
            self.on_solve(iterations, K, self.n_edges)
        Kp = self._pad(K)
        Ep = self._pad(max(self.n_edges, 1))
        Twc = np.tile(np.eye(4, dtype=np.float32), (Kp, 1, 1))
        Twc[:K] = self.Twc[:K]
        a_np = (np.resize(self.e_a[: self.n_edges], Ep)
                * (np.arange(Ep) < self.n_edges)).astype(np.int32)
        b_np = (np.resize(self.e_b[: self.n_edges], Ep)
                * (np.arange(Ep) < self.n_edges)).astype(np.int32)
        Z_np = np.concatenate(
            [self.e_Z[: self.n_edges],
             np.tile(np.eye(4, dtype=np.float32),
                     (Ep - self.n_edges, 1, 1))])
        w_np = np.concatenate(
            [self.e_w[: self.n_edges],
             np.zeros(Ep - self.n_edges, np.float32)])
        edges = PoseGraphEdges(a=jnp.asarray(a_np), b=jnp.asarray(b_np),
                               Z=jnp.asarray(Z_np), weight=jnp.asarray(w_np))
        fixed = np.zeros((Kp,), dtype=bool)
        fixed[0] = True          # vertex 0 gauge (Solver/PoseGraph.cpp:358)
        fixed[K:] = True         # padding vertices pinned
        from rgbdslam_tpu.utils.rpccount import RPC

        if self.mesh is not None and self.mesh.size > 1:
            # distributed live path: edges sharded over the mesh, normal
            # equations psum-reduced over ICI, matrix-free CG inner solve
            from rgbdslam_tpu.parallel.dist_ba import (
                distributed_pose_graph_optimize_cg, shard_edges)

            if any(d.process_index != jax.process_index()
                   for d in self.mesh.devices.flat):
                # mesh spans OS processes (jax.distributed multi-controller):
                # every process holds the same full value and contributes
                # its addressable shards — device_put of a host-local array
                # cannot target non-addressable devices
                from jax.sharding import PartitionSpec as P

                from rgbdslam_tpu.parallel.multihost import (
                    make_global, shard_edges_global)

                ed = shard_edges_global(
                    PoseGraphEdges(a=a_np, b=b_np, Z=Z_np, weight=w_np),
                    self.mesh)
                Twc_in = make_global(Twc, self.mesh, P())
                fixed_in = make_global(fixed, self.mesh, P())
            else:
                ed = shard_edges(edges, self.mesh)
                Twc_in, fixed_in = jnp.asarray(Twc), jnp.asarray(fixed)
            Twc_opt, _cost = distributed_pose_graph_optimize_cg(
                Twc_in, ed, fixed_in, self.mesh,
                iterations, self.cg_iters, self.huber_delta,
                self.lm_lambda0,
            )
            self.dist_solves += 1
            RPC.dispatches += 1
            import time as _time

            t0 = _time.perf_counter()
            jax.block_until_ready(Twc_opt)
            out = np.asarray(Twc_opt.addressable_data(0))[:K]
            RPC.fetches += 1
            RPC.fetch_s += _time.perf_counter() - t0
            self.Twc[:K] = out
            return out
        elif Kp >= self.cg_threshold:
            # large-map path: matrix-free preconditioned CG, O(K + E) memory
            from rgbdslam_tpu.solvers.cg import optimize_pose_graph_cg

            Twc_opt, _cost = optimize_pose_graph_cg(
                jnp.asarray(Twc), edges, jnp.asarray(fixed),
                iterations, self.cg_iters, self.huber_delta,
                self.lm_lambda0,
            )
        else:
            Twc_opt, _cost = optimize_pose_graph(
                jnp.asarray(Twc), edges, jnp.asarray(fixed),
                iterations, self.huber_delta, self.lm_lambda0,
            )
        RPC.dispatches += 1
        # RPC.fetch times the blocked wait (device solve + transfer + RTT)
        # into fetch_s — without it the whole solve shows up as "host busy"
        # in the bench accounting
        out = RPC.fetch(Twc_opt)[:K]
        self.Twc[:K] = out
        return out
