"""Levenberg-Marquardt pose-graph optimisation over SE(3) (+ points), in JAX.

Replaces g2o's `SparseOptimizer` + `BlockSolverSE3(LinearSolverCholmodSE3)` +
`OptimizationAlgorithmLevenberg` (used at
/root/reference/slam/pose_graph_optimization.py:13-15) with a TPU-friendly
solver:

* residual per pose-pose edge (i, j, Z, Info): r = log( Z^{-1} X_i^{-1} X_j )
  in R^6 — the standard relative-pose error that g2o's EdgeSE3 minimises.
* residual per pose-point edge (i, p, z, Info3): r = X_i^{-1} p - z in R^3 —
  g2o's EdgeSE3PointXYZ with an identity sensor offset
  (pose_graph_optimization.py:75-89).  Points are jointly optimised with the
  poses in the same normal equations, exactly like g2o's block solver.
* per-edge Jacobians w.r.t. the incident tangent deltas come from
  `jax.jacfwd` vmapped over all edges (no hand-derived adjoints to get wrong).
* normal equations assembled by scatter-add into a dense (6N + 3P)^2 H —
  SLAM graphs here are <= a few thousand vertices (loop closures stop at
  step 4000, slam/slam.py:224), and a dense solve of that size is a single
  fused TPU kernel, where a sparse Cholesky would serialise.  Buckets of
  padded size keep shapes static across calls.  The dense H puts a practical
  ceiling on this backend (~1k vertices: H is 6144^2 f32 = 151 MB and the
  solve is O(n^3)); beyond that use the native banded-Cholesky/Woodbury
  solver (`backend='native'`/'auto' in PoseGraph.optimize), which exploits
  the chain + few-loop-closures sparsity.
* classic LM damping loop with accept/reject on the true error and g2o-style
  early termination: the `lax.while_loop` exits when an accepted step stops
  reducing the error (relative gain < 1e-9) or the damping saturates, so a
  reference-parity `max_iterations=10000` costs only the iterations actually
  needed (typically < 30).

Gauge freedom is fixed by masking the tangent deltas of `fixed` vertices
(identity rows in H).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.geometry.se3 import se3_exp, se3_inverse, se3_log

_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


class GraphArrays(NamedTuple):
    """Padded, device-ready pose graph.

    poses: (N, 4, 4); fixed_mask: (N,) bool (True = held constant; padding
    slots are fixed too); edges_ij: (M, 2) int32; measurements: (M, 4, 4);
    information: (M, 6, 6); edge_mask: (M,) bool (False = padding).

    Optional point blocks (all sized 0 when the graph has no points):
    points: (P, 3); point_fixed: (P,) bool; pp_edges: (Q, 2) int32 rows of
    (pose_index, point_index); pp_measurements: (Q, 3) point coordinates in
    the pose frame; pp_information: (Q, 3, 3); pp_mask: (Q,) bool.
    """

    poses: jax.Array
    fixed_mask: jax.Array
    edges_ij: jax.Array
    measurements: jax.Array
    information: jax.Array
    edge_mask: jax.Array
    points: jax.Array
    point_fixed: jax.Array
    pp_edges: jax.Array
    pp_measurements: jax.Array
    pp_information: jax.Array
    pp_mask: jax.Array


def _empty_points(dtype=jnp.float32):
    return dict(
        points=jnp.zeros((0, 3), dtype),
        point_fixed=jnp.zeros((0,), bool),
        pp_edges=jnp.zeros((0, 2), jnp.int32),
        pp_measurements=jnp.zeros((0, 3), dtype),
        pp_information=jnp.zeros((0, 3, 3), dtype),
        pp_mask=jnp.zeros((0,), bool),
    )


def edge_residual(X_i: jax.Array, X_j: jax.Array, Z: jax.Array) -> jax.Array:
    """r = log(Z^-1 X_i^-1 X_j) in R^6 (v, w)."""
    return se3_log(_mm(se3_inverse(Z), _mm(se3_inverse(X_i), X_j)))


def point_residual(X_i: jax.Array, p: jax.Array, z: jax.Array) -> jax.Array:
    """r = X_i^-1 p - z in R^3 (point measured in the pose frame)."""
    R = X_i[:3, :3]
    t = X_i[:3, 3]
    return R.T @ (p - t) - z


def _edge_residual_delta(
    delta_ij: jax.Array, X_i: jax.Array, X_j: jax.Array, Z: jax.Array
) -> jax.Array:
    """Residual after left-applying tangent deltas to both endpoints."""
    d_i, d_j = delta_ij[:6], delta_ij[6:]
    Xi = _mm(se3_exp(d_i), X_i)
    Xj = _mm(se3_exp(d_j), X_j)
    return edge_residual(Xi, Xj, Z)


def _point_residual_delta(
    delta: jax.Array, X_i: jax.Array, p: jax.Array, z: jax.Array
) -> jax.Array:
    """Point residual after pose tangent delta (6) and point delta (3)."""
    Xi = _mm(se3_exp(delta[:6]), X_i)
    return point_residual(Xi, p + delta[6:], z)


_edge_jacobian = jax.vmap(
    jax.jacfwd(_edge_residual_delta), in_axes=(None, 0, 0, 0)
)
_edge_residuals = jax.vmap(edge_residual, in_axes=(0, 0, 0))
_point_jacobian = jax.vmap(
    jax.jacfwd(_point_residual_delta), in_axes=(None, 0, 0, 0)
)
_point_residuals = jax.vmap(point_residual, in_axes=(0, 0, 0))


def graph_error(g: GraphArrays) -> jax.Array:
    """Total weighted squared error over real (non-padding) edges."""
    Xi = g.poses[g.edges_ij[:, 0]]
    Xj = g.poses[g.edges_ij[:, 1]]
    r = _edge_residuals(Xi, Xj, g.measurements)  # (M, 6)
    w = _mm(g.information, r[..., None])[..., 0]  # (M, 6)
    per_edge = (r * w).sum(-1)
    err = jnp.where(g.edge_mask, per_edge, 0.0).sum()
    if g.pp_edges.shape[0]:
        Xp = g.poses[g.pp_edges[:, 0]]
        P = g.points[g.pp_edges[:, 1]]
        rp = _point_residuals(Xp, P, g.pp_measurements)  # (Q, 3)
        wp = _mm(g.pp_information, rp[..., None])[..., 0]
        per_pp = (rp * wp).sum(-1)
        err = err + jnp.where(g.pp_mask, per_pp, 0.0).sum()
    return err


def _normal_equations(g: GraphArrays) -> Tuple[jax.Array, jax.Array]:
    """Assemble H (6N+3P, 6N+3P) and b by scatter-add of per-edge blocks."""
    N = g.poses.shape[0]
    P = g.points.shape[0]
    D = N * 6 + P * 3
    Xi = g.poses[g.edges_ij[:, 0]]
    Xj = g.poses[g.edges_ij[:, 1]]
    r = _edge_residuals(Xi, Xj, g.measurements)  # (M, 6)
    zero12 = jnp.zeros((12,), g.poses.dtype)
    J = _edge_jacobian(zero12, Xi, Xj, g.measurements)  # (M, 6, 12)
    mask = g.edge_mask[:, None, None]
    J = jnp.where(mask, J, 0.0)
    r = jnp.where(g.edge_mask[:, None], r, 0.0)

    WJ = _mm(g.information, J)  # (M, 6, 12)
    H_e = _mm(jnp.swapaxes(J, 1, 2), WJ)  # (M, 12, 12)
    b_e = _mm(jnp.swapaxes(J, 1, 2), _mm(g.information, r[..., None]))[..., 0]  # (M, 12)

    H = jnp.zeros((D, D), g.poses.dtype)
    b = jnp.zeros((D,), g.poses.dtype)
    base = g.edges_ij * 6  # (M, 2)
    offs = jnp.arange(6)
    rows_i = base[:, 0:1] + offs[None]  # (M, 6)
    rows_j = base[:, 1:2] + offs[None]
    rows = jnp.concatenate([rows_i, rows_j], axis=1)  # (M, 12)
    # scatter H blocks: index grid per edge
    H = H.at[rows[:, :, None], rows[:, None, :]].add(H_e)
    b = b.at[rows].add(b_e)

    if P:
        Xp = g.poses[g.pp_edges[:, 0]]
        Pts = g.points[g.pp_edges[:, 1]]
        rp = _point_residuals(Xp, Pts, g.pp_measurements)  # (Q, 3)
        zero9 = jnp.zeros((9,), g.poses.dtype)
        Jp = _point_jacobian(zero9, Xp, Pts, g.pp_measurements)  # (Q, 3, 9)
        pmask = g.pp_mask[:, None, None]
        Jp = jnp.where(pmask, Jp, 0.0)
        rp = jnp.where(g.pp_mask[:, None], rp, 0.0)
        WJp = _mm(g.pp_information, Jp)  # (Q, 3, 9)
        H_p = _mm(jnp.swapaxes(Jp, 1, 2), WJp)  # (Q, 9, 9)
        b_p = _mm(jnp.swapaxes(Jp, 1, 2), _mm(g.pp_information, rp[..., None]))[..., 0]
        prow_pose = g.pp_edges[:, 0:1] * 6 + offs[None]  # (Q, 6)
        prow_pt = N * 6 + g.pp_edges[:, 1:2] * 3 + jnp.arange(3)[None]  # (Q, 3)
        prows = jnp.concatenate([prow_pose, prow_pt], axis=1)  # (Q, 9)
        H = H.at[prows[:, :, None], prows[:, None, :]].add(H_p)
        b = b.at[prows].add(b_p)
    return H, b


def _free_mask(g: GraphArrays) -> jax.Array:
    free = ~jnp.repeat(g.fixed_mask, 6)
    if g.points.shape[0]:
        free = jnp.concatenate([free, ~jnp.repeat(g.point_fixed, 3)])
    return free


def _masked_solve(
    H: jax.Array, b: jax.Array, free: jax.Array, lam: jax.Array
) -> jax.Array:
    """Solve (H + lam*diag(H)) d = -b with fixed variables pinned to d=0."""
    # LM damping on the diagonal (multiplicative, g2o-style)
    diag = jnp.clip(jnp.diag(H), 1e-8, None)
    Hd = H + jnp.diag(lam * diag)
    # pin fixed rows/cols: identity row, zero rhs
    free_f = free.astype(H.dtype)
    Hd = Hd * free_f[:, None] * free_f[None, :] + jnp.diag(1.0 - free_f)
    rhs = -b * free_f
    return jax.scipy.linalg.solve(Hd, rhs, assume_a="pos")


def _apply_delta(g: GraphArrays, delta: jax.Array) -> GraphArrays:
    N = g.poses.shape[0]
    d = delta[: N * 6].reshape(-1, 6)
    poses = _mm(se3_exp(d), g.poses)
    if g.points.shape[0]:
        points = g.points + delta[N * 6 :].reshape(-1, 3)
        return g._replace(poses=poses, points=points)
    return g._replace(poses=poses)


@partial(jax.jit, static_argnames=("max_iterations",))
def lm_optimize(
    g: GraphArrays,
    max_iterations: int = 20,
    initial_lambda: float = 1e-4,
    gain_tolerance: float = 1e-9,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """LM with accept/reject damping and g2o-style early termination.

    Stops when an accepted step improves the error by less than
    `gain_tolerance` relatively, when damping saturates (graph stuck), or at
    `max_iterations`.  Compiles once per bucket regardless of the cap, so a
    reference-parity cap of 10000 (slam/slam.py:246) is free.

    Returns (optimised poses (N, 4, 4), optimised points (P, 3), final error).
    """
    free = _free_mask(g)

    def cond(carry):
        _, _, _, _, it, done = carry
        return (~done) & (it < max_iterations)

    def body(carry):
        poses, points, lam, err, it, _ = carry
        gg = g._replace(poses=poses, points=points)
        H, b = _normal_equations(gg)
        delta = _masked_solve(H, b, free, lam)
        cand = _apply_delta(gg, delta)
        new_err = graph_error(cand)
        accept = new_err < err
        poses = jnp.where(accept, cand.poses, poses)
        points = jnp.where(accept, cand.points, points)
        converged = accept & (err - new_err < gain_tolerance * jnp.maximum(err, 1e-30))
        err = jnp.where(accept, new_err, err)
        new_lam = jnp.where(
            accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6)
        )
        stuck = (~accept) & (lam >= 1e6)
        return (poses, points, new_lam, err, it + 1, converged | stuck)

    err0 = graph_error(g)
    poses, points, _, err, _, _ = jax.lax.while_loop(
        cond,
        body,
        (g.poses, g.points, jnp.asarray(initial_lambda, g.poses.dtype), err0,
         jnp.asarray(0, jnp.int32), jnp.asarray(False)),
    )
    return poses, points, err


def pad_graph(
    poses: np.ndarray,
    fixed: np.ndarray,
    edges_ij: np.ndarray,
    measurements: np.ndarray,
    information: np.ndarray,
    vertex_bucket: int,
    edge_bucket: int,
    points: np.ndarray = None,
    point_fixed: np.ndarray = None,
    pp_edges: np.ndarray = None,
    pp_measurements: np.ndarray = None,
    pp_information: np.ndarray = None,
    point_bucket: int = 0,
    pp_edge_bucket: int = 0,
) -> GraphArrays:
    """Pad host arrays to bucket sizes (static shapes -> one compile/bucket)."""
    n, m = len(poses), len(edges_ij)
    if n > vertex_bucket or m > edge_bucket:
        raise ValueError("bucket too small")
    P = np.tile(np.eye(4, dtype=np.float32), (vertex_bucket, 1, 1))
    P[:n] = poses
    F = np.ones(vertex_bucket, bool)
    F[:n] = fixed
    E = np.zeros((edge_bucket, 2), np.int32)
    E[:m] = edges_ij
    Z = np.tile(np.eye(4, dtype=np.float32), (edge_bucket, 1, 1))
    Z[:m] = measurements
    I6 = np.tile(np.eye(6, dtype=np.float32), (edge_bucket, 1, 1))
    I6[:m] = information
    M = np.zeros(edge_bucket, bool)
    M[:m] = True

    if points is None or len(points) == 0:
        pt = _empty_points()
    else:
        if point_fixed is None:
            point_fixed = np.zeros(len(points), bool)
        if pp_edges is None:
            pp_edges = np.zeros((0, 2), np.int32)
            pp_measurements = np.zeros((0, 3), np.float32)
            pp_information = np.zeros((0, 3, 3), np.float32)
        p, q = len(points), len(pp_edges)
        if p > point_bucket or q > pp_edge_bucket:
            raise ValueError("point bucket too small")
        Pts = np.zeros((point_bucket, 3), np.float32)
        Pts[:p] = points
        PF = np.ones(point_bucket, bool)
        PF[:p] = point_fixed
        PE = np.zeros((pp_edge_bucket, 2), np.int32)
        PE[:q] = pp_edges
        PZ = np.zeros((pp_edge_bucket, 3), np.float32)
        PZ[:q] = pp_measurements
        PI = np.tile(np.eye(3, dtype=np.float32), (pp_edge_bucket, 1, 1))
        PI[:q] = pp_information
        PM = np.zeros(pp_edge_bucket, bool)
        PM[:q] = True
        pt = dict(
            points=jnp.asarray(Pts),
            point_fixed=jnp.asarray(PF),
            pp_edges=jnp.asarray(PE),
            pp_measurements=jnp.asarray(PZ),
            pp_information=jnp.asarray(PI),
            pp_mask=jnp.asarray(PM),
        )

    return GraphArrays(
        poses=jnp.asarray(P),
        fixed_mask=jnp.asarray(F),
        edges_ij=jnp.asarray(E),
        measurements=jnp.asarray(Z),
        information=jnp.asarray(I6),
        edge_mask=jnp.asarray(M),
        **pt,
    )


def bucket_size(n: int, minimum: int = 64) -> int:
    """Next power-of-two bucket (>= minimum) to bound recompiles to O(log n)."""
    b = minimum
    while b < n:
        b *= 2
    return b
