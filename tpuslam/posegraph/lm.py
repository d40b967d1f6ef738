"""Levenberg-Marquardt pose-graph optimisation over SE(3), in JAX.

Replaces g2o's `SparseOptimizer` + `BlockSolverSE3(LinearSolverCholmodSE3)` +
`OptimizationAlgorithmLevenberg` (used at
/root/reference/slam/pose_graph_optimization.py:13-15) with a TPU-friendly
solver:

* residual per edge (i, j, Z, Info): r = log( Z^{-1} X_i^{-1} X_j ) in R^6 —
  the standard relative-pose error that g2o's EdgeSE3 minimises.
* per-edge Jacobians w.r.t. the two incident tangent deltas come from
  `jax.jacfwd` vmapped over all edges (no hand-derived adjoints to get wrong).
* normal equations assembled by scatter-add into a dense (6n, 6n) H — SLAM
  graphs here are <= a few thousand vertices (loop closures stop at step
  4000, slam/slam.py:224), and a dense solve of that size is a single fused
  TPU kernel, where a sparse Cholesky would serialise.  Buckets of padded
  size keep shapes static across calls.
* classic LM damping loop with accept/reject on the true error.

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
    """

    poses: jax.Array
    fixed_mask: jax.Array
    edges_ij: jax.Array
    measurements: jax.Array
    information: jax.Array
    edge_mask: jax.Array


def edge_residual(X_i: jax.Array, X_j: jax.Array, Z: jax.Array) -> jax.Array:
    """r = log(Z^-1 X_i^-1 X_j) in R^6 (v, w)."""
    return se3_log(_mm(se3_inverse(Z), _mm(se3_inverse(X_i), X_j)))


def _edge_residual_delta(
    delta_ij: jax.Array, X_i: jax.Array, X_j: jax.Array, Z: jax.Array
) -> jax.Array:
    """Residual after left-applying tangent deltas to both endpoints."""
    d_i, d_j = delta_ij[:6], delta_ij[6:]
    Xi = _mm(se3_exp(d_i), X_i)
    Xj = _mm(se3_exp(d_j), X_j)
    return edge_residual(Xi, Xj, Z)


_edge_jacobian = jax.vmap(
    jax.jacfwd(_edge_residual_delta), in_axes=(None, 0, 0, 0)
)
_edge_residuals = jax.vmap(edge_residual, in_axes=(0, 0, 0))


def graph_error(g: GraphArrays) -> jax.Array:
    """Total weighted squared error sum_e r^T Info r over real edges."""
    Xi = g.poses[g.edges_ij[:, 0]]
    Xj = g.poses[g.edges_ij[:, 1]]
    r = _edge_residuals(Xi, Xj, g.measurements)  # (M, 6)
    w = _mm(g.information, r[..., None])[..., 0]  # (M, 6)
    per_edge = (r * w).sum(-1)
    return jnp.where(g.edge_mask, per_edge, 0.0).sum()


def _normal_equations(g: GraphArrays) -> Tuple[jax.Array, jax.Array]:
    """Assemble H (6N, 6N) and b (6N,) by scatter-add of per-edge blocks."""
    N = g.poses.shape[0]
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

    H = jnp.zeros((N * 6, N * 6), g.poses.dtype)
    b = jnp.zeros((N * 6,), g.poses.dtype)
    base = g.edges_ij * 6  # (M, 2)
    offs = jnp.arange(6)
    rows_i = base[:, 0:1] + offs[None]  # (M, 6)
    rows_j = base[:, 1:2] + offs[None]
    rows = jnp.concatenate([rows_i, rows_j], axis=1)  # (M, 12)
    # scatter H blocks: index grid per edge
    rr = rows[:, :, None]  # (M, 12, 1)
    cc = rows[:, None, :]  # (M, 1, 12)
    H = H.at[rr, cc].add(H_e)
    b = b.at[rows].add(b_e)
    return H, b


def _masked_solve(
    H: jax.Array, b: jax.Array, fixed_mask: jax.Array, lam: jax.Array
) -> jax.Array:
    """Solve (H + lam*diag(H)) d = -b with fixed vertices pinned to d=0."""
    N6 = H.shape[0]
    free = ~jnp.repeat(fixed_mask, 6)
    # LM damping on the diagonal (multiplicative, g2o-style)
    diag = jnp.clip(jnp.diag(H), 1e-8, None)
    Hd = H + jnp.diag(lam * diag)
    # pin fixed rows/cols: identity row, zero rhs
    free_f = free.astype(H.dtype)
    Hd = Hd * free_f[:, None] * free_f[None, :] + jnp.diag(1.0 - free_f)
    rhs = -b * free_f
    return jax.scipy.linalg.solve(Hd, rhs, assume_a="pos")


def _apply_delta(poses: jax.Array, delta: jax.Array) -> jax.Array:
    d = delta.reshape(-1, 6)
    return _mm(se3_exp(d), poses)


@partial(jax.jit, static_argnames=("max_iterations",))
def lm_optimize(
    g: GraphArrays,
    max_iterations: int = 20,
    initial_lambda: float = 1e-4,
) -> Tuple[jax.Array, jax.Array]:
    """Run LM until `max_iterations` (with accept/reject damping updates).

    Returns (optimised poses (N, 4, 4), final total error).
    """

    def body(carry, _):
        poses, lam, err = carry
        gg = g._replace(poses=poses)
        H, b = _normal_equations(gg)
        delta = _masked_solve(H, b, g.fixed_mask, lam)
        new_poses = _apply_delta(poses, delta)
        new_err = graph_error(g._replace(poses=new_poses))
        accept = new_err < err
        poses = jnp.where(accept, new_poses, poses)
        err = jnp.where(accept, new_err, err)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
        return (poses, lam, err), err

    err0 = graph_error(g)
    (poses, _, err), _ = jax.lax.scan(
        body,
        (g.poses, jnp.asarray(initial_lambda, g.poses.dtype), err0),
        None,
        length=max_iterations,
    )
    return poses, err


def pad_graph(
    poses: np.ndarray,
    fixed: np.ndarray,
    edges_ij: np.ndarray,
    measurements: np.ndarray,
    information: np.ndarray,
    vertex_bucket: int,
    edge_bucket: int,
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
    return GraphArrays(
        poses=jnp.asarray(P),
        fixed_mask=jnp.asarray(F),
        edges_ij=jnp.asarray(E),
        measurements=jnp.asarray(Z),
        information=jnp.asarray(I6),
        edge_mask=jnp.asarray(M),
    )


def bucket_size(n: int, minimum: int = 64) -> int:
    """Next power-of-two bucket (>= minimum) to bound recompiles to O(log n)."""
    b = minimum
    while b < n:
        b *= 2
    return b
