"""SE(3) / SO(3) primitives as pure JAX functions.

Semantics match the reference CL-SLAM math (see
/root/reference/depth_pose_prediction/utils.py:34-142 and
/root/reference/depth_pose_prediction/pytorch3d.py) but are written as
batched, jit-friendly jnp transforms in f32 so the whole pose pipeline
stays on-device inside one XLA computation.

Conventions
-----------
* Transformations are 4x4 row-major homogeneous matrices (camera-to-camera).
* `axis_angle` is a rotation vector (direction = axis, norm = angle, radians).
* All functions accept a leading batch dimension (or none; they broadcast).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    """Rodrigues formula: (..., 3) rotation vector -> (..., 3, 3) matrix.

    Mirrors the reference `rot_from_axisangle`
    (depth_pose_prediction/utils.py:74-117) including its `angle + 1e-7`
    normalisation guard so tiny rotations behave identically.
    """
    # safe norm: finite gradient at exactly zero rotation (plain norm has a
    # 0/0 JVP there, which would poison the fused train step's backward)
    angle = jnp.sqrt(jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True) + 1e-24)
    axis = axis_angle / (angle + _EPS)
    ca = jnp.cos(angle)[..., None]
    sa = jnp.sin(angle)[..., None]
    C = 1.0 - ca

    x = axis[..., 0:1, None]
    y = axis[..., 1:2, None]
    z = axis[..., 2:3, None]

    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    row0 = jnp.concatenate([x * xC + ca, xyC - zs, zxC + ys], axis=-1)
    row1 = jnp.concatenate([xyC + zs, y * yC + ca, yzC - xs], axis=-1)
    row2 = jnp.concatenate([zxC - ys, yzC + xs, z * zC + ca], axis=-1)
    return jnp.concatenate([row0, row1, row2], axis=-2)


def matrix_to_axis_angle(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 3) rotation vector.

    Equivalent to reference `quaternion_to_axis_angle(matrix_to_quaternion(R))`
    (depth_pose_prediction/pytorch3d.py:8-86), implemented via the quaternion
    route for numerical robustness near 0 and pi.
    """
    quat = matrix_to_quaternion(matrix)
    return quaternion_to_axis_angle(quat)


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    return jnp.where(x > 0, jnp.sqrt(jnp.where(x > 0, x, 1.0)), jnp.zeros_like(x))


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) quaternion (w, x, y, z), pytorch3d convention."""
    m00 = matrix[..., 0, 0]
    m11 = matrix[..., 1, 1]
    m22 = matrix[..., 2, 2]
    o0 = 0.5 * _sqrt_positive_part(1 + m00 + m11 + m22)
    x = 0.5 * _sqrt_positive_part(1 + m00 - m11 - m22)
    y = 0.5 * _sqrt_positive_part(1 - m00 + m11 - m22)
    z = 0.5 * _sqrt_positive_part(1 - m00 - m11 + m22)
    o1 = _copysign(x, matrix[..., 2, 1] - matrix[..., 1, 2])
    o2 = _copysign(y, matrix[..., 0, 2] - matrix[..., 2, 0])
    o3 = _copysign(z, matrix[..., 1, 0] - matrix[..., 0, 1])
    return jnp.stack([o0, o1, o2, o3], axis=-1)


def _copysign(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.where(b < 0, -jnp.abs(a), jnp.abs(a))


def quaternion_to_axis_angle(quaternions: jax.Array) -> jax.Array:
    """(..., 4) quaternion (w, x, y, z) -> (..., 3) rotation vector.

    Safe-norm + wide Taylor branch: smooth (finite-JVP) at the identity.
    """
    sq = jnp.sum(quaternions[..., 1:] * quaternions[..., 1:], axis=-1, keepdims=True)
    norms = jnp.sqrt(sq + 1e-24)
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2 * half_angles
    small = jnp.abs(angles) < 1e-3
    # Taylor: sin(x/2)/x ~ 1/2 - x^2/48
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, jnp.ones_like(angles), angles),
    )
    return quaternions[..., 1:] / sin_half_over_angle


def transformation_from_parameters(
    axis_angle: jax.Array, translation: jax.Array, invert: bool = False
) -> jax.Array:
    """Network (axis-angle, translation) output -> (..., 4, 4) SE(3).

    Matches reference `transformation_from_parameters`
    (depth_pose_prediction/utils.py:34-55): forward is `T(t) @ R`;
    inverted is `R.T @ T(-t)` (the exact inverse of the forward map).
    """
    R = axis_angle_to_matrix(axis_angle)  # (..., 3, 3)
    t = translation
    if invert:
        R = jnp.swapaxes(R, -1, -2)
        t = -t
    T = translation_matrix(t)
    Rh = _to_homogeneous_rotation(R)
    if invert:
        return Rh @ T
    return T @ Rh


def _to_homogeneous_rotation(R: jax.Array) -> jax.Array:
    batch = R.shape[:-2]
    out = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    out = out.at[..., :3, :3].set(R)
    out = out.at[..., 3, 3].set(1.0)
    return out


def translation_matrix(t: jax.Array) -> jax.Array:
    """(..., 3) translation -> (..., 4, 4) homogeneous matrix."""
    batch = t.shape[:-1]
    T = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), batch + (4, 4))
    return T.at[..., :3, 3].set(t)


def parameters_from_transformation(transformation: jax.Array):
    """(..., 4, 4) SE(3) -> (translation (...,3), axis_angle (...,3))."""
    translation = transformation[..., :3, 3]
    axis_angle = matrix_to_axis_angle(transformation[..., :3, :3])
    return translation, axis_angle


def se3_inverse(T: jax.Array) -> jax.Array:
    """Closed-form inverse of an SE(3) matrix (no generic linear solve)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t)
    top = jnp.concatenate([Rt, ti], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# se(3) log/exp used by the pose-graph Levenberg-Marquardt solver.


def so3_hat(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_log(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation -> (..., 3) rotation vector (robust near 0/pi)."""
    return matrix_to_axis_angle(R)


def se3_exp(xi: jax.Array) -> jax.Array:
    """(..., 6) twist (v, w) -> (..., 4, 4) SE(3) via the exponential map.

    f32-stable: B uses 2*sin^2(theta/2) (never the cancelling 1-cos), and the
    Taylor branch extends to theta < 1e-2 where the series error is < 1e-9.
    """
    v, w = xi[..., :3], xi[..., 3:]
    sq = jnp.sum(w * w, axis=-1)[..., None, None]  # theta^2, smooth at 0
    W = so3_hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    small = sq < 1e-4  # theta < 1e-2: Taylor error < 1e-9
    sq_safe = jnp.where(small, jnp.ones_like(sq), sq)
    theta_safe = jnp.sqrt(sq_safe)
    sin_half = jnp.sin(theta_safe / 2.0)
    A = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(theta_safe) / theta_safe)
    B = jnp.where(small, 0.5 - sq / 24.0, 2.0 * sin_half**2 / sq_safe)
    C = jnp.where(small, 1.0 / 6.0 - sq / 120.0, (1 - A) / sq_safe)
    R = eye + A * W + B * W2
    V = eye + B * W + C * W2
    t = (V @ v[..., None])[..., 0]
    out = _to_homogeneous_rotation(R)
    return out.at[..., :3, 3].set(t)


def se3_log(T: jax.Array) -> jax.Array:
    """(..., 4, 4) SE(3) -> (..., 6) twist (v, w). Inverse of `se3_exp`."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    sq = jnp.sum(w * w, axis=-1)[..., None, None]
    W = so3_hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # f32-stable: wide Taylor branch + half-angle cotangent form
    # coef = (1 - (theta/2) * cot(theta/2)) / theta^2
    small = sq < 1e-4
    sq_safe = jnp.where(small, jnp.ones_like(sq), sq)
    theta_safe = jnp.sqrt(sq_safe)
    half = theta_safe / 2.0
    cot_term = half * jnp.cos(half) / jnp.sin(half)
    coef = jnp.where(
        small,
        1.0 / 12.0 + sq / 720.0,
        (1.0 - cot_term) / sq_safe,
    )
    Vinv = eye - 0.5 * W + coef * W2
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)
