import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from tpuslam.geometry import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    parameters_from_transformation,
    se3_exp,
    se3_inverse,
    se3_log,
    transformation_from_parameters,
)


def random_axis_angles(rng, n=16, max_angle=np.pi * 0.9):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    # Angle floor keeps the reference's `angle + 1e-7` normalisation guard
    # from dominating the error budget (it makes R non-orthogonal at O(eps/angle)).
    angles = rng.uniform(1e-2, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


def test_axis_angle_to_matrix_vs_scipy(rng):
    aa = random_axis_angles(rng)
    ours = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
    ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_axis_angle_roundtrip(rng):
    aa = random_axis_angles(rng)
    R = axis_angle_to_matrix(jnp.asarray(aa))
    back = np.asarray(matrix_to_axis_angle(R))
    np.testing.assert_allclose(back, aa, atol=1e-4)


def test_axis_angle_tiny_rotation():
    aa = jnp.asarray([[1e-9, 0.0, 0.0]], dtype=jnp.float32)
    R = axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(R), np.eye(3)[None], atol=1e-6)


def test_transformation_forward_inverse_consistency(rng):
    aa = jnp.asarray(random_axis_angles(rng, 8))
    t = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    T = transformation_from_parameters(aa, t, invert=False)
    Tinv = transformation_from_parameters(aa, t, invert=True)
    prod = np.asarray(T @ Tinv)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)


def test_transformation_structure(rng):
    """Forward map is T(t) @ R: rotation block is R, translation column is t."""
    aa = jnp.asarray(random_axis_angles(rng, 4))
    t = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    T = np.asarray(transformation_from_parameters(aa, t))
    np.testing.assert_allclose(T[:, :3, :3], Rotation.from_rotvec(np.asarray(aa)).as_matrix(), atol=1e-5)
    np.testing.assert_allclose(T[:, :3, 3], np.asarray(t), atol=1e-6)
    np.testing.assert_allclose(T[:, 3], np.broadcast_to([0, 0, 0, 1], (4, 4)), atol=0)


def test_parameters_from_transformation_roundtrip(rng):
    aa = jnp.asarray(random_axis_angles(rng, 8))
    t = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    T = transformation_from_parameters(aa, t)
    t_back, aa_back = parameters_from_transformation(T)
    np.testing.assert_allclose(np.asarray(t_back), np.asarray(t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(aa_back), np.asarray(aa), atol=1e-4)


def test_se3_inverse(rng):
    aa = jnp.asarray(random_axis_angles(rng, 8))
    t = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    T = transformation_from_parameters(aa, t)
    prod = np.asarray(T @ se3_inverse(T))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32) * 0.5
    T = se3_exp(jnp.asarray(xi))
    back = np.asarray(se3_log(T))
    np.testing.assert_allclose(back, xi, atol=1e-4)


def test_se3_exp_small_twist():
    xi = jnp.asarray([[1e-8, 2e-8, -1e-8, 1e-9, -1e-9, 1e-9]], dtype=jnp.float32)
    T = np.asarray(se3_exp(xi))
    np.testing.assert_allclose(T, np.eye(4)[None], atol=1e-6)


def test_se3_exp_matches_scipy_rotation(rng):
    xi = rng.normal(size=(8, 6)).astype(np.float32)
    T = np.asarray(se3_exp(jnp.asarray(xi)))
    R_ref = Rotation.from_rotvec(xi[:, 3:]).as_matrix()
    np.testing.assert_allclose(T[:, :3, :3], R_ref, atol=1e-5)
