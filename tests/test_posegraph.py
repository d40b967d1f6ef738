"""Pose-graph LM solver tests on noise-perturbed synthetic graphs (SURVEY §4d)."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from tpuslam.posegraph import PoseGraph, graph_error, lm_optimize


def _se3(rotvec, t):
    T = np.eye(4)
    T[:3, :3] = Rotation.from_rotvec(rotvec).as_matrix()
    T[:3, 3] = t
    return T


def _chain_poses(n, rng, step=1.0):
    """Ground-truth chain: forward motion with small random turns."""
    poses = [np.eye(4)]
    for _ in range(n - 1):
        delta = _se3(rng.normal(scale=0.03, size=3), [0, 0, step])
        poses.append(poses[-1] @ delta)
    return poses


def _build_graph(gt_poses, rng, odo_noise=0.05, loops=(), init_noise=0.0):
    g = PoseGraph()
    # initial estimates: integrate the noisy odometry
    est = [gt_poses[0]]
    odo = []
    for i in range(1, len(gt_poses)):
        Z = np.linalg.inv(gt_poses[i - 1]) @ gt_poses[i]
        noise = _se3(rng.normal(scale=odo_noise * 0.05, size=3),
                     rng.normal(scale=odo_noise, size=3))
        Zn = Z @ noise
        odo.append(Zn)
        est.append(est[-1] @ Zn)
    g.add_vertex(0, est[0], fixed=True)
    for i in range(1, len(gt_poses)):
        g.add_vertex(i, est[i])
        g.add_edge((i - 1, i), odo[i - 1])
    for (i, j) in loops:
        Z = np.linalg.inv(gt_poses[i]) @ gt_poses[j]
        g.add_edge((i, j), Z, information=np.eye(6) * 2.0, is_loop_closure=True)
    return g, est


def _ate(poses_a, poses_b):
    d = [np.linalg.norm(a[:3, 3] - b[:3, 3]) for a, b in zip(poses_a, poses_b)]
    return float(np.sqrt(np.mean(np.square(d))))


def test_noise_free_graph_is_fixed_point(rng):
    gt = _chain_poses(10, rng)
    g, _ = _build_graph(gt, rng, odo_noise=0.0)
    before = [g.get_pose(i) for i in g.vertex_ids]
    err = g.optimize(max_iterations=5)
    after = [g.get_pose(i) for i in g.vertex_ids]
    assert err < 1e-6
    assert _ate(before, after) < 1e-4


def test_loop_closure_corrects_drift(rng):
    """Odometry noise accumulates; loop edges must pull the chain back.

    The MAP solution balances loop edges against the noisy odometry, so the
    drift shrinks substantially but does not vanish — same behaviour as the
    reference's g2o solve with these information weights."""
    gt = _chain_poses(40, rng)
    g, est = _build_graph(gt, rng, odo_noise=0.08, loops=[(0, 39), (5, 35)])
    ate_before = _ate(est, gt)
    g.optimize(max_iterations=25)
    after = [g.get_pose(i) for i in g.vertex_ids]
    ate_after = _ate(after, gt)
    assert ate_after < 0.65 * ate_before, (ate_before, ate_after)
    # the loop constraint itself must now be (nearly) satisfied
    Z_expected = np.linalg.inv(gt[0]) @ gt[39]
    Z_after = np.linalg.inv(after[0]) @ after[39]
    assert np.linalg.norm(Z_after[:3, 3] - Z_expected[:3, 3]) < 0.35


def test_fixed_vertex_never_moves(rng):
    gt = _chain_poses(12, rng)
    g, _ = _build_graph(gt, rng, odo_noise=0.1, loops=[(0, 11)])
    first = g.get_pose(0)
    g.optimize(max_iterations=10)
    np.testing.assert_array_equal(g.get_pose(0), first)


def test_optimize_reduces_graph_error(rng):
    gt = _chain_poses(25, rng)
    g, _ = _build_graph(gt, rng, odo_noise=0.1, loops=[(0, 24)])
    arrays, _ = g.to_arrays()
    err_before = float(graph_error(arrays))
    g.optimize(max_iterations=20)
    arrays_after, _ = g.to_arrays()
    err_after = float(graph_error(arrays_after))
    assert err_after < err_before * 0.2


def test_api_parity_queries(rng):
    g = PoseGraph()
    g.add_vertex(0, np.eye(4), fixed=True)
    T = _se3([0, 0.05, 0], [0, 0, 1])
    g.add_vertex(1, T)
    g.add_vertex(5, T @ T)
    g.add_edge((0, 1), T)
    g.add_edge((1, 5), T, is_loop_closure=True)
    assert g.vertex_ids == [0, 1, 5]
    assert g.does_edge_exists(1, 0) and not g.does_edge_exists(0, 5)
    assert g.is_vertex_in_any_edge(5)
    assert g.num_loop_closures == 1
    assert g.does_vertex_have_only_global_edges(5)  # only the (1,5) long edge
    np.testing.assert_allclose(
        g.get_transform(0, 1), np.linalg.inv(g.get_pose(0)) @ g.get_pose(1)
    )
    assert "Vertices: 3" in str(g)


def test_meshlab_export(tmp_path, rng):
    g = PoseGraph()
    g.add_vertex(0, np.eye(4), fixed=True)
    g.add_vertex(1, _se3([0, 0, 0], [0, 0, 1]))
    g.add_edge((0, 1), _se3([0, 0, 0], [0, 0, 1]))
    out = tmp_path / "graph.obj"
    g.visualize_in_meshlab(out, verbose=False)
    text = out.read_text()
    assert text.count("\nv ") >= 3 and "\nl " in text


def test_native_solver_matches_jax(rng):
    """The C++ solver must reach (at least) the same error as the JAX LM."""
    from tpuslam.posegraph import native

    if not native.is_available():
        pytest.skip("g++ unavailable")
    gt = _chain_poses(30, rng)
    g_native, _ = _build_graph(gt, rng, odo_noise=0.08, loops=[(0, 29)])
    # identical second graph for the jax backend
    rng2 = np.random.default_rng(42)
    gt2 = _chain_poses(30, rng2)
    g_jax, _ = _build_graph(gt2, rng2, odo_noise=0.08, loops=[(0, 29)])

    err_native = g_native.optimize(max_iterations=25, backend="native")
    err_jax = g_jax.optimize(max_iterations=25, backend="jax")
    assert err_native <= err_jax * 1.5 + 1e-6
    # both solutions close in ATE terms
    a = [g_native.get_pose(i) for i in g_native.vertex_ids]
    b = [g_jax.get_pose(i) for i in g_jax.vertex_ids]
    assert _ate(a, b) < 0.15


def test_native_solver_fixed_vertex(rng):
    from tpuslam.posegraph import native

    if not native.is_available():
        pytest.skip("g++ unavailable")
    gt = _chain_poses(12, rng)
    g, _ = _build_graph(gt, rng, odo_noise=0.1, loops=[(0, 11)])
    first = g.get_pose(0)
    g.optimize(max_iterations=10, backend="native")
    np.testing.assert_array_equal(g.get_pose(0), first)


def test_native_noise_free_fixed_point(rng):
    from tpuslam.posegraph import native

    if not native.is_available():
        pytest.skip("g++ unavailable")
    gt = _chain_poses(10, rng)
    g, _ = _build_graph(gt, rng, odo_noise=0.0)
    before = [g.get_pose(i) for i in g.vertex_ids]
    err = g.optimize(max_iterations=5, backend="native")
    after = [g.get_pose(i) for i in g.vertex_ids]
    assert err < 1e-6
    assert _ate(before, after) < 1e-4
