"""Pose graph container with the reference's public surface.

API parity with `PoseGraphOptimization`
(/root/reference/slam/pose_graph_optimization.py:7-144): add_vertex/add_edge
(SE3 relative-pose constraints with 6x6 information and a loop-closure
counter), pose queries, edge-existence queries, and OBJ export — but the
solve itself is the JAX LM optimiser (`tpuslam.posegraph.lm`) instead of the
g2o C++ stack.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from tpuslam.posegraph.lm import GraphArrays, bucket_size, lm_optimize, pad_graph


class PoseGraph:
    def __init__(self):
        self._poses: Dict[int, np.ndarray] = {}
        self._fixed: Dict[int, bool] = {}
        self._edges: List[Tuple[int, int]] = []
        self._measurements: List[np.ndarray] = []
        self._information: List[np.ndarray] = []
        # point landmarks (reference add_vertex_point/add_edge_pose_point,
        # pose_graph_optimization.py:45-50,75-89) — jointly optimised with
        # the poses by the JAX LM backend
        self._points: Dict[int, np.ndarray] = {}
        self._point_fixed: Dict[int, bool] = {}
        self._pp_edges: List[Tuple[int, int]] = []  # (pose_id, point_id)
        self._pp_measurements: List[np.ndarray] = []
        self._pp_information: List[np.ndarray] = []
        self.edge_vertices = set()
        self.num_loop_closures = 0

    def __str__(self) -> str:
        return (
            f"Vertices: {len(self.vertex_ids)}\n"
            f"Edges:   {len(self.edge_vertices)}\n"
            f"Loops:   {self.num_loop_closures}"
        )

    def __len__(self) -> int:
        return len(self._poses)

    @property
    def vertex_ids(self) -> List[int]:
        return sorted(self._poses.keys())

    @property
    def point_ids(self) -> List[int]:
        return sorted(self._points.keys())

    # ------------------------------------------------------------- building
    def add_vertex(self, vertex_id: int, pose: np.ndarray, fixed: bool = False):
        if vertex_id in self._points:
            raise KeyError(f"id {vertex_id} already names a point vertex")
        self._poses[vertex_id] = np.asarray(pose, np.float64).reshape(4, 4).copy()
        self._fixed[vertex_id] = bool(fixed)

    def add_edge(
        self,
        vertices: Tuple[int, int],
        measurement: np.ndarray,
        information: Optional[np.ndarray] = None,
        is_loop_closure: bool = False,
    ):
        """Relative-pose constraint: measurement maps vertex j into vertex i
        frame (X_i^-1 X_j ≈ Z), with a 6x6 information weight."""
        i, j = vertices
        if i not in self._poses or j not in self._poses:
            raise KeyError(f"edge references unknown vertex: {vertices}")
        self.edge_vertices.add((i, j))
        if is_loop_closure:
            self.num_loop_closures += 1
        self._edges.append((i, j))
        self._measurements.append(
            np.asarray(measurement, np.float64).reshape(4, 4).copy()
        )
        self._information.append(
            np.eye(6) if information is None else np.asarray(information, np.float64).copy()
        )

    def add_vertex_point(self, vertex_id: int, point: np.ndarray, fixed: bool = False):
        """XYZ landmark vertex (reference add_vertex_point, :45-50).

        Ids share one namespace with pose vertices, like g2o's optimizer."""
        if vertex_id in self._poses:
            raise KeyError(f"id {vertex_id} already names a pose vertex")
        self._points[vertex_id] = np.asarray(point, np.float64).reshape(3).copy()
        self._point_fixed[vertex_id] = bool(fixed)

    def add_edge_pose_point(
        self,
        vertex_pose: int,
        vertex_point: int,
        measurement: np.ndarray,
        information: Optional[np.ndarray] = None,
    ):
        """Pose->point observation: `measurement` is the point's position in
        the pose frame (reference add_edge_pose_point / g2o EdgeSE3PointXYZ
        with identity sensor offset, :75-89).  Jointly optimised with the
        poses (JAX LM backend)."""
        if vertex_pose not in self._poses:
            raise KeyError(f"edge references unknown pose vertex {vertex_pose}")
        if vertex_point not in self._points:
            raise KeyError(f"edge references unknown point vertex {vertex_point}")
        self._pp_edges.append((vertex_pose, vertex_point))
        self._pp_measurements.append(
            np.asarray(measurement, np.float64).reshape(3).copy()
        )
        self._pp_information.append(
            np.eye(3) if information is None
            else np.asarray(information, np.float64).copy()
        )

    # -------------------------------------------------------------- queries
    def get_pose(self, vertex_id: int) -> np.ndarray:
        return self._poses[vertex_id].copy()

    def get_point(self, vertex_id: int) -> np.ndarray:
        return self._points[vertex_id].copy()

    def get_all_points(self) -> List[np.ndarray]:
        return [self.get_point(i) for i in self.point_ids]

    def get_all_poses(self) -> List[np.ndarray]:
        return [self.get_pose(i) for i in self.vertex_ids]

    def get_transform(self, vertex_id_src: int, vertex_id_dst: int) -> np.ndarray:
        return np.linalg.inv(self._poses[vertex_id_src]) @ self._poses[vertex_id_dst]

    def does_edge_exists(self, a: int, b: int) -> bool:
        return (a, b) in self.edge_vertices or (b, a) in self.edge_vertices

    def is_vertex_in_any_edge(self, vertex_id: int) -> bool:
        return any(vertex_id in e for e in self.edge_vertices)

    def does_vertex_have_only_global_edges(self, vertex_id: int) -> bool:
        assert self.is_vertex_in_any_edge(vertex_id)
        for edge in self.edge_vertices:
            if vertex_id in edge and abs(edge[0] - edge[1]) == 1:
                return False
        return True

    # ----------------------------------------------------------- optimising
    def to_arrays(self) -> Tuple[GraphArrays, List[int]]:
        ids = self.vertex_ids
        id_to_idx = {v: k for k, v in enumerate(ids)}
        poses = np.stack([self._poses[i] for i in ids]).astype(np.float32)
        fixed = np.array([self._fixed[i] for i in ids], bool)
        if not fixed.any():
            fixed[0] = True  # pin the gauge
        edges = np.array(
            [[id_to_idx[i], id_to_idx[j]] for i, j in self._edges], np.int32
        ).reshape(-1, 2)
        Z = (
            np.stack(self._measurements).astype(np.float32)
            if self._measurements
            else np.zeros((0, 4, 4), np.float32)
        )
        info = (
            np.stack(self._information).astype(np.float32)
            if self._information
            else np.zeros((0, 6, 6), np.float32)
        )
        kwargs = {}
        pids = self.point_ids
        if pids:
            pid_to_idx = {v: k for k, v in enumerate(pids)}
            kwargs = dict(
                points=np.stack([self._points[i] for i in pids]).astype(np.float32),
                point_fixed=np.array([self._point_fixed[i] for i in pids], bool),
                pp_edges=np.array(
                    [[id_to_idx[i], pid_to_idx[j]] for i, j in self._pp_edges],
                    np.int32,
                ).reshape(-1, 2),
                pp_measurements=np.stack(self._pp_measurements).astype(np.float32)
                if self._pp_measurements
                else np.zeros((0, 3), np.float32),
                pp_information=np.stack(self._pp_information).astype(np.float32)
                if self._pp_information
                else np.zeros((0, 3, 3), np.float32),
                point_bucket=bucket_size(len(pids)),
                pp_edge_bucket=bucket_size(max(len(self._pp_edges), 1)),
            )
        g = pad_graph(
            poses,
            fixed,
            edges,
            Z,
            info,
            vertex_bucket=bucket_size(len(ids)),
            edge_bucket=bucket_size(max(len(edges), 1)),
            **kwargs,
        )
        return g, ids

    def optimize(
        self,
        max_iterations: int = 20,
        verbose: bool = False,
        backend: str = "jax",
    ) -> float:
        """Optimise the graph in place and return the final weighted error.

        backend: 'jax' (the LM solver in tpuslam.posegraph.lm), 'native' (the
        C++ banded-Cholesky/Woodbury solver in native/posegraph.cc), or
        'auto' (native when the shared library builds AND the graph is
        points-free, else jax).  Both backends terminate early like g2o when
        an accepted LM step stops reducing the error, so a reference-parity
        `max_iterations=10000` only pays for the iterations actually taken.
        Graphs with point landmarks are solved jointly (poses + points) by
        the JAX backend; the native solver is pose-only.

        Scale note: the JAX backend assembles a dense (6N+3P)^2 H — fine to
        ~1k vertices (151 MB H); for larger graphs use 'native'/'auto',
        which exploits the chain+loops sparsity (banded Cholesky + Woodbury).
        """
        if not self._edges:
            return 0.0

        if backend == "auto":
            from tpuslam.posegraph import native

            backend = (
                "native" if native.is_available() and not self._points else "jax"
            )
        if backend == "native" and self._points:
            raise ValueError(
                "the native backend is pose-only; use backend='jax' or 'auto' "
                "for graphs with point landmarks"
            )

        if backend == "native":
            from tpuslam.posegraph import native

            ids = self.vertex_ids
            id_to_idx = {v: k for k, v in enumerate(ids)}
            fixed = np.array([self._fixed[i] for i in ids], bool)
            if not fixed.any():
                fixed[0] = True
            poses, err = native.optimize_native(
                np.stack([self._poses[i] for i in ids]),
                fixed,
                np.array([[id_to_idx[i], id_to_idx[j]] for i, j in self._edges]),
                np.stack(self._measurements),
                np.stack(self._information),
                max_iterations=max_iterations,
            )
        else:
            g, ids = self.to_arrays()
            out, out_points, err = lm_optimize(g, max_iterations=max_iterations)
            poses = np.asarray(out, np.float64)
            err = float(err)
            pts = np.asarray(out_points, np.float64)
            for k, pid in enumerate(self.point_ids):
                if not self._point_fixed[pid]:
                    self._points[pid] = pts[k]

        for k, vid in enumerate(ids):
            if not self._fixed[vid]:
                self._poses[vid] = poses[k]
        if verbose:
            print(f"pose graph optimised [{backend}]: error={err:.6f}")
        return float(err)

    # -------------------------------------------------------------- export
    def visualize_in_meshlab(self, filename, meshlab=None, verbose: bool = True):
        from tpuslam.viz.meshlab import MeshlabExporter

        if not self.vertex_ids:
            return
        exporter = meshlab if meshlab is not None else MeshlabExporter()
        points = {i: self._poses[i][:3, 3] for i in self.vertex_ids}
        for p in points.values():
            exporter.add_points(p)
        for a, b in self.edge_vertices:
            exporter.add_line(points[a], points[b])
        exporter.write(filename, verbose=verbose)
