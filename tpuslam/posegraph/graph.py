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

    # ------------------------------------------------------------- building
    def add_vertex(self, vertex_id: int, pose: np.ndarray, fixed: bool = False):
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

    # -------------------------------------------------------------- queries
    def get_pose(self, vertex_id: int) -> np.ndarray:
        return self._poses[vertex_id].copy()

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
        g = pad_graph(
            poses,
            fixed,
            edges,
            Z,
            info,
            vertex_bucket=bucket_size(len(ids)),
            edge_bucket=bucket_size(max(len(edges), 1)),
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
        'auto' (native when the shared library builds, else jax).
        `max_iterations` counts LM iterations (the reference passes 10000 to
        g2o, which terminates early; accept/reject LM plateaus in far fewer —
        capped for bounded compile/runtime)."""
        if not self._edges:
            return 0.0
        max_iterations = min(max_iterations, 50)

        if backend == "auto":
            from tpuslam.posegraph import native

            backend = "native" if native.is_available() else "jax"

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
            out, err = lm_optimize(g, max_iterations=max_iterations)
            poses = np.asarray(out, np.float64)
            err = float(err)

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
