"""Wavefront OBJ export for point clouds / trajectories / pose graphs.

Functional equivalent of the reference's MeshlabInf writer
(/root/reference/slam/meshlab.py:14-206): accumulate colored points and line
segments, write a single OBJ consumable by MeshLab.  Lines are emitted as
OBJ `l` elements (polyline) instead of degenerate faces.
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Union

import numpy as np


class MeshlabExporter:
    def __init__(self):
        self._points: List[np.ndarray] = []  # (N, 6) xyz + rgb
        self._lines: List[np.ndarray] = []  # (2, 3) segment endpoints

    def add_points(
        self, points: np.ndarray, color: Optional[np.ndarray] = None
    ) -> None:
        """points: (3,) or (N, 3) or (N, 6) with per-point RGB in [0, 1]."""
        pts = np.atleast_2d(np.asarray(points, np.float64))
        if pts.shape[1] == 3:
            c = np.ones((len(pts), 3)) if color is None else np.atleast_2d(color)
            c = np.broadcast_to(c, (len(pts), 3))
            pts = np.concatenate([pts, c], axis=1)
        elif pts.shape[1] != 6:
            raise ValueError("points must be (N, 3) or (N, 6)")
        self._points.append(pts)

    def add_line(self, start: np.ndarray, end: np.ndarray) -> None:
        self._lines.append(
            np.stack([np.asarray(start, np.float64), np.asarray(end, np.float64)])
        )

    def add_camera(
        self, position: np.ndarray, rotation: Optional[np.ndarray] = None, size: float = 0.5
    ) -> None:
        """Draw a small camera frustum (4 lines from apex to image corners)."""
        pos = np.asarray(position, np.float64)
        R = np.eye(3) if rotation is None else np.asarray(rotation, np.float64)
        corners = (
            np.array(
                [[-1, -0.6, 1.5], [1, -0.6, 1.5], [1, 0.6, 1.5], [-1, 0.6, 1.5]]
            )
            * size
        )
        world = corners @ R.T + pos
        for c in world:
            self.add_line(pos, c)
        for a, b in zip(world, np.roll(world, 1, axis=0)):
            self.add_line(a, b)

    def write(self, filename: Union[str, Path], verbose: bool = True) -> Path:
        path = Path(filename)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            f.write("# tpuslam OBJ export\n")
            for block in self._points:
                for x, y, z, r, g, b in block:
                    f.write(f"v {x:.6f} {y:.6f} {z:.6f} {r:.4f} {g:.4f} {b:.4f}\n")
            base = sum(len(b) for b in self._points)
            for k, seg in enumerate(self._lines):
                for x, y, z in seg:
                    f.write(f"v {x:.6f} {y:.6f} {z:.6f}\n")
                a = base + 2 * k + 1
                f.write(f"l {a} {a + 1}\n")
        if verbose:
            print(f"wrote {path}")
        return path


def norm_range_01(values: np.ndarray) -> np.ndarray:
    """Normalise to [0, 1] (reference meshlab.py:209-229)."""
    values = np.asarray(values, np.float64)
    lo, hi = values.min(), values.max()
    if hi - lo < 1e-12:
        return np.zeros_like(values)
    return (values - lo) / (hi - lo)


def false_color(values: np.ndarray) -> np.ndarray:
    """Map scalars to a simple blue->red colormap -> (N, 3)."""
    t = norm_range_01(values)
    return np.stack([t, 0.2 * np.ones_like(t), 1.0 - t], axis=-1)
