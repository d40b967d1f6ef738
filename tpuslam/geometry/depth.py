"""Disparity <-> depth conversion (monodepth2 convention).

Reference: depth_pose_prediction/utils.py:120-142.  The adapt config runs with
min_depth=0.1, max_depth=None -> depth = min_depth / disp.
"""
from __future__ import annotations

from typing import Optional

import jax


def disp_to_depth(
    disp: jax.Array,
    min_depth: Optional[float] = None,
    max_depth: Optional[float] = None,
) -> jax.Array:
    if min_depth is None and max_depth is None:
        return 1.0 / disp
    if max_depth is None:
        return min_depth / disp
    if min_depth is None:
        raise ValueError("min_depth is None while max_depth is set")
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return 1.0 / scaled_disp
