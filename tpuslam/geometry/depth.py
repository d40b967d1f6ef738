"""Disparity <-> depth conversion (monodepth2 convention).

Reference: depth_pose_prediction/utils.py:120-142.  The adapt config runs with
min_depth=0.1, max_depth=None -> depth = min_depth / disp.

Stability note: with max_depth=None the reference divides by the raw sigmoid
output, which *underflows to exactly 0* in f32 once the decoder saturates
(logits < -103) -> infinite depth -> NaN coordinates -> NaN gradients (the
reference would hard-crash via its NaN check).  A disparity floor of 1e-4
(depth cap 10 km) leaves every non-degenerate value bit-identical and gives
the saturated region zero gradient instead of inf.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_DISP_FLOOR = 1e-4


def disp_to_depth(
    disp: jax.Array,
    min_depth: Optional[float] = None,
    max_depth: Optional[float] = None,
) -> jax.Array:
    if min_depth is None and max_depth is None:
        return 1.0 / jnp.maximum(disp, _DISP_FLOOR)
    if max_depth is None:
        return min_depth / jnp.maximum(disp, _DISP_FLOOR)
    if min_depth is None:
        raise ValueError("min_depth is None while max_depth is set")
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return 1.0 / scaled_disp


def depth_to_disp(
    depth: float,
    min_depth: Optional[float] = None,
    max_depth: Optional[float] = None,
) -> float:
    """Exact inverse of `disp_to_depth` for a scalar target (all three
    mapping branches).  Used to express the anti-collapse scale prior as a
    metric target depth independent of the configured disparity mapping."""
    if min_depth is None and max_depth is None:
        return 1.0 / depth
    if max_depth is None:
        return min_depth / depth
    if min_depth is None:
        raise ValueError("min_depth is None while max_depth is set")
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    return (1.0 / depth - min_disp) / (max_disp - min_disp)
