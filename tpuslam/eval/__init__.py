from tpuslam.eval.depth import calc_depth_error
from tpuslam.eval.trajectory import (
    average_segment_errors,
    calc_error,
    compute_ate,
    compute_rpe,
    overall_error,
    rotation_error,
    scale_optimization,
    sequence_errors,
    translation_error,
)

__all__ = [
    "average_segment_errors",
    "calc_depth_error",
    "calc_error",
    "compute_ate",
    "compute_rpe",
    "overall_error",
    "rotation_error",
    "scale_optimization",
    "sequence_errors",
    "translation_error",
]
