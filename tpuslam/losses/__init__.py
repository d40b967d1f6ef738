from tpuslam.losses.photometric import (
    normalize_disp,
    reprojection_loss,
    smooth_loss,
    ssim,
    total_loss,
    velocity_loss,
)

__all__ = [
    "normalize_disp",
    "reprojection_loss",
    "smooth_loss",
    "ssim",
    "total_loss",
    "velocity_loss",
]
