from tpuslam.ops.pallas_warp import pallas_warp

__all__ = ["pallas_warp"]
