from tpuslam.slam.slam import Slam

__all__ = ["Slam"]
