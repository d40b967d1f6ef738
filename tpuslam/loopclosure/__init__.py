from tpuslam.loopclosure.detection import LoopClosureDetection

__all__ = ["LoopClosureDetection"]
