from tpuslam.memory.index import CosineIndex, batched_cosine_topk, normalize_l2
from tpuslam.memory.replay_buffer import ReplayBuffer

__all__ = ["CosineIndex", "ReplayBuffer", "batched_cosine_topk", "normalize_l2"]
