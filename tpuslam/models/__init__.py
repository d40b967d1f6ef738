from tpuslam.models.decoders import DECODER_CHANNELS, DepthDecoder, PoseDecoder
from tpuslam.models.depth_pose import DepthPoseNet, encoder_path_mask, init_depth_pose
from tpuslam.models.embedder import MobileNetV3SmallEmbedder, l2_normalize
from tpuslam.models.resnet import ENCODER_CHANNELS, BasicBlock, ResNetEncoder

__all__ = [
    "BasicBlock",
    "DECODER_CHANNELS",
    "DepthDecoder",
    "DepthPoseNet",
    "ENCODER_CHANNELS",
    "MobileNetV3SmallEmbedder",
    "PoseDecoder",
    "ResNetEncoder",
    "encoder_path_mask",
    "init_depth_pose",
    "l2_normalize",
]
