"""The flagship model: four networks bundled into one Flax module.

Mirrors the reference's model dict {depth_encoder, depth_decoder,
pose_encoder, pose_decoder}
(/root/reference/depth_pose_prediction/depth_pose_prediction.py:128-137) as a
single parameter tree so the fused train/adapt step is one jitted function
and the encoder/decoder partition (for frozen-encoder online adaptation,
reference :807-827) is a simple top-level path mask.
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuslam.models.decoders import DepthDecoder, PoseDecoder
from tpuslam.models.resnet import ResNetEncoder


class DepthPoseNet(nn.Module):
    """Depth + pose networks with a monodepth2-compatible interface.

    Methods are exposed through `__call__(..., method=...)`-free sub-apply:
    use `model.apply(vars, x, train, method=DepthPoseNet.depth_forward)` etc.
    """

    resnet_depth: int = 18
    resnet_pose: int = 18
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: jnp.dtype = jnp.float32
    # sync-BN axis for DP pretraining (normalise with GLOBAL batch stats so
    # the sharded step equals the single-device one; see resnet.BasicBlock)
    bn_axis: str = None

    def setup(self):
        self.depth_encoder = ResNetEncoder(
            self.resnet_depth, num_input_images=1, dtype=self.dtype,
            bn_axis=self.bn_axis, name="depth_encoder"
        )
        self.depth_decoder = DepthDecoder(
            scales=self.scales, dtype=self.dtype, name="depth_decoder"
        )
        self.pose_encoder = ResNetEncoder(
            self.resnet_pose, num_input_images=2, dtype=self.dtype,
            bn_axis=self.bn_axis, name="pose_encoder"
        )
        self.pose_decoder = PoseDecoder(
            num_frames_to_predict_for=2, dtype=self.dtype, name="pose_decoder"
        )

    def __call__(self, image: jax.Array, image_pair: jax.Array, train: bool = False):
        """Joint forward used for initialisation: disparity pyramid + pose."""
        disps, feat4 = self.depth_forward(image, train)
        axis_angle, translation = self.pose_forward(image_pair, train)
        return disps, feat4, axis_angle, translation

    def depth_forward(self, image: jax.Array, train: bool = False):
        """image (B, H, W, 3) -> ({('disp', s)}, pooled stage-4 feature (B, 512)).

        The pooled feature doubles as the replay-buffer embedding
        (reference slam/slam.py:143-147) at zero extra cost.
        """
        features = self.depth_encode(image, train)
        disps = self.depth_decode(features)
        feat4 = features[-1].mean(axis=(1, 2))
        return disps, feat4

    def pose_forward(self, image_pair: jax.Array, train: bool = False):
        """image_pair (B, H, W, 6) [earlier frame ++ later frame, channel cat]
        -> (axis_angle (B, 3), translation (B, 3)) for the first predicted
        frame — matches the reference taking `[:, 0]`
        (depth_pose_prediction.py:965)."""
        features = self.pose_encode(image_pair, train)
        return self.pose_decode(features[-1])

    # Encoder/decoder halves exposed separately: during frozen-encoder online
    # adaptation (reference _set_adapt, depth_pose_prediction.py:807-827) the
    # encoder outputs are invariant across the K adaptation iterations, so the
    # fused adapt step encodes once and scans only over the decoder halves.
    def depth_encode(self, image: jax.Array, train: bool = False):
        """image (B, H, W, 3) -> list of 5 encoder feature maps."""
        return self.depth_encoder(image, train)

    def depth_decode(self, features):
        """Encoder feature pyramid -> {('disp', s)} sigmoid disparities."""
        return self.depth_decoder(features)

    def pose_encode(self, image_pair: jax.Array, train: bool = False):
        """image_pair (B, H, W, 6) -> list of 5 encoder feature maps."""
        return self.pose_encoder(image_pair, train)

    def pose_decode(self, feature):
        """Stage-4 pose feature -> (axis_angle (B, 3), translation (B, 3))."""
        axis_angle, translation = self.pose_decoder(feature)
        return axis_angle[:, 0], translation[:, 0]


def init_depth_pose(
    rng: jax.Array,
    *,
    height: int,
    width: int,
    resnet_depth: int = 18,
    resnet_pose: int = 18,
    scales: Tuple[int, ...] = (0, 1, 2, 3),
    dtype: jnp.dtype = jnp.float32,
) -> Tuple[DepthPoseNet, Dict]:
    """Build the module and initialise its variables (params + batch_stats)."""
    model = DepthPoseNet(
        resnet_depth=resnet_depth, resnet_pose=resnet_pose, scales=scales, dtype=dtype
    )
    image = jnp.zeros((1, height, width, 3), jnp.float32)
    pair = jnp.zeros((1, height, width, 6), jnp.float32)
    variables = model.init(rng, image, pair, train=False)
    return model, variables


def encoder_path_mask(params: Dict) -> Dict:
    """Pytree mask: True for encoder params (to freeze during adaptation)."""
    return {
        top: jax.tree_util.tree_map(lambda _: "encoder" in top, sub)
        for top, sub in params.items()
    }
