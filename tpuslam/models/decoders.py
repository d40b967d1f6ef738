"""Flax depth (U-Net) and pose decoders (NHWC).

Behavioural spec from the reference decoders
(/root/reference/depth_pose_prediction/networks/depth_decoder.py:51-71 and
pose_decoder.py:37-54): five up-stages of ConvBlock -> nearest x2 upsample ->
skip concat -> ConvBlock with sigmoid disparity heads at the requested scales;
pose head is squeeze-1x1 + three convs -> global mean -> 0.01 scaling ->
(axis_angle, translation) per predicted frame.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuslam.geometry.camera import resize_nearest

DECODER_CHANNELS = (16, 32, 64, 128, 256)


def _reflect_conv3x3(x: jax.Array, features: int, dtype, name: str) -> jax.Array:
    """Reflection-pad-1 + 3x3 valid conv (reference Conv3x3, layers.py:28-48)."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return nn.Conv(features, (3, 3), padding="VALID", dtype=dtype, name=name)(x)


class DepthDecoder(nn.Module):
    """U-Net decoder over the 5-stage encoder pyramid -> multi-scale disparity."""

    scales: Tuple[int, ...] = (0, 1, 2, 3)
    use_skips: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]) -> Dict[Tuple[str, int], jax.Array]:
        outputs: Dict[Tuple[str, int], jax.Array] = {}
        x = features[-1].astype(self.dtype)
        for i in range(4, -1, -1):
            x = _reflect_conv3x3(x, DECODER_CHANNELS[i], self.dtype, f"upconv_{i}_0_conv")
            x = nn.elu(x)
            if self.use_skips and i > 0:
                skip = features[i - 1].astype(self.dtype)
                # Upsample to the skip's spatial size (robust to odd sizes,
                # reference depth_decoder.py:58-62); nearest == x2 repeat here.
                x = resize_nearest(x, skip.shape[1], skip.shape[2])
                x = jnp.concatenate([x, skip], axis=-1)
            else:
                x = resize_nearest(x, x.shape[1] * 2, x.shape[2] * 2)
            x = _reflect_conv3x3(x, DECODER_CHANNELS[i], self.dtype, f"upconv_{i}_1_conv")
            x = nn.elu(x)
            if i in self.scales:
                disp = _reflect_conv3x3(x, 1, self.dtype, f"dispconv_{i}_conv")
                outputs[("disp", i)] = nn.sigmoid(disp.astype(jnp.float32))
        return outputs


class PoseDecoder(nn.Module):
    """Pose regression head on the last encoder stage.

    Returns (axis_angle, translation), each (B, num_frames_to_predict_for, 3),
    scaled by 0.01 as in the reference (pose_decoder.py:49-54).
    """

    num_frames_to_predict_for: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, last_feature: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x = last_feature.astype(self.dtype)
        x = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="squeeze")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="pose_0")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="pose_1")(x))
        x = nn.Conv(
            6 * self.num_frames_to_predict_for, (1, 1), dtype=self.dtype, name="pose_2"
        )(x)
        x = x.astype(jnp.float32).mean(axis=(1, 2))  # global average over H, W
        x = 0.01 * x.reshape(-1, self.num_frames_to_predict_for, 6)
        return x[..., :3], x[..., 3:]
