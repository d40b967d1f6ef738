"""Flax ResNet-18/34 feature-pyramid encoder (NHWC, TPU-native).

Behavioural spec from the reference encoder
(/root/reference/depth_pose_prediction/networks/resnet_encoder.py:79-125):
input normalisation (x - 0.45) / 0.225 baked into the forward pass, five
feature stages with channels (64, 64, 128, 256, 512), and a multi-image stem
(conv1 with 3*num_input_images channels) for the pose network.

Module/parameter names mirror the torchvision layout (`conv1`, `bn1`,
`layer1.0.conv1`, ...) so reference `.pth` checkpoints map 1:1 through
`tpuslam.checkpoint.torch_import`.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_BN = dict(momentum=0.9, epsilon=1e-5)

RESNET_STAGES = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}
ENCODER_CHANNELS = (64, 64, 128, 256, 512)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32
    # cross-device BN statistic sync (sync-BN): under the DP mesh this names
    # the mesh axis so train-mode normalisation uses GLOBAL batch statistics
    # — the sharded step then reproduces the single-device update exactly
    # (DataParallel in the reference normalises per-GPU and only keeps
    # device-0 running stats; this is strictly stronger)
    bn_axis: str = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        bn = dict(dtype=self.dtype, axis_name=self.bn_axis, **_BN)
        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=self.strides, padding=1,
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1", **bn)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2"
        )(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2", **bn)(y)
        if residual.shape[-1] != self.features or self.strides != 1:
            residual = nn.Conv(
                self.features, (1, 1), strides=self.strides, padding=0,
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, name="downsample_bn", **bn
            )(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """Five-stage feature pyramid; `num_input_images` stacks RGB channel-wise."""

    num_layers: int = 18
    num_input_images: int = 1
    dtype: jnp.dtype = jnp.float32
    bn_axis: str = None  # sync-BN mesh axis (see BasicBlock.bn_axis)

    @property
    def num_ch_encoder(self) -> Tuple[int, ...]:
        return ENCODER_CHANNELS

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Sequence[jax.Array]:
        """x: (B, H, W, 3 * num_input_images) in [0, 1] -> 5 feature maps."""
        if self.num_layers not in RESNET_STAGES:
            raise ValueError(f"Unsupported ResNet depth: {self.num_layers}")
        stages = RESNET_STAGES[self.num_layers]

        x = (x - 0.45) / 0.225
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=2, padding=3, use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype,
            axis_name=self.bn_axis, name="bn1", **_BN,
        )(x)
        f0 = nn.relu(x)

        x = nn.max_pool(f0, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        features = [f0]
        for stage_i, (blocks, ch) in enumerate(zip(stages, ENCODER_CHANNELS[1:])):
            for block_i in range(blocks):
                strides = 2 if (stage_i > 0 and block_i == 0) else 1
                x = BasicBlock(
                    ch, strides=strides, dtype=self.dtype, bn_axis=self.bn_axis,
                    name=f"layer{stage_i + 1}_{block_i}",
                )(x, train)
            features.append(x)
        return [f.astype(jnp.float32) for f in features]
