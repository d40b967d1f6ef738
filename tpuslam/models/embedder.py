"""Image embedding networks for retrieval (replay buffer & loop closure).

The reference uses a frozen torchvision MobileNetV3-small truncated at its
flatten node (576-d, /root/reference/loop_closure_detection/encoder.py:28-33)
plus the depth encoder's mean-pooled stage-4 feature for the replay buffer
(/root/reference/slam/slam.py:143-147).

Here both are first-class:

* `MobileNetV3SmallEmbedder` — a faithful Flax MobileNetV3-small backbone
  (hard-swish / SE blocks) with ImageNet normalisation baked in, 576-d
  output.  Weights import from a torchvision mobilenet_v3_small checkpoint
  via `tpuslam.checkpoint.torch_import.load_mobilenet_embedder` (wired to
  `LoopClosureConfig.embedder_weights`); without a checkpoint the init is
  random and Slam prints a warning — the 0.99 detection threshold is
  calibrated for ImageNet features.
* The depth-encoder stage-4 pooled feature (512-d) is produced directly by
  the fused adapt step (`tpuslam.train.adapt`), costing zero extra FLOPs —
  the TPU-native default for the replay buffer.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_BN = dict(momentum=0.99, epsilon=1e-3)  # torchvision mobilenet BN settings

_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])

# (kernel, expanded, out, use_se, use_hs, stride) — mobilenet_v3_small spec
_V3_SMALL = (
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
)


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def _hard_swish(x):
    return x * _hard_sigmoid(x)


class _SqueezeExcite(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        squeeze = _make_divisible(self.channels // 4)
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(squeeze, (1, 1), dtype=self.dtype, name="fc1")(s))
        s = _hard_sigmoid(nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(s))
        return x * s


class _InvertedResidual(nn.Module):
    kernel: int
    expanded: int
    out: int
    use_se: bool
    use_hs: bool
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        act = _hard_swish if self.use_hs else nn.relu
        inp = x.shape[-1]
        y = x
        if self.expanded != inp:
            y = nn.Conv(self.expanded, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name="expand_bn", **_BN)(y)
            y = act(y)
        pad = self.kernel // 2
        y = nn.Conv(
            self.expanded, (self.kernel, self.kernel), strides=self.stride, padding=pad,
            feature_group_count=self.expanded, use_bias=False, dtype=self.dtype, name="dw",
        )(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="dw_bn", **_BN)(y)
        y = act(y)
        if self.use_se:
            y = _SqueezeExcite(self.expanded, dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype, name="project")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="project_bn", **_BN)(y)
        if self.stride == 1 and inp == self.out:
            y = y + x
        return y


class MobileNetV3SmallEmbedder(nn.Module):
    """MobileNetV3-small backbone -> global-pool -> 576-d embedding."""

    dtype: jnp.dtype = jnp.float32
    num_features: int = 576

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B, H, W, 3) in [0, 1] -> (B, 576) embedding (not normalised)."""
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        x = x.astype(self.dtype)
        x = nn.Conv(16, (3, 3), strides=2, padding=1, use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn", **_BN)(x)
        x = _hard_swish(x)
        for i, cfg in enumerate(_V3_SMALL):
            x = _InvertedResidual(*cfg, dtype=self.dtype, name=f"block_{i}")(x, train)
        x = nn.Conv(self.num_features, (1, 1), use_bias=False, dtype=self.dtype, name="head")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="head_bn", **_BN)(x)
        x = _hard_swish(x)
        return x.astype(jnp.float32).mean(axis=(1, 2))


def l2_normalize(features: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalise so inner products become cosine similarities
    (replaces faiss.normalize_L2, replay_buffer.py:100)."""
    norm = jnp.linalg.norm(features, axis=axis, keepdims=True)
    return features / jnp.maximum(norm, eps)
