"""Device batch layout for the fused steps.

One frame triplet per sample, NHWC, static shapes.  The frame axis is ordered
(-1, 0, 1); `rel_dist[:, 0]` is the -1 -> 0 distance and `rel_dist[:, 1]` the
0 -> 1 distance (reference data contract, datasets/kitti.py:302-304).

`weights` realises the reference's per-sample loss weights
(depth_pose_prediction.py:297-305) and doubles as the padding mechanism: a
replay batch smaller than the static batch size is padded with zero-weight
samples so the jitted step never recompiles.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

FRAME_AXIS = (-1, 0, 1)  # order of the frame dimension


class FrameBatch(struct.PyTreeNode):
    """Device batch.  Images may be stored as uint8: the host->device
    transfer is 4x smaller (source images are 8-bit camera data, so this is
    lossless for real datasets), and `frame()` converts to f32 in [0, 1]
    on-device inside the jitted step."""

    rgb: jax.Array  # (B, 3, H, W, 3) uint8 or f32 [0,1], frames (-1, 0, 1)
    rgb_aug: jax.Array  # (B, 3, H, W, 3) color-jittered network input
    K: jax.Array  # (B, 4, 4) pixel-unit intrinsics at full resolution
    inv_K: jax.Array  # (B, 4, 4)
    rel_dist: jax.Array  # (B, 2) relative distances for frames (0, 1)
    weights: jax.Array  # (B,) per-sample loss weights (sum to 1)
    mask: jax.Array  # (B, H, W) dynamic-object mask of frame 0 (1 = dynamic)

    @property
    def batch_size(self) -> int:
        return self.rgb.shape[0]

    @property
    def height(self) -> int:
        return self.rgb.shape[2]

    @property
    def width(self) -> int:
        return self.rgb.shape[3]

    def frame(self, frame_id: int, aug: bool = False) -> jax.Array:
        idx = FRAME_AXIS.index(frame_id)
        img = (self.rgb_aug if aug else self.rgb)[:, idx]
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        return img

    def first(self, n: int = 1) -> "FrameBatch":
        """Leading-sample slice with renormalised weights (used to derive the
        online/eval sub-batch from a combined batch on device)."""
        return FrameBatch(
            rgb=self.rgb[:n],
            rgb_aug=self.rgb_aug[:n],
            K=self.K[:n],
            inv_K=self.inv_K[:n],
            rel_dist=self.rel_dist[:n],
            weights=jnp.full((n,), 1.0 / n, jnp.float32),
            mask=self.mask[:n],
        )


def make_frame_batch(
    rgb: np.ndarray,
    K: np.ndarray,
    rel_dist: np.ndarray,
    rgb_aug: Optional[np.ndarray] = None,
    weights: Optional[np.ndarray] = None,
    mask: Optional[np.ndarray] = None,
    quantize: bool = True,
) -> FrameBatch:
    """Host-side constructor with defaulting (aug=rgb, uniform weights,
    empty dynamic mask).

    `quantize=True` (default) ships images as uint8 — a 4x smaller
    host->device transfer, lossless for 8-bit source imagery (float inputs
    are rounded to the nearest 1/255 level, matching camera quantisation);
    the jitted step converts back to f32 on device."""
    rgb = np.asarray(rgb)
    B, _, H, W, _ = rgb.shape
    if rgb_aug is None:
        rgb_aug = rgb
    if weights is None:
        weights = np.full((B,), 1.0 / B, np.float32)
    if mask is None:
        mask = np.zeros((B, H, W), np.float32)
    K = np.asarray(K, np.float32)
    if K.ndim == 2:
        K = np.broadcast_to(K, (B, 4, 4))
    inv_K = np.linalg.inv(K)

    def prep(img):
        img = np.asarray(img)
        if img.dtype == np.uint8:
            return img
        if quantize:
            return np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
        return img.astype(np.float32)

    prgb = prep(rgb)
    # aug defaults to the same array (no-augmentation paths): skip the
    # second full-image quantisation pass AND the second transfer — the
    # device-side aliasing is safe (the step never writes batch arrays)
    paug = prgb if rgb_aug is rgb else prep(rgb_aug)
    return FrameBatch(
        rgb=jnp.asarray(prgb),
        rgb_aug=jnp.asarray(paug),
        K=jnp.asarray(K),
        inv_K=jnp.asarray(inv_K.astype(np.float32)),
        rel_dist=jnp.asarray(np.asarray(rel_dist, np.float32)),
        weights=jnp.asarray(np.asarray(weights, np.float32)),
        mask=jnp.asarray(np.asarray(mask, np.float32)),
    )


def pad_batch(batch: FrameBatch, target_size: int) -> FrameBatch:
    """Pad to `target_size` samples with zero-weight copies of sample 0.

    Keeps the jitted step shape-static when the replay buffer holds fewer
    samples than batch_size - 1 (SURVEY.md 'hard parts': padded replay batch).
    """
    B = batch.batch_size
    if B == target_size:
        return batch
    if B > target_size:
        raise ValueError(f"batch size {B} exceeds target {target_size}")
    pad = target_size - B

    def pad_arr(x):
        return jnp.concatenate([x, jnp.repeat(x[:1], pad, axis=0)], axis=0)

    return FrameBatch(
        rgb=pad_arr(batch.rgb),
        rgb_aug=pad_arr(batch.rgb_aug),
        K=pad_arr(batch.K),
        inv_K=pad_arr(batch.inv_K),
        rel_dist=pad_arr(batch.rel_dist),
        weights=jnp.concatenate(
            [batch.weights, jnp.zeros((pad,), batch.weights.dtype)], axis=0
        ),
        mask=pad_arr(batch.mask),
    )


def concat_batches(a: FrameBatch, b: FrameBatch) -> FrameBatch:
    """Concatenate along the sample axis (online ++ replay, slam/slam.py:301-309).

    Each side's weights sum to 1; they are scaled by its share of the combined
    batch so the default (uniform within each side) yields the reference's
    uniform 1/B weighting over the whole batch (depth_pose_prediction.py:1032)
    while intentional non-uniform weights within a side are preserved."""
    Ba, Bb = a.batch_size, b.batch_size
    w = jnp.concatenate(
        [a.weights * (Ba / (Ba + Bb)), b.weights * (Bb / (Ba + Bb))]
    )
    return FrameBatch(
        rgb=jnp.concatenate([a.rgb, b.rgb]),
        rgb_aug=jnp.concatenate([a.rgb_aug, b.rgb_aug]),
        K=jnp.concatenate([a.K, b.K]),
        inv_K=jnp.concatenate([a.inv_K, b.inv_K]),
        rel_dist=jnp.concatenate([a.rel_dist, b.rel_dist]),
        weights=w,
        mask=jnp.concatenate([a.mask, b.mask]),
    )
