"""Camera geometry and image resampling as pure JAX functions.

TPU-native replacements for the reference's warping stack
(/root/reference/depth_pose_prediction/networks/layers.py:51-104 and the
grid_sample / interpolate calls at depth_pose_prediction.py:976-1017).

All image tensors are NHWC (TPU-native layout).  The samplers reproduce the
exact corner conventions of the reference ops:

* `bilinear_sampler`    == F.grid_sample(mode='bilinear', padding_mode='border',
                           align_corners=True)
* `resize_bilinear`     == F.interpolate(mode='bilinear', align_corners=False)
* `resize_nearest`      == F.interpolate(mode='nearest')

Matching these is required for depth abs-rel parity with the reference.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Pose/projection matmuls are tiny but sub-pixel sensitive: bf16 MXU passes
# (the TPU default for f32) shift warp coordinates by ~0.1 px and break
# photometric parity, so these always run at full f32 precision.
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """Homogeneous pixel grid (3, H*W): rows are (x, y, 1).

    Same ordering as the reference's cached `BackprojectDepth.pix_coords`
    (networks/layers.py:61-72).
    """
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    ones = jnp.ones((height * width,), dtype=dtype)
    return jnp.stack([gx.reshape(-1), gy.reshape(-1), ones], axis=0)


def backproject_depth(depth: jax.Array, inv_K: jax.Array, pix: jax.Array) -> jax.Array:
    """Depth image -> homogeneous camera-frame point cloud.

    Args:
      depth: (B, H, W) or (B, H, W, 1) depth map.
      inv_K: (B, 4, 4) inverse intrinsics (only the top-left 3x3 is used).
      pix:   (3, H*W) homogeneous pixel grid from `pixel_grid`.

    Returns:
      (B, 4, H*W) homogeneous points — matches BackprojectDepth.forward
      (networks/layers.py:74-79).
    """
    B = depth.shape[0]
    d = depth.reshape(B, 1, -1)
    cam = _mm(inv_K[:, :3, :3], pix[None])  # (B, 3, HW)
    cam = d * cam
    ones = jnp.ones((B, 1, cam.shape[-1]), dtype=cam.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def project_3d(
    points: jax.Array,
    K: jax.Array,
    T: jax.Array,
    height: int,
    width: int,
    eps: float = 1e-3,
) -> jax.Array:
    """Project homogeneous 3D points into pixel coordinates of a camera at T.

    Args:
      points: (B, 4, H*W) from `backproject_depth`.
      K: (B, 4, 4) intrinsics.  T: (B, 4, 4) camera-to-camera transform.

    Returns:
      (B, H, W, 2) raw pixel coordinates (x, y) — *not* normalised to [-1, 1];
      `bilinear_sampler` consumes pixel units directly.  Equivalent to
      Project3D.forward (networks/layers.py:93-104) before its normalisation.
    """
    P = _mm(K, T)[:, :3, :]  # (B, 3, 4)
    cam = _mm(P, points)  # (B, 3, HW)
    # Gradient-stable depth clamp: the reference divides by (z + 1e-7)
    # (layers.py:98), which still yields ~1/z^2 = 1e14 gradients when points
    # land behind the camera (z <= 0) during aggressive adaptation — the NaN
    # path.  max(z, eps) gives identical values for all valid points and
    # zero gradient for degenerate ones (whose warp clamps to border anyway).
    z = jnp.maximum(cam[:, 2:3, :], eps)
    xy = cam[:, :2, :] / z
    B = points.shape[0]
    return xy.reshape(B, 2, height, width).transpose(0, 2, 3, 1)


def projection_affine(K: jax.Array, inv_K: jax.Array, T: jax.Array) -> jax.Array:
    """Collapse backproject+project into a per-sample affine camera map.

    With P = (K @ T)[:, :3, :] and r = inv_K33 @ [u, v, 1], the chain
    `project_3d(backproject_depth(d, inv_K, pix), K, T)` computes
    cam = d * (P33 @ inv_K33) @ [u, v, 1] + P[:, 3] followed by the
    z-clamped perspective divide.  This returns those constants packed as
    (B, 12): A = P33 @ inv_K33 row-major in columns 0..8, b = P[:, 3] in
    columns 9..11 — the SMEM operand of the in-kernel-projection warp
    (ops/pallas_warp.py::pallas_warp_tall_proj).  Same algebra as
    BackprojectDepth + Project3D (reference networks/layers.py:51-104),
    equal to the two-op chain up to f32 association.
    """
    P = _mm(K, T)[:, :3, :]  # (B, 3, 4)
    A = _mm(P[:, :, :3], inv_K[:, :3, :3])
    B = K.shape[0]
    return jnp.concatenate([A.reshape(B, 9), P[:, :, 3]], axis=1)


def normalize_pixel_coords(coords: jax.Array, height: int, width: int) -> jax.Array:
    """Pixel coords (B, H, W, 2) -> [-1, 1] grid (align_corners=True)."""
    x = coords[..., 0] / (width - 1)
    y = coords[..., 1] / (height - 1)
    return jnp.stack([(x - 0.5) * 2.0, (y - 0.5) * 2.0], axis=-1)


def bilinear_sampler(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sampling with border padding (grid_sample parity).

    Args:
      img:    (B, H, W, C) source image.
      coords: (B, Ho, Wo, 2) sampling locations in *pixel units* (x, y) of the
              source image.  Equivalent to grid_sample with align_corners=True
              after denormalising the grid: x_pix = (gx + 1) / 2 * (W - 1).

    Returns:
      (B, Ho, Wo, C) sampled image.

    Implementation: ONE `lax.gather` of 2x2xC patches per call instead of four
    scalar-pixel gathers — the patch start is clamped to [0, dim-2], which is
    exactly equivalent at the border (the shifted-window weight lands entirely
    on the border texel) and quarters the gather count, the dominant memory
    traffic of the warp stage on TPU.

    uint8 sources are gathered AS uint8 (4x less HBM traffic on the gather
    output — the dominant bytes of the whole adapt step) and converted to
    f32 in [0, 1] after the gather.  This is exact: bilinear interpolation is
    linear, so interpolate(img/255) == interpolate(img)/255, and the weights
    wx/wy are f32 either way.  Gradients are unaffected — the photometric
    loss only needs d(warp)/d(coords) (through wx/wy); the source image is a
    leaf input, so no cotangent flows into the gather operand.
    """
    B, H, W, C = img.shape
    _, Ho, Wo, _ = coords.shape
    src_is_u8 = img.dtype == jnp.uint8
    x = jnp.clip(coords[..., 0], 0.0, W - 1)
    y = jnp.clip(coords[..., 1], 0.0, H - 1)

    x0 = jnp.minimum(jnp.floor(x), W - 2)
    y0 = jnp.minimum(jnp.floor(y), H - 2)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    starts = jnp.stack(
        [y0.reshape(B, -1), x0.reshape(B, -1)], axis=-1
    ).astype(jnp.int32)  # (B, HoWo, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patches = jax.lax.gather(
        img, starts, dn, slice_sizes=(1, 2, 2, C)
    ).reshape(B, Ho, Wo, 2, 2, C)
    if src_is_u8:
        patches = patches.astype(jnp.float32) * (1.0 / 255.0)

    top = patches[..., 0, 0, :] * (1 - wx) + patches[..., 0, 1, :] * wx
    bot = patches[..., 1, 0, :] * (1 - wx) + patches[..., 1, 1, :] * wx
    return top * (1 - wy) + bot * wy


def resize_bilinear(img: jax.Array, height: int, width: int) -> jax.Array:
    """NHWC bilinear resize matching F.interpolate(align_corners=False).

    Source coordinate of output pixel i is (i + 0.5) * (in/out) - 0.5, clamped
    edges — the torch/TF 'half-pixel' convention used for the disparity
    upsample at depth_pose_prediction.py:989-991 (jax.image.resize('linear')
    uses the same convention).
    """
    B, H, W, C = img.shape
    if (H, W) == (height, width):
        return img
    return jax.image.resize(img, (B, height, width, C), method="linear")


def resize_nearest(img: jax.Array, height: int, width: int) -> jax.Array:
    """NHWC nearest resize matching F.interpolate(mode='nearest').

    torch 'nearest' picks src = floor(dst * in/out); for exact 2x upsampling
    (the only use in the decoder, depth_decoder.py:61-64) this equals element
    repetition, which is also what jax.image.resize('nearest') produces.
    """
    B, H, W, C = img.shape
    if (H, W) == (height, width):
        return img
    if height % H == 0 and width % W == 0:
        # Exact integer upsample: pure repeat (cheap, layout friendly).
        img = jnp.repeat(img, height // H, axis=1)
        return jnp.repeat(img, width // W, axis=2)
    # General case: floor(dst * in/out) gather per axis.
    src_y = (jnp.arange(height) * H // height).astype(jnp.int32)
    src_x = (jnp.arange(width) * W // width).astype(jnp.int32)
    return img[:, src_y][:, :, src_x]


def scale_camera_matrix(camera_matrix: jax.Array, height: int, width: int):
    """Normalised intrinsics -> pixel intrinsics at (height, width), plus inverse.

    Mirrors Dataset._scale_camera_matrix (datasets/utils.py:104-110): the
    stored matrix has fx, cx in units of image width and fy, cy in units of
    image height.
    """
    K = jnp.asarray(camera_matrix)
    K = K.at[0, :].multiply(width)
    K = K.at[1, :].multiply(height)
    return K, jnp.linalg.inv(K)


@partial(jax.jit, static_argnames=("height", "width"))
def warp_frame(
    src: jax.Array,
    depth: jax.Array,
    K: jax.Array,
    inv_K: jax.Array,
    T: jax.Array,
    *,
    height: int,
    width: int,
) -> jax.Array:
    """Full inverse-warp: depth + relative pose -> src resampled into target.

    One fused op chain (backproject -> project -> bilinear gather); under jit
    XLA fuses the elementwise stages, leaving two small matmuls and a gather.
    """
    pix = pixel_grid(height, width, dtype=src.dtype)
    points = backproject_depth(depth, inv_K, pix)
    coords = project_3d(points, K, T, height, width)
    return bilinear_sampler(src, coords)
