"""Camera op parity tests vs torch (CPU) — grid_sample / interpolate conventions."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tpuslam.geometry import (
    backproject_depth,
    bilinear_sampler,
    normalize_pixel_coords,
    pixel_grid,
    project_3d,
    resize_bilinear,
    resize_nearest,
    scale_camera_matrix,
    warp_frame,
)

H, W = 24, 40


def _rand_img(rng, b=2, h=H, w=W, c=3):
    return rng.uniform(size=(b, h, w, c)).astype(np.float32)


def test_bilinear_sampler_matches_grid_sample(rng):
    img = _rand_img(rng)
    # random sample coords, including out-of-range to exercise border padding
    coords = np.stack(
        [
            rng.uniform(-5, W + 5, size=(2, H, W)).astype(np.float32),
            rng.uniform(-5, H + 5, size=(2, H, W)).astype(np.float32),
        ],
        axis=-1,
    )
    ours = np.asarray(bilinear_sampler(jnp.asarray(img), jnp.asarray(coords)))

    grid = np.asarray(normalize_pixel_coords(jnp.asarray(coords), H, W))
    ref = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="border",
        align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resize_bilinear_matches_interpolate(rng):
    img = _rand_img(rng, h=12, w=20)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), H, W))
    ref = F.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        size=(H, W),
        mode="bilinear",
        align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resize_nearest_matches_interpolate(rng):
    img = _rand_img(rng, h=12, w=20)
    ours = np.asarray(resize_nearest(jnp.asarray(img), 24, 40))
    ref = F.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2), size=(24, 40), mode="nearest"
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=0)


def test_identity_warp_reproduces_image(rng):
    """Warping with identity pose and unit depth must reproduce the input."""
    img = _rand_img(rng, b=1)
    K, inv_K = scale_camera_matrix(
        np.array(
            [[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            dtype=np.float32,
        ),
        H,
        W,
    )
    depth = jnp.ones((1, H, W), dtype=jnp.float32) * 5.0
    out = warp_frame(
        jnp.asarray(img),
        depth,
        K[None],
        inv_K[None],
        jnp.eye(4)[None],
        height=H,
        width=W,
    )
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-4)


def test_project_backproject_inverse(rng):
    """project(backproject(depth)) with identity T must return the pixel grid."""
    K, inv_K = scale_camera_matrix(
        np.array(
            [[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            dtype=np.float32,
        ),
        H,
        W,
    )
    depth = jnp.asarray(rng.uniform(1.0, 50.0, size=(1, H, W)).astype(np.float32))
    pix = pixel_grid(H, W)
    pts = backproject_depth(depth, inv_K[None], pix)
    coords = np.asarray(project_3d(pts, K[None], jnp.eye(4)[None], H, W))
    gx, gy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    np.testing.assert_allclose(coords[0, ..., 0], gx, atol=1e-2)
    np.testing.assert_allclose(coords[0, ..., 1], gy, atol=1e-2)


def test_known_translation_shifts_image(rng):
    """A pure x-translation at constant depth shifts sampling by fx*tx/z px."""
    K, inv_K = scale_camera_matrix(
        np.array(
            [[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            dtype=np.float32,
        ),
        H,
        W,
    )
    z = 10.0
    tx = 1.0
    fx = float(K[0, 0])
    shift = fx * tx / z  # pixels
    T = jnp.eye(4).at[0, 3].set(tx)[None]
    depth = jnp.ones((1, H, W)) * z
    pts = backproject_depth(depth, inv_K[None], pixel_grid(H, W))
    coords = np.asarray(project_3d(pts, K[None], T, H, W))
    gx, _ = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    np.testing.assert_allclose(coords[0, ..., 0], gx + shift, atol=1e-2)


def test_disp_to_depth_saturated_sigmoid_stays_finite():
    """f32 sigmoid can underflow to exactly 0 on saturated decoders; depth and
    its gradient must stay finite (NaN regression, see geometry/depth.py)."""
    import jax

    from tpuslam.geometry import disp_to_depth

    disp = jnp.asarray([0.0, 1e-38, 1e-4, 0.5, 1.0])
    depth = disp_to_depth(disp, 0.1, None)
    assert bool(jnp.isfinite(depth).all())
    g = jax.grad(lambda d: disp_to_depth(d, 0.1, None).sum())(disp)
    assert bool(jnp.isfinite(g).all())
    # non-degenerate values identical to the unclamped formula
    np.testing.assert_allclose(float(depth[3]), 0.2, rtol=1e-6)
    np.testing.assert_allclose(float(depth[4]), 0.1, rtol=1e-6)


def test_project_behind_camera_finite_gradients(rng):
    """Points behind the camera must not produce infinite coord gradients."""
    import jax

    from tpuslam.geometry import backproject_depth, pixel_grid, project_3d

    K, inv_K = scale_camera_matrix(
        np.array([[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32), H, W)
    T = jnp.eye(4).at[2, 3].set(-5.0)[None]  # translate points behind camera

    def f(depth):
        pts = backproject_depth(depth, inv_K[None], pixel_grid(H, W))
        coords = project_3d(pts, K[None], T, H, W)
        return (coords ** 2).mean()

    depth = jnp.full((1, H, W), 0.5)  # all points end up at z < 0
    g = jax.grad(f)(depth)
    assert bool(jnp.isfinite(g).all())
