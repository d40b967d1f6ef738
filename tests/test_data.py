"""Synthetic dataset + host pipeline tests.

The key property: the renderer must be *geometrically consistent* with the
framework's warp — warping frame +1 into frame 0 using GT depth and GT pose
must reproduce frame 0.  This closes the loop between data and geometry.
"""
import colorsys

import jax.numpy as jnp
import numpy as np

from tpuslam.data import Prefetcher, SyntheticDataset, sample_to_batch
from tpuslam.data.base import (
    adjust_brightness,
    adjust_contrast,
    adjust_hue,
    adjust_saturation,
)
from tpuslam.geometry import se3_inverse, warp_frame


def test_synthetic_shapes_and_gt():
    ds = SyntheticDataset(num_frames=8, height=48, width=160, trajectory="curve")
    assert len(ds) == 8
    s = ds[0]
    assert s.rgb.shape == (3, 48, 160, 3)
    assert s.depth.shape == (48, 160)
    assert s.rel_pose.shape == (4, 4)
    assert np.all(s.rel_dist > 0)
    # relative pose translation magnitude == relative distance of frame 1
    np.testing.assert_allclose(
        np.linalg.norm(s.rel_pose[:3, 3]), s.rel_dist[1], rtol=1e-4
    )


def test_synthetic_render_warp_consistency():
    """GT depth + GT pose + our warp must reproduce the target frame."""
    ds = SyntheticDataset(num_frames=4, height=96, width=320, speed=0.5)
    s = ds[1]
    target = s.rgb[1][None]  # frame 0
    source = s.rgb[2][None]  # frame +1
    # rel_pose maps frame+1 coords -> frame0 coords; the warp needs the
    # transform taking frame-0 points INTO frame+1 coords.
    T = np.linalg.inv(s.rel_pose)[None]
    K = s.K[None]
    inv_K = np.linalg.inv(s.K)[None]
    depth = s.depth[None]
    out = np.asarray(
        warp_frame(
            jnp.asarray(source),
            jnp.asarray(depth),
            jnp.asarray(K),
            jnp.asarray(inv_K),
            jnp.asarray(T),
            height=96,
            width=320,
        )
    )
    # ground-plane region reprojects almost exactly; sky is at fake depth.
    ground = s.depth < 79.0
    err = np.abs(out[0] - target[0])[ground]
    assert err.mean() < 0.02, f"warp err {err.mean()}"


def test_synthetic_loop_trajectory_closes():
    ds = SyntheticDataset(num_frames=60, trajectory="loop", height=32, width=64)
    start = ds.global_poses[0][:3, 3]
    end = ds.global_poses[-1][:3, 3]
    circumference = 1.0 * 62
    assert np.linalg.norm(end - start) < 0.12 * circumference


def test_sample_to_batch():
    ds = SyntheticDataset(num_frames=4, height=48, width=160)
    batch = sample_to_batch(ds[0])
    assert batch.rgb.shape == (1, 3, 48, 160, 3)
    assert batch.K.shape == (1, 4, 4)
    np.testing.assert_allclose(float(batch.weights.sum()), 1.0)


def test_color_jitter_formulas(rng):
    """Blend-formula checks (the torchvision semantics the reference uses)."""
    img = rng.uniform(size=(16, 24, 3)).astype(np.float32)

    np.testing.assert_allclose(adjust_brightness(img, 0.5), img * 0.5, atol=1e-6)
    np.testing.assert_allclose(adjust_brightness(img, 1.0), img, atol=1e-6)

    gray_mean = float((img @ [0.299, 0.587, 0.114]).mean())
    expect = np.clip(0.8 * img + 0.2 * gray_mean, 0, 1)
    np.testing.assert_allclose(adjust_contrast(img, 0.8), expect, atol=1e-5)

    # saturation 0 -> grayscale; 1 -> identity
    gray = (img @ np.array([0.299, 0.587, 0.114], np.float32))[..., None]
    np.testing.assert_allclose(
        adjust_saturation(img, 0.0), np.broadcast_to(gray, img.shape), atol=1e-5
    )
    np.testing.assert_allclose(adjust_saturation(img, 1.0), img, atol=1e-6)

    # hue: compare against colorsys per pixel on a small patch
    patch = img[:4, :4]
    shifted = adjust_hue(patch, 0.1)
    for i in range(4):
        for j in range(4):
            h, s, v = colorsys.rgb_to_hsv(*patch[i, j])
            expect_px = colorsys.hsv_to_rgb((h + 0.1) % 1.0, s, v)
            np.testing.assert_allclose(shifted[i, j], expect_px, atol=1e-4)
    # hue 0 is identity
    np.testing.assert_allclose(adjust_hue(img, 0.0), img, atol=1e-5)


def test_prefetcher_preserves_order():
    items = list(range(50))
    out = list(Prefetcher(iter(items), depth=4))
    assert out == items


def test_chained_dataset_domains_and_poses():
    from tpuslam.data import ChainedDataset

    a = SyntheticDataset(num_frames=5, height=24, width=48, seed=0)
    b = SyntheticDataset(num_frames=4, height=24, width=48, seed=9,
                         trajectory="straight")
    ds = ChainedDataset([a, b])
    assert len(ds) == 9
    assert ds.domain_of(0) == 0 and ds.domain_of(5) == 1
    s = ds[6]
    assert s.index == 6 and s.rgb.shape == (3, 24, 48, 3)
    # chained abs poses are continuous: domain-1 poses are offset by
    # domain-0's final pose
    sa_last = a[4].abs_pose
    sb_first = ds[5].abs_pose
    # the offset chain keeps positions in the same world frame (no jump back
    # to origin)
    assert np.linalg.norm(sb_first[:3, 3]) >= np.linalg.norm(sa_last[:3, 3]) - 2.0


def test_concurrent_getitem_thread_safety():
    """Slam.run(prefetch_workers > 1) calls __getitem__ from several threads;
    the render cache and the shared augmentation Generator must survive that
    (cache eviction raced a KeyError and Generator state corrupted before the
    per-dataset locks).  Deterministic fields must match the serial read."""
    from concurrent.futures import ThreadPoolExecutor

    ds = SyntheticDataset(
        num_frames=12, height=48, width=160, trajectory="curve",
        do_augmentation=True,
    )
    serial = [ds[i] for i in range(len(ds))]
    for _ in range(3):  # several passes so cache eviction gets exercised
        with ThreadPoolExecutor(max_workers=4) as pool:
            out = list(pool.map(ds.__getitem__, range(len(ds))))
        for a, b in zip(serial, out):
            np.testing.assert_array_equal(a.rgb, b.rgb)
            np.testing.assert_array_equal(a.depth, b.depth)
            np.testing.assert_array_equal(a.rel_pose, b.rel_pose)
            assert b.rgb_aug is not None  # random per draw — presence only
