"""KITTI loader tests against a generated on-disk fixture (no downloads)."""
from datetime import datetime, timedelta

import numpy as np
import pytest
from PIL import Image

from tpuslam.data import KittiOdometry

N_FRAMES = 10
W0, H0 = 82, 25  # odd raw sizes exercise the resize path


@pytest.fixture
def kitti_fixture(tmp_path, rng):
    seq_dir = tmp_path / "sequences" / "04"
    (seq_dir / "image_2").mkdir(parents=True)
    (seq_dir / "oxts" / "data").mkdir(parents=True)
    (seq_dir / "segm_mask" / "image_2").mkdir(parents=True)
    (seq_dir / "gt_depth" / "image_02").mkdir(parents=True)
    (tmp_path / "poses").mkdir()

    base = datetime(2011, 9, 30, 12, 0, 0)
    ts_lines = []
    poses = []
    T = np.eye(4)
    for i in range(N_FRAMES):
        img = (rng.uniform(size=(H0, W0, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(seq_dir / "image_2" / f"{i:06d}.png")
        # oxts: 30 fields, speed fields at indices 8:11 -> (3, 4, 0) = 5 m/s
        fields = np.zeros(30)
        fields[8:11] = [3.0, 4.0, 0.0]
        np.savetxt(seq_dir / "oxts" / "data" / f"{i:010d}.txt", fields[None])
        ts_lines.append((base + timedelta(milliseconds=100 * i)).strftime(
            "%Y-%m-%d %H:%M:%S.%f") + "000")
        # GT pose: 0.5 m forward per frame
        poses.append(T[:3].reshape(-1).copy())
        step = np.eye(4)
        step[2, 3] = 0.5
        T = T @ step
        # mask: left half dynamic
        m = np.zeros((H0, W0), np.uint8)
        m[:, : W0 // 2] = 255
        Image.fromarray(m).save(seq_dir / "segm_mask" / "image_2" / f"{i:06d}.png")
        # depth (cm)
        d = (rng.uniform(500, 2000, size=(H0, W0))).astype(np.uint16)
        Image.fromarray(d, mode="I;16").save(
            seq_dir / "gt_depth" / "image_02" / f"{i:06d}.png"
        )
    (seq_dir / "oxts" / "timestamps.txt").write_text("\n".join(ts_lines) + "\n")
    np.savetxt(tmp_path / "poses" / "04.txt", np.stack(poses))
    return tmp_path


def test_kitti_basic_loading(kitti_fixture):
    ds = KittiOdometry(kitti_fixture, 4, height=24, width=80)
    assert len(ds) == N_FRAMES - 2
    s = ds[0]
    assert s.rgb.shape == (3, 24, 80, 3)
    # 5 m/s at 10 Hz -> 0.5 m between frames (velocity integration)
    np.testing.assert_allclose(s.rel_dist, [0.5, 0.5], atol=1e-4)
    # GT pose: frame +1 wrt frame 0 -> 0.5 m forward
    np.testing.assert_allclose(s.rel_pose[:3, 3], [0, 0, 0.5], atol=1e-5)
    np.testing.assert_allclose(s.abs_pose[2, 3], 1.0, atol=1e-5)  # frame 2


def test_kitti_min_distance_filter(kitti_fixture):
    ds = KittiOdometry(kitti_fixture, 4, height=24, width=80, min_distance=0.9)
    # 0.5m/frame -> keep every second frame with accumulated 1.0
    np.testing.assert_allclose(ds.relative_distances[1:], 1.0, atol=1e-4)
    assert len(ds.global_poses) == len(ds.image_files)


def test_kitti_depth_and_mask(kitti_fixture):
    ds = KittiOdometry(kitti_fixture, 4, height=24, width=80,
                       with_depth=True, with_mask=True)
    s = ds[0]
    assert s.depth is not None
    assert 4.9 < s.depth.min() and s.depth.max() < 20.1  # cm -> m
    assert s.mask is not None and s.mask.shape == (24, 80)
    assert s.mask[:, :5].mean() > 0.9 and s.mask[:, -5:].mean() < 0.1


def test_kitti_rejects_bad_sequences(kitti_fixture):
    with pytest.raises(ValueError):
        KittiOdometry(kitti_fixture, 3)
    with pytest.raises(ValueError):
        KittiOdometry(kitti_fixture, 11)


def test_kitti_augmentation_flip_and_jitter(kitti_fixture):
    ds = KittiOdometry(kitti_fixture, 4, height=24, width=80,
                       do_augmentation=True, seed=1)
    s = ds[0]
    assert s.rgb_aug is not None
    assert not np.allclose(s.rgb_aug, s.rgb)
