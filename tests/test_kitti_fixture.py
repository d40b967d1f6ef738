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
    (seq_dir / "image_3").mkdir(parents=True)
    for i in range(N_FRAMES):
        img = (rng.uniform(size=(H0, W0, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(seq_dir / "image_2" / f"{i:06d}.png")
        # right view: visibly different content so tests can tell views apart
        Image.fromarray(255 - img).save(seq_dir / "image_3" / f"{i:06d}.png")
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


def test_kitti_stereo_view_doubling(kitti_fixture):
    """views=('left','right') doubles the dataset, all left frames first
    (reference datasets/utils.py:98-102,117-127)."""
    ds_left = KittiOdometry(kitti_fixture, 4, height=24, width=80)
    ds = KittiOdometry(kitti_fixture, 4, height=24, width=80,
                       views=("left", "right"))
    assert len(ds) == 2 * len(ds_left)
    s_l, s_r = ds[0], ds[len(ds_left)]
    assert "image_2" in str(s_l.filenames[1])
    assert "image_3" in str(s_r.filenames[1])
    # right view serves genuinely different imagery (fixture inverts it)
    assert not np.allclose(s_l.rgb, s_r.rgb)
    np.testing.assert_allclose(s_l.rgb, ds_left[0].rgb)
    # rel distance / poses identical across views (vehicle motion)
    np.testing.assert_allclose(s_l.rel_dist, s_r.rel_dist)
    with pytest.raises(ValueError):
        KittiOdometry(kitti_fixture, 4, with_depth=True,
                      views=("left", "right"))
    with pytest.raises(ValueError):
        KittiOdometry(kitti_fixture, 4, views=("center",))


def test_flip_relative_pose_math():
    """Mirror conjugation M T M: forward motion invariant; lateral motion and
    yaw negate; an involution (flipping twice is identity)."""
    from scipy.spatial.transform import Rotation

    from tpuslam.data.kitti import flip_relative_pose

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_euler("y", 0.2).as_matrix()
    T[:3, 3] = [0.3, 0.1, 0.9]
    F = flip_relative_pose(T)
    # forward/vertical translation unchanged, lateral negated
    np.testing.assert_allclose(F[:3, 3], [-0.3, 0.1, 0.9], atol=1e-6)
    # yaw negated
    yaw = Rotation.from_matrix(F[:3, :3]).as_euler("yxz")[0]
    np.testing.assert_allclose(yaw, -0.2, atol=1e-6)
    # involution + still a valid rotation
    np.testing.assert_allclose(flip_relative_pose(F), T, atol=1e-6)
    np.testing.assert_allclose(F[:3, :3] @ F[:3, :3].T, np.eye(3), atol=1e-6)
    # pure forward motion is flip-invariant
    Tf = np.eye(4, dtype=np.float32)
    Tf[2, 3] = 0.5
    np.testing.assert_allclose(flip_relative_pose(Tf), Tf, atol=1e-7)


def test_kitti_flip_adjusts_pose(kitti_fixture, rng):
    """Flipped augmented samples must emit the mirrored relative pose."""
    from tpuslam.data.kitti import flip_relative_pose

    plain = KittiOdometry(kitti_fixture, 4, height=24, width=80)
    aug = KittiOdometry(kitti_fixture, 4, height=24, width=80,
                        do_augmentation=True, seed=3)
    saw_flip = saw_plain = False
    for i in range(len(aug)):
        s_aug, s_plain = aug[i], plain[i]
        flipped = not np.allclose(s_aug.rgb, s_plain.rgb)
        if flipped:
            np.testing.assert_allclose(s_aug.rgb, s_plain.rgb[:, :, ::-1])
            np.testing.assert_allclose(
                s_aug.rel_pose, flip_relative_pose(s_plain.rel_pose), atol=1e-6
            )
            saw_flip = True
        else:
            np.testing.assert_allclose(s_aug.rel_pose, s_plain.rel_pose)
            saw_plain = True
    assert saw_flip and saw_plain, "seed must exercise both branches"
