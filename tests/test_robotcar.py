"""RobotCar loader tests against a tiny generated on-disk fixture."""
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from tpuslam.data.robotcar import (
    RobotCar,
    demosaic_gbrg_bilinear,
    interpolate_poses,
    _rtk_to_poses,
)

W0, H0 = 64, 48  # "raw" image size


@pytest.fixture
def robotcar_fixture(tmp_path, rng):
    seq = "2015-08-12-15-04-18"
    img_dir = tmp_path / seq / "stereo" / "center"
    img_dir.mkdir(parents=True)
    t0 = 1_439_000_000_000_000
    timestamps = [t0 + i * 100_000 for i in range(10)]  # 10 Hz in microseconds
    for ts in timestamps:
        arr = (rng.uniform(size=(H0, W0, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{ts}.png")

    gps_dir = tmp_path / seq / "gps"
    gps_dir.mkdir(parents=True)
    ins_ts = np.arange(t0 - 1_000_000, t0 + 2_000_000, 20_000)
    with open(gps_dir / "ins.csv", "w") as f:
        f.write("timestamp,ins_status,velocity_north,velocity_east,velocity_down\n")
        for ts in ins_ts:
            f.write(f"{ts},GOOD,3.0,4.0,0.0\n")  # speed 5 m/s

    rtk_dir = tmp_path / "rtk" / seq
    rtk_dir.mkdir(parents=True)
    with open(rtk_dir / "rtk.csv", "w") as f:
        f.write("timestamp,latitude,longitude,altitude,northing,easting,down,velocity_north,velocity_east,velocity_down,roll,pitch,yaw\n")
        for i, ts in enumerate(ins_ts):
            northing = 5_735_000.0 + 0.5 * i
            f.write(f"{ts},57,-1,100,{northing},620000.0,-10.0,0,0,0,0.0,0.0,0.01\n")

    cam_dir = tmp_path / "camera_models"
    cam_dir.mkdir()
    (cam_dir / "stereo_narrow_left.txt").write_text(
        "400.0 400.0 320.0 240.0\n0 0 0 0\n"
    )
    return tmp_path, seq


def test_robotcar_loads_fixture(robotcar_fixture):
    root, seq = robotcar_fixture
    ds = RobotCar(root, seq, height=48, width=160, start_frame=0, with_poses=True)
    assert len(ds) == 8
    s = ds[0]
    assert s.rgb.shape == (3, 48, 160, 3)
    # speed 5 m/s at 10 Hz -> 0.5 m between frames
    np.testing.assert_allclose(s.rel_dist, [0.5, 0.5], atol=1e-3)
    assert s.rel_pose is not None and s.abs_pose is not None
    # rtk northing moves 0.5m per 20ms -> 25 m/s along x after axis mapping;
    # between frames (100ms) that's 2.5m of |translation|
    np.testing.assert_allclose(
        np.linalg.norm(s.rel_pose[:3, 3]), 2.5, atol=0.05
    )


def test_robotcar_stride_and_window(robotcar_fixture):
    root, seq = robotcar_fixture
    ds = RobotCar(root, seq, height=48, width=160,
                  start_frame=2, end_frame=10, every_n_frame=2, with_poses=False)
    assert len(ds.image_files) == 4
    # stride 2 at 10Hz -> 1.0 m between consecutive kept frames
    np.testing.assert_allclose(ds.relative_distances[1:], 1.0, atol=1e-3)


def test_robotcar_min_distance_filter(robotcar_fixture):
    root, seq = robotcar_fixture
    ds = RobotCar(root, seq, height=48, width=160, start_frame=0,
                  min_distance=0.9, with_poses=True)
    # 0.5m/frame -> keep every second frame, accumulated distance 1.0
    np.testing.assert_allclose(ds.relative_distances[1:], 1.0, atol=1e-3)
    assert len(ds.global_poses) == len(ds.image_files)


def test_interpolate_poses_midpoint():
    ts = np.array([0.0, 10.0])
    poses = np.tile(np.eye(4), (2, 1, 1))
    poses[1, :3, 3] = [10.0, 0, 0]
    from scipy.spatial.transform import Rotation

    poses[1, :3, :3] = Rotation.from_euler("y", 0.2).as_matrix()
    mid = interpolate_poses(ts, poses, np.array([5.0]))[0]
    np.testing.assert_allclose(mid[:3, 3], [5.0, 0, 0], atol=1e-9)
    angle = Rotation.from_matrix(mid[:3, :3]).as_rotvec()
    np.testing.assert_allclose(angle, [0, 0.1, 0], atol=1e-9)


def test_rtk_axis_mapping():
    utm = np.array([[100.0, 200.0, -50.0], [101.0, 200.0, -50.0]])
    rpy = np.zeros((2, 3))
    poses = _rtk_to_poses(utm, rpy)
    np.testing.assert_allclose(poses[0, :3, 3], 0.0)  # origin shift
    # +1 northing -> +1 x; down (z) negated after swap
    np.testing.assert_allclose(poses[1, :3, 3], [1.0, 0.0, 0.0], atol=1e-12)


def test_demosaic_recovers_flat_color():
    """A flat gray scene mosaiced to GBRG must demosaic back to flat gray."""
    H, W = 16, 16
    truth = np.full((H, W, 3), 0.42, np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    mosaic = np.where(
        (yy % 2 == 1) & (xx % 2 == 0), truth[..., 0],
        np.where((yy % 2 == 0) & (xx % 2 == 1), truth[..., 2], truth[..., 1]),
    )
    rgb = demosaic_gbrg_bilinear(mosaic)
    np.testing.assert_allclose(rgb, truth, atol=1e-5)


def test_camera_model_full_semantics(tmp_path):
    """Reference CameraModel parity (datasets/robotcar.py:553-678):
    G_camera_image parsing, LUT/image-size pairing enforcement, synthetic-LUT
    undistortion round trip, projection through the extrinsics block."""
    from tpuslam.data.robotcar import CameraModel

    cam_dir = tmp_path / "camera_models"
    cam_dir.mkdir()
    G = np.eye(4)
    G[:3, 3] = [0.1, -0.2, 0.3]
    lines = ["400.0 300.0 32.0 24.0"] + [
        " ".join(str(v) for v in row) for row in G
    ]
    (cam_dir / "stereo_narrow_left.txt").write_text("\n".join(lines) + "\n")

    H, W = 8, 16
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    # LUT shifts every pixel one column left (u = x - 1)
    lut = np.concatenate([(xx - 1).ravel(), yy.ravel()])
    lut.astype(np.double).tofile(cam_dir / "stereo_narrow_left_distortion_lut.bin")

    model = CameraModel(cam_dir)
    assert model.focal_length == (400.0, 300.0)
    assert model.principal_point == (32.0, 24.0)
    np.testing.assert_allclose(model.G_camera_image, G)

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(H, W, 3)).astype(np.float32)
    out = model.undistort(img)
    # column c of the output is column c-1 of the input; column 0 falls
    # outside and reads 0 (reference map_coordinates constant-mode default)
    np.testing.assert_allclose(out[:, 1:], img[:, :-1], atol=1e-6)
    np.testing.assert_allclose(out[:, 0], 0.0, atol=1e-6)

    # LUT is tied to the native resolution: wrong size is an error, not a
    # silent reshape (reference :628-629)
    with pytest.raises(ValueError):
        model.undistort(img[: H // 2])

    # projection: a point on the optical axis of the image frame lands on
    # the principal point at depth 1 after the extrinsics solve
    pt_cam = (G @ np.array([0.0, 0.0, 1.0, 1.0]))[:, None]
    uv, depth = model.project(pt_cam, (H * 100, W * 100))
    np.testing.assert_allclose(uv[:, 0], [32.0, 24.0], atol=1e-9)
    np.testing.assert_allclose(depth, [1.0], atol=1e-12)
    # behind-camera points are dropped
    pt_behind = (G @ np.array([0.0, 0.0, -1.0, 1.0]))[:, None]
    uv2, _ = model.project(pt_behind, (H, W))
    assert uv2.shape[1] == 0

    # intrinsics scaling for resized images
    fx, fy, cx, cy = model.scaled_intrinsics(
        48, 160, native_height=H, native_width=W
    )
    assert (fx, cx) == (400.0 * 10, 32.0 * 10) and (fy, cy) == (300.0 * 6, 24.0 * 6)


def test_camera_model_from_images_dir(tmp_path):
    from tpuslam.data.robotcar import CameraModel

    cam_dir = tmp_path / "camera_models"
    cam_dir.mkdir()
    for name in ("stereo_narrow_left", "stereo_wide_left", "mono_rear"):
        (cam_dir / f"{name}.txt").write_text("1.0 2.0 3.0 4.0\n")
    assert CameraModel.from_images_dir(
        cam_dir, "/data/seq/stereo/centre"
    ).focal_length == (1.0, 2.0)
    m = CameraModel.from_images_dir(cam_dir, "/data/seq/stereo/left")
    assert m.fx == 1.0  # stereo_wide_left resolved
    m2 = CameraModel.from_images_dir(cam_dir, "/data/seq/mono_rear")
    assert m2.principal_point == (3.0, 4.0)
