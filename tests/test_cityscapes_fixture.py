"""Cityscapes loader tests against a generated fixture."""
import json

import numpy as np
import pytest
from PIL import Image

from tpuslam.data import Cityscapes

W0, H0 = 64, 32


@pytest.fixture
def cs_fixture(tmp_path, rng):
    img_dir = tmp_path / "leftImg8bit_sequence" / "train" / "aachen"
    img_dir.mkdir(parents=True)
    cam_dir = tmp_path / "camera" / "train" / "aachen"
    cam_dir.mkdir(parents=True)
    veh_dir = tmp_path / "vehicle_sequence" / "train" / "aachen"
    veh_dir.mkdir(parents=True)

    def put(seq, frame, ts):
        stem = f"aachen_{seq:06d}_{frame:06d}"
        arr = (rng.uniform(size=(H0, W0, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{stem}_leftImg8bit.png")
        with open(cam_dir / f"{stem}_camera.json", "w") as f:
            json.dump({"intrinsic": {"fx": 2262.52, "fy": 1096.98,
                                     "u0": 1096.98, "v0": 513.137}}, f)
        with open(veh_dir / f"{stem}_vehicle.json", "w") as f:
            json.dump({"speed": 8.0, "timestamp": ts}, f)

    # recording 1: frames 0-4 of seq 0; recording 2: frames 10-12 (gap)
    t0 = 1_000_000_000
    for i in range(5):
        put(0, i, t0 + i * 59_000_000)  # ~17 Hz in ns
    for i in range(10, 13):
        put(0, i, t0 + i * 59_000_000)
    return tmp_path


def test_cityscapes_sequence_splitting(cs_fixture):
    ds = Cityscapes(cs_fixture, "train", height=32, width=64)
    # recording 1 has 5 frames -> 3 centers; recording 2 has 3 -> 1 center
    assert len(ds) == 4
    s = ds[0]
    assert s.rgb.shape == (3, 32, 64, 3)
    # 8 m/s * 59ms = 0.472 m between frames
    np.testing.assert_allclose(s.rel_dist, 0.472, atol=1e-3)


def test_cityscapes_intrinsics_scaling(cs_fixture):
    ds = Cityscapes(cs_fixture, "train", height=32, width=64)
    K = ds[0].K
    np.testing.assert_allclose(K[0, 0], 2262.52 / 2048 * 64, rtol=1e-5)
    np.testing.assert_allclose(K[1, 1], 1096.98 / 1024 * 32, rtol=1e-5)


def test_cityscapes_no_cross_recording_triplets(cs_fixture):
    """No sample may straddle the frame-number gap between recordings."""
    ds = Cityscapes(cs_fixture, "train", height=32, width=64)
    for i in range(len(ds)):
        names = [p.stem for p in ds[i].filenames]
        frames = [int(n.split("_")[2]) for n in names]
        assert frames[1] == frames[0] + 1 and frames[2] == frames[1] + 1
