"""Meshlab OBJ exporter extras: mesh/polygon export, rotation_matrix_from_to."""
import numpy as np
import pytest

from tpuslam.viz.meshlab import (
    MeshlabExporter,
    false_color,
    norm_range_01,
    rotation_matrix_from_to,
)


def test_mesh_export_triangulates_grid(tmp_path):
    # 3x4 height-field grid -> (3-1)*(4-1)*2 = 12 triangles
    ys, xs = np.mgrid[0:3, 0:4].astype(float)
    grid = np.stack([xs, ys, np.sin(xs + ys)], axis=-1)
    ex = MeshlabExporter()
    ex.add_mesh(grid, color=norm_range_01(grid[..., 2]))
    out = ex.write(tmp_path / "mesh.obj", verbose=False)
    text = out.read_text()
    assert text.count("\nf ") == 12
    assert text.count("\nv ") == 12  # 3*4 vertices
    # all face indices valid and 1-based
    for line in text.splitlines():
        if line.startswith("f "):
            idx = [int(t) for t in line.split()[1:]]
            assert len(idx) == 3 and all(1 <= i <= 12 for i in idx)


def test_mesh_export_drops_nan_vertices(tmp_path):
    grid = np.zeros((2, 3, 3))
    grid[..., 0] = np.arange(3)
    grid[0, 0] = np.nan  # kills two incident triangles
    ex = MeshlabExporter()
    ex.add_mesh(grid)
    out = ex.write(tmp_path / "m.obj", verbose=False)
    text = out.read_text()
    assert text.count("\nv ") == 5  # one NaN vertex dropped
    # only the triangles touching the NaN vertex die: 4 - 1 = 3 remain
    assert text.count("\nf ") == 3
    for line in text.splitlines():
        if line.startswith("f "):
            idx = [int(t) for t in line.split()[1:]]
            assert all(1 <= i <= 5 for i in idx)  # remapped, in range


def test_polygon_export(tmp_path):
    ex = MeshlabExporter()
    ex.add_polygon(np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]),
                   color=[1.0, 0.0, 0.0])
    out = ex.write(tmp_path / "p.obj", verbose=False)
    text = out.read_text()
    assert "f 1 2 3 4" in text


def test_rotation_matrix_from_to():
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = rng.normal(size=3)
        b = rng.normal(size=3)
        R = rotation_matrix_from_to(a, b)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)
        got = R @ (a / np.linalg.norm(a))
        np.testing.assert_allclose(got, b / np.linalg.norm(b), atol=1e-10)
    # identity and antiparallel corner cases
    np.testing.assert_allclose(
        rotation_matrix_from_to([0, 0, 1], [0, 0, 1]), np.eye(3), atol=1e-12
    )
    R = rotation_matrix_from_to([0, 0, 1], [0, 0, -1])
    np.testing.assert_allclose(R @ [0, 0, 1], [0, 0, -1], atol=1e-10)
    R4 = rotation_matrix_from_to([1, 0, 0], [0, 1, 0], output4x4=True)
    assert R4.shape == (4, 4) and R4[3, 3] == 1.0


def test_false_color_range():
    c = false_color(np.array([0.0, 0.5, 1.0]))
    assert c.shape == (3, 3)
    assert c.min() >= 0 and c.max() <= 1


def test_save_prediction_panels(tmp_path):
    """Reference save_prediction parity (depth_pose_prediction.py:1197-1244):
    per-sample files named {index:05}.png under the epoch folder, plus a
    horizontally-concatenated review strip; GT row included when given."""
    from tpuslam.viz.plots import save_prediction_panels

    rng = np.random.default_rng(0)
    N, H, W = 3, 24, 48
    rgbs = rng.uniform(size=(N, H, W, 3)).astype(np.float32)
    depths = rng.uniform(1.0, 50.0, size=(N, H, W)).astype(np.float32)
    disps = 1.0 / depths
    gts = rng.uniform(0.0, 60.0, size=(N, H * 2, W * 2)).astype(np.float32)

    folder = tmp_path / "prediction" / "val_depth_001"
    paths, strip = save_prediction_panels(
        rgbs, depths, [0, 1, 2], folder, disps=disps, gt_depths=gts
    )
    assert [p.name for p in paths] == ["00000.png", "00001.png", "00002.png"]
    assert all(p.exists() for p in paths)
    assert strip is not None and strip.size[0] > strip.size[1]

    # without optional rows
    paths2, strip2 = save_prediction_panels(rgbs[:1], depths[:1], [7], folder)
    assert paths2[0].name == "00007.png" and strip2 is not None


def test_show_images_batch_debugger(tmp_path):
    """show_images (reference datasets/utils.py:287-307 analog) renders a
    samples x frames grid from a FrameBatch, both raw and augmented."""
    import numpy as np

    from tpuslam.train.batch import make_frame_batch
    from tpuslam.viz.plots import show_images

    rng = np.random.default_rng(0)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 32.0; K[0, 2] = 32.0; K[1, 2] = 16.0
    batch = make_frame_batch(
        rng.uniform(size=(2, 3, 32, 64, 3)).astype(np.float32),
        K,
        rng.uniform(0.5, 2.0, size=(2, 2)).astype(np.float32),
        rgb_aug=rng.uniform(size=(2, 3, 32, 64, 3)).astype(np.float32),
    )
    out = show_images(batch, tmp_path / "dbg.png")
    assert (tmp_path / "dbg.png").exists()
    out_aug = show_images(batch, tmp_path / "dbg_aug.png", augmented=True)
    assert (tmp_path / "dbg_aug.png").exists()
