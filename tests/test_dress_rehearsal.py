"""KITTI-geometry dress rehearsal (VERDICT r3 #7): the reference-protocol
command path at real KITTI geometry — 192x640 aspect from the normalized
KITTI intrinsics, uint8 ingest, LiDAR-sparse GT depth — end-to-end through
cli.adapt -> metrics -> final_report on the hermetic synthetic world."""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from tpuslam.data.synthetic import SyntheticDataset, _lidar_beam_mask


def test_lidar_mask_density_and_structure():
    m = _lidar_beam_mask(192, 640, 0)
    density = m.mean()
    assert 0.03 < density < 0.12, density          # real-KITTI-like sparsity
    assert not m[: int(192 * 0.44)].any()          # nothing above the horizon
    assert m[int(192 * 0.45):].any(axis=1).sum() >= 32  # many beam rows


def test_sparse_depth_sample_contract():
    ds = SyntheticDataset(num_frames=4, height=96, width=320, sparse_depth=True)
    s = ds[0]
    valid = s.depth > 0
    assert 0.03 < valid.mean() < 0.12
    dense = SyntheticDataset(num_frames=4, height=96, width=320)[0]
    np.testing.assert_array_equal(s.depth[valid], dense.depth[valid])
    assert (s.depth[~valid] == 0).all()


@pytest.mark.slow
def test_kitti_geometry_rehearsal_end_to_end(tmp_path):
    """Full reference-protocol chain at 192x640: the real cli.adapt command
    with the rehearsal config (5 adapt epochs, batch 3, LC on, sparse gt),
    run in a clean single-device subprocess (the suite's 8-virtual-device
    CPU split starves this compile several-fold; standalone it is ~7 min
    on the 1-core harness).  Uses the XLA sampler — interpret-mode Pallas
    takes minutes per call at this size and the kernels have their own
    parity tests; on TPU the yaml keeps the Pallas default."""
    cfg = tmp_path / "rehearsal.yaml"
    base = open("tpuslam/config/defaults/adapt_kitti_rehearsal.yaml").read()
    base = base.replace("log_path: ./log/kitti_rehearsal",
                        f"log_path: {tmp_path / 'log'}")
    base = base.replace("num_frames: 40", "num_frames: 8")
    # pallas_warp is a DepthPosePrediction key — patch it in-section
    base = base.replace("min_depth: 0.1", "min_depth: 0.1\n  pallas_warp: false")
    cfg.write_text(base)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "tpuslam.cli.adapt", "--config", str(cfg),
         "--max-steps", "4", "--no-progress"],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Abs traj RMSE" in proc.stdout
    with open(tmp_path / "log" / "metrics.pkl", "rb") as f:
        metrics = pickle.load(f)
    assert metrics["depth_error"], "sparse-gt depth metrics must be recorded"
    for row in metrics["depth_error"]:
        assert np.isfinite(row["abs_rel"])
