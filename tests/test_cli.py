"""CLI driver smoke tests (hermetic, synthetic dataset)."""
import json

import numpy as np
import pytest

from tpuslam.config import parse_config


def _synthetic_config(tmp_path, num_frames=6, h=32, w=64):
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(f"""
Dataset:
  dataset: Synthetic
  height: {h}
  width: {w}
  num_frames: {num_frames}

DepthPosePrediction:
  batch_size: 3
  scales: [0, 1]
  num_epochs: 1
  save_frequency: 1
  max_depth: 80.0
  log_path: {tmp_path}/log

ReplayBuffer:
  max_buffer_size: 5
  similarity_threshold: 2.0
  load_path: {tmp_path}/buffer

Slam:
  adaptation: true
  adaptation_epochs: 1
  min_distance: 0.0
  do_loop_closures: false
""")
    return cfg_path


@pytest.mark.slow
def test_cli_adapt_smoke(tmp_path, capsys):
    from tpuslam.cli.adapt import main

    cfg = _synthetic_config(tmp_path)
    assert main(["--config", str(cfg), "--max-steps", "3", "--no-progress"]) == 0
    out = capsys.readouterr().out
    assert "Abs traj RMSE" in out
    assert (tmp_path / "log" / "metrics.pkl").exists()
    assert (tmp_path / "log" / "log.txt").exists()
    assert (tmp_path / "log" / "trajectory.png").exists()


@pytest.mark.slow
def test_cli_pretrain_smoke(tmp_path, capsys):
    from tpuslam.cli.pretrain import main

    cfg = _synthetic_config(tmp_path, num_frames=8)
    assert main(["--config", str(cfg), "--epochs", "1"]) == 0
    ckpts = list((tmp_path / "log" / "models").glob("weights_*"))
    assert ckpts, "pretraining must write a checkpoint"


@pytest.mark.slow
def test_cli_make_buffer_smoke(tmp_path, capsys):
    from tpuslam.cli.make_buffer import main

    cfg = _synthetic_config(tmp_path)
    assert main(["--config", str(cfg), "--max-samples", "4"]) == 0
    assert (tmp_path / "buffer" / "buffer_state.pkl").exists()


@pytest.mark.slow
def test_cli_rungs_dtype_smoke(tmp_path, capsys):
    """`cli.rungs --dtype` must thread the conv dtype through the ladder
    (the bf16 quality-A/B command shipped in BASELINE.md round 3)."""
    from tpuslam.cli.rungs import main

    assert main([
        "--frames", "6", "--height", "32", "--width", "64",
        "--rungs", "1", "--dtype", "bfloat16", "--log", str(tmp_path / "rungs"),
    ]) == 0
    out = capsys.readouterr().out
    assert "rung 1" in out and "ATE=" in out
