import json
import time

import numpy as np
import pytest

from tpuslam.utils import MetricsLogger, StepTimer


def test_step_timer():
    t = StepTimer(window=3)
    for _ in range(5):
        with t:
            time.sleep(0.002)
    assert t.total_steps == 5
    assert len(t.times) == 3  # rolling window
    assert t.fps > 0 and t.mean_ms >= 2.0


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(tmp_path / "m.jsonl")
    logger.log({"loss": 0.5}, step=1)
    logger.log({"loss": 0.4}, step=2)
    lines = (tmp_path / "m.jsonl").read_text().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["loss"] == 0.4 and rec["step"] == 2 and "ts" in rec


@pytest.mark.slow
def test_profile_adapt_step_tiny():
    from tpuslam.utils.profiling import profile_adapt_step

    out = profile_adapt_step(height=32, width=64, batch_size=2,
                             iters=(1, 2), repeats=2)
    assert out["ms_per_iter"] > 0
    assert np.isfinite(out["ms_frame_K5"]) and out["fps_K5"] > 0


@pytest.mark.slow
def test_profile_sync_latency_tiny():
    from tpuslam.utils.profiling import profile_sync_latency

    out = profile_sync_latency(height=32, width=64, batch_size=2,
                               num_steps=1, frames=3)
    assert out["ms_chained"] > 0 and out["ms_per_frame_sync"] > 0
    assert out["fps_chained"] > 0 and out["fps_synced"] > 0
    # on CPU the sync is nearly free; the probe just has to be finite
    assert np.isfinite(out["ms_sync_rtt"])


def test_profile_host_pipeline_tiny():
    from tpuslam.utils.profiling import profile_host_pipeline

    out = profile_host_pipeline(height=32, width=64, samples=3)
    assert out["ms_decode"] > 0 and out["ms_batch"] > 0
    assert out["ms_total_host"] >= out["ms_decode"]


def test_calibration_classes_tiny():
    """One cheap class end-to-end: measured time + XLA cost analysis +
    roofline columns are populated and sane."""
    from tpuslam.utils.calibration import calibrate, project_native_fps

    rows = calibrate(height=32, width=128, batch_size=1, repeats=2,
                     classes=["encoder_fwd", "iter_fwd_bwd", "adam_update"])
    assert {r["class"] for r in rows} == {
        "encoder_fwd", "iter_fwd_bwd", "adam_update"
    }
    for r in rows:
        assert r["measured_ms"] > 0
        assert r["bound"] in ("hbm", "mxu")
    proj = project_native_fps(rows)
    assert proj["proj_native_fps"] > 0
