"""Tracing / profiling hooks (the reference has none — SURVEY §5).

- `StepTimer`: rolling per-step wall-clock stats (frames/sec is the north
  star metric).
- `trace`: context manager around `jax.profiler` for TensorBoard-viewable
  device traces.
- `MetricsLogger`: JSONL metrics sink with optional wandb mirroring
  (reference uses wandb directly, depth_pose_prediction.py:1246-1267; wandb
  is optional here and gated on importability).
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import deque
from pathlib import Path
from typing import Dict, Optional


class StepTimer:
    def __init__(self, window: int = 100):
        self.times = deque(maxlen=window)
        self._t0: Optional[float] = None
        self.total_steps = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self.total_steps += 1
        return False

    @property
    def fps(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    @property
    def mean_ms(self) -> float:
        if not self.times:
            return 0.0
        return 1000.0 * sum(self.times) / len(self.times)


@contextlib.contextmanager
def trace(log_dir: Path, enabled: bool = True):
    """Capture a jax.profiler device trace into `log_dir` (TensorBoard)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Append-only JSONL metrics log; mirrors to wandb when available."""

    def __init__(self, log_path: Path, use_wandb: bool = False, config: Optional[Dict] = None):
        self.path = Path(log_path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project="tpuslam", config=config or {})
            except ImportError:
                print("metrics: wandb requested but not installed; JSONL only")

    def log(self, record: Dict, step: Optional[int] = None) -> None:
        payload = dict(record)
        if step is not None:
            payload["step"] = step
        payload["ts"] = time.time()
        with open(self.path, "a") as f:
            f.write(json.dumps(payload) + "\n")
        if self._wandb is not None:
            self._wandb.log(record, step=step)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
