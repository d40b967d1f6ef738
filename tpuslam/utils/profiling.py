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

    def log_image(self, key: str, image, step: Optional[int] = None) -> None:
        """Mirror an image (PIL or path) to wandb — the reference uploads its
        save_prediction strip as wandb.Image (depth_pose_prediction.py:1243-1244).
        JSONL records the reference only (images don't belong in JSONL)."""
        self.log({key: str(image) if not hasattr(image, "size") else "<image>"},
                 step=step)
        if self._wandb is not None:
            self._wandb.log({key: [self._wandb.Image(image)]}, step=step)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()


def profile_host_pipeline(
    dataset=None,
    height: int = 192,
    width: int = 640,
    samples: int = 20,
) -> Dict[str, float]:
    """Host-side decode/batch micro-benchmark (the feed for the SLAM loop).

    Measures per-frame: `dataset[i]` latency (PNG decode / synthetic render +
    resize pyramid), FrameBatch assembly (pure host — make_frame_batch
    returns numpy), and the host->device transfer as a separate,
    attachment-dependent number.  Compare against the device frame time
    (profile_adapt_step): at native speeds (O(10 ms)/frame) host decode of
    3 images/frame becomes the bottleneck long before the chip — this
    quantifies how deep `Slam.run`'s prefetch queue must be and whether
    decode needs more workers.

    Returns {"ms_decode", "ms_batch", "ms_total_host", "ms_transfer"};
    ms_total_host = decode + assembly (host work only).
    """
    import jax

    from tpuslam.train import make_frame_batch

    if dataset is None:
        from tpuslam.data import SyntheticDataset

        dataset = SyntheticDataset(
            num_frames=samples + 2, height=height, width=width
        )
    n = min(samples, len(dataset))
    if n == 0:
        raise ValueError("profile_host_pipeline needs a non-empty dataset")

    t0 = time.perf_counter()
    items = [dataset[i] for i in range(n)]
    ms_decode = (time.perf_counter() - t0) / n * 1e3

    t0 = time.perf_counter()
    batches = [make_frame_batch(s.rgb[None], s.K, s.rel_dist[None]) for s in items]
    ms_batch = (time.perf_counter() - t0) / n * 1e3

    # Host->device transfer: chained device_puts with ONE forced scalar
    # readback at the end (block_until_ready does not block on the relay
    # attachment — CLAUDE.md), so per-frame cost is amortised throughput,
    # not per-transfer sync latency.
    t0 = time.perf_counter()
    dev = None
    for b in batches:
        dev = jax.tree_util.tree_map(jax.device_put, b)
    float(jax.tree_util.tree_leaves(dev)[0].ravel()[0])
    ms_transfer = (time.perf_counter() - t0) / n * 1e3

    return {
        "ms_decode": round(ms_decode, 3),
        "ms_batch": round(ms_batch, 3),
        "ms_total_host": round(ms_decode + ms_batch, 3),
        "ms_transfer": round(ms_transfer, 3),
    }


def profile_sync_latency(
    height: int = 96,
    width: int = 320,
    batch_size: int = 3,
    num_steps: int = 2,
    frames: int = 8,
    seed: int = 0,
) -> Dict[str, float]:
    """Pin the per-frame HOST SYNC cost of the SLAM loop on this attachment.

    `Slam.step` must read back the pose, LC embedding and loss scalars every
    frame to drive the host-side pose graph / replay buffer (reference
    slam/slam.py:96-180 semantics).  On a local chip that readback is
    sub-ms; on the dev relay it pays a tunnel round trip that dominates
    end-to-end fps (BASELINE.md round 3: all e2e numbers cluster 2-4 fps
    while pipelined bench scales with shape).  This probe measures the SAME
    fused adapt_step both ways:

    - chained:   `frames` dispatches back-to-back, ONE readback at the end
      (what bench.py measures — pure device throughput)
    - per-frame: after every dispatch, read back exactly what Slam.step
      reads (cam_T_cam + embedding + loss scalar)

    Returns per-frame ms for both and their difference = the sync RTT.
    """
    import jax
    import numpy as np

    from tpuslam.models import init_depth_pose
    from tpuslam.train import (
        LossConfig,
        adapt_step,
        concat_batches,
        make_adapt_optimizer,
        make_frame_batch,
        make_train_state,
    )

    rng = np.random.default_rng(seed)
    model, variables = init_depth_pose(
        jax.random.PRNGKey(seed), height=height, width=width
    )
    K = np.array(
        [[0.58 * width, 0, 0.5 * width, 0], [0, 1.92 * height, 0.5 * height, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32,
    )

    def batch(n):
        return make_frame_batch(
            rng.uniform(size=(n, 3, height, width, 3)).astype(np.float32),
            K,
            rng.uniform(0.5, 2.0, size=(n, 2)).astype(np.float32),
        )

    training = concat_batches(batch(1), batch(batch_size - 1)) \
        if batch_size > 1 else batch(1)
    cfg = LossConfig()
    tx = make_adapt_optimizer(variables["params"], 1e-4)
    state = make_train_state(variables["params"], variables["batch_stats"], tx)

    def readback(losses, outputs):
        np.asarray(outputs[("cam_T_cam", 0, 1)][0])
        np.asarray(outputs[("embedding",)])[0]
        float(losses["loss"])

    for _ in range(2):  # compile + warm
        state, losses, outputs = adapt_step(
            model, tx, cfg, state, None, training, num_steps=num_steps
        )
    readback(losses, outputs)

    t0 = time.perf_counter()
    for _ in range(frames):
        state, losses, outputs = adapt_step(
            model, tx, cfg, state, None, training, num_steps=num_steps
        )
    readback(losses, outputs)
    ms_chained = (time.perf_counter() - t0) / frames * 1e3

    t0 = time.perf_counter()
    for _ in range(frames):
        state, losses, outputs = adapt_step(
            model, tx, cfg, state, None, training, num_steps=num_steps
        )
        readback(losses, outputs)
    ms_synced = (time.perf_counter() - t0) / frames * 1e3

    return {
        "ms_chained": round(ms_chained, 2),
        "ms_per_frame_sync": round(ms_synced, 2),
        "ms_sync_rtt": round(ms_synced - ms_chained, 2),
        "fps_chained": round(1e3 / ms_chained, 2),
        "fps_synced": round(1e3 / ms_synced, 2),
    }


def profile_adapt_step(
    height: int = 192,
    width: int = 640,
    batch_size: int = 3,
    iters=(1, 5, 10),
    repeats: int = 8,
    use_pallas_warp: bool = True,
    seed: int = 0,
    loss_overrides: Optional[Dict[str, object]] = None,
) -> Dict[str, float]:
    """Fixed-cost / per-iteration split of the fused adapt step by K-sweep.

    `loss_overrides` forwards extra LossConfig fields (e.g. the round-4
    fused-pipeline knobs pallas_tall/pallas_fused_loss/pallas_fused_bwd/
    pallas_proj/pallas_bf16_out) so the K-sweep can size the slices of any
    variant pipeline (VERDICT r3 #8).

    Runs `adapt_step` at each K in `iters` with chained state (true device
    dependency; a final scalar readback syncs — `block_until_ready` is
    unreliable on some relay backends) and fits ms_fixed + K * ms_per_iter.
    The fixed part is the hoisted frozen-encoder forwards + embeddings +
    dispatch; the slope is decoder fwd+bwd + warp + loss + Adam.

    Returns {"ms_fixed", "ms_per_iter", "ms_frame_K5", "fps_K5"}.
    """
    import jax
    import numpy as np

    from tpuslam.models import init_depth_pose
    from tpuslam.train import (
        LossConfig,
        adapt_step,
        concat_batches,
        make_adapt_optimizer,
        make_frame_batch,
        make_train_state,
    )

    rng = np.random.default_rng(seed)
    model, variables = init_depth_pose(
        jax.random.PRNGKey(seed), height=height, width=width
    )
    K = np.array(
        [[0.58 * width, 0, 0.5 * width, 0], [0, 1.92 * height, 0.5 * height, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32,
    )

    def batch(n):
        return make_frame_batch(
            rng.uniform(size=(n, 3, height, width, 3)).astype(np.float32),
            K,
            rng.uniform(0.5, 2.0, size=(n, 2)).astype(np.float32),
        )

    training = concat_batches(batch(1), batch(batch_size - 1)) \
        if batch_size > 1 else batch(1)
    cfg = LossConfig(use_pallas_warp=use_pallas_warp,
                     **(loss_overrides or {}))
    tx = make_adapt_optimizer(variables["params"], 1e-4)

    times = {}
    for k in iters:
        state = make_train_state(variables["params"], variables["batch_stats"], tx)
        for _ in range(2):  # compile + warm
            state, losses, _ = adapt_step(
                model, tx, cfg, state, None, training, num_steps=k
            )
        float(losses["loss"])
        t0 = time.perf_counter()
        for _ in range(repeats):
            state, losses, _ = adapt_step(
                model, tx, cfg, state, None, training, num_steps=k
            )
        float(losses["loss"])
        times[k] = (time.perf_counter() - t0) / repeats * 1e3

    ks = np.array(list(times.keys()), np.float64)
    ts = np.array(list(times.values()), np.float64)
    slope, intercept = np.polyfit(ks, ts, 1)
    frame5 = intercept + 5 * slope
    return {
        "ms_fixed": float(intercept),
        "ms_per_iter": float(slope),
        "ms_frame_K5": float(frame5),
        "fps_K5": float(1000.0 / frame5),
        **{f"ms_K{k}": float(v) for k, v in times.items()},
    }
