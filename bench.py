"""tpuslam benchmark: online-adaptation throughput on one chip.

Measures the reference protocol's hot path — per frame: 5 fused adaptation
iterations (forward+backward+Adam, batch 3 = 1 online + 2 replay at 192x640)
plus the eval forward producing pose/depth/embeddings — i.e. everything
`Slam.step` dispatches to the device, on pre-rendered synthetic frames so
host decode is out of the measurement.

Prints ONE JSON line: frames/sec vs the 100 fps north star
(BASELINE.json: ">=100 frames/sec combined inference+adaptation").
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.data import SyntheticDataset
from tpuslam.models import init_depth_pose
from tpuslam.train import (
    LossConfig,
    adapt_step,
    concat_batches,
    make_adapt_optimizer,
    make_frame_batch,
    make_train_state,
)

HEIGHT, WIDTH = 192, 640
BATCH = 3
ADAPT_ITERS = 5
WARMUP = 3
MEASURE = 30
NORTH_STAR_FPS = 100.0


def build_batches():
    """Pre-built training batches in the exact layout `Slam.step` ships:
    uint8 images (make_frame_batch default), online frame as row 0, eval
    sub-batch derived ON DEVICE via online=None — no separate online
    transfer (tpuslam/slam/slam.py:318-330)."""
    ds = SyntheticDataset(num_frames=WARMUP + MEASURE + 2, height=HEIGHT, width=WIDTH)
    batches = []
    for i in range(WARMUP + MEASURE):
        online = ds[i]
        replay = [ds[(i + 7) % len(ds)], ds[(i + 13) % len(ds)]]
        ob = make_frame_batch(online.rgb[None], online.K, online.rel_dist[None])
        rb = make_frame_batch(
            np.stack([r.rgb for r in replay]),
            np.stack([r.K for r in replay]),
            np.stack([r.rel_dist for r in replay]),
        )
        batches.append(concat_batches(ob, rb))
    return batches


def main() -> None:
    global HEIGHT, WIDTH, ADAPT_ITERS
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"],
                    help="conv compute dtype (params stay f32; bfloat16 is the "
                         "shipped DepthPoseConfig default — see BASELINE.md A/B)")
    ap.add_argument("--extra-tiles", type=int, default=None,
                    help="override LossConfig.pallas_extra_tiles")
    ap.add_argument("--sparse", action="store_true",
                    help="enable pallas_sparse row-skip")
    ap.add_argument("--packed", action="store_true",
                    help="enable pallas_packed dual-tap gathers (bf16 taps)")
    ap.add_argument("--seg-skip", action="store_true",
                    help="enable pallas_seg_skip per-segment sweep "
                         "predication (implies packed taps)")
    ap.add_argument("--group-skip", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="pallas_group_skip vertical group-predicated sweep "
                         "(tap-identical vs dense; default on, "
                         "--no-group-skip for the dense A/B)")
    ap.add_argument("--fused-grad", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="pallas_fused_grad: forward kernel stores tap "
                         "differentials, VJP becomes an elementwise XLA "
                         "contraction (no backward gather sweep); "
                         "--no-fused-grad for the two-kernel A/B")
    ap.add_argument("--tall", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="pallas_tall: full-height column-stripe warp kernel "
                         "(src window DMA once per image/stripe, deduped "
                         "sources, unlimited vertical exactness)")
    ap.add_argument("--bf16-out", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="pallas_bf16_out: store the fused warp kernel's "
                         "outputs (warped + tap differentials) as bfloat16 "
                         "(round-5 default: faster in two sessions + "
                         "better-or-equal 3-seed quality A/B; "
                         "--no-bf16-out for the f32 A/B)")
    ap.add_argument("--fused-bwd", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="pallas_fused_bwd (with --tall --fused-loss): one "
                         "backward kernel contracts dpred with the tap "
                         "differentials in VMEM — no dpred HBM round trip")
    ap.add_argument("--proj", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="pallas_proj (with --tall): compute warp coords "
                         "in-kernel from depth + affine camera maps (no "
                         "points/coords HBM round trips)")
    ap.add_argument("--fused-loss", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="pallas_fused_loss: per-pixel SSIM+L1 error maps "
                         "from the fused VMEM kernel instead of XLA "
                         "reduce-window chains (opt-in pending measurement)")
    ap.add_argument("--height", type=int, default=HEIGHT)
    ap.add_argument("--width", type=int, default=WIDTH)
    ap.add_argument("--iters", type=int, default=ADAPT_ITERS,
                    help="adaptation iterations per frame (protocol default 5)")
    ap.add_argument("--e2e-frames", type=int, default=16,
                    help="frames for the steady-state end-to-end Slam loop "
                         "measurement riding the same JSON line (e2e_fps); "
                         "0 skips it")
    ap.add_argument("--pipeline-depth", type=int, default=None,
                    help="slam.pipeline_depth for the e2e measurement "
                         "(None = config default)")
    ap.add_argument("--watchdog", type=float, default=900.0,
                    help="dead-backend watchdog seconds (raise for configs "
                         "whose remote compile exceeds the default — e.g. "
                         "the full fused stack's ~5x larger unrolled "
                         "programs on the relay's remote Mosaic); parsed "
                         "again pre-thread by _main_with_watchdog")
    args = ap.parse_args()
    HEIGHT, WIDTH = args.height, args.width
    ADAPT_ITERS = args.iters

    model, variables = init_depth_pose(
        jax.random.PRNGKey(0), height=HEIGHT, width=WIDTH, dtype=jnp.dtype(args.dtype)
    )
    overrides = {}
    if args.extra_tiles is not None:
        overrides["pallas_extra_tiles"] = args.extra_tiles
    if args.sparse:
        overrides["pallas_sparse"] = True
    if args.packed:
        overrides["pallas_packed"] = True
    if args.seg_skip:
        overrides["pallas_seg_skip"] = True
    overrides["pallas_group_skip"] = args.group_skip
    overrides["pallas_fused_grad"] = args.fused_grad
    overrides["pallas_fused_loss"] = args.fused_loss
    overrides["pallas_bf16_out"] = args.bf16_out
    overrides["pallas_tall"] = args.tall
    overrides["pallas_fused_bwd"] = args.fused_bwd
    overrides["pallas_proj"] = args.proj
    cfg = LossConfig(scales=(0, 1, 2, 3), min_depth=0.1, max_depth=None,
                     **overrides)  # pallas warp on by default
    tx = make_adapt_optimizer(variables["params"], 1e-4)
    state = make_train_state(variables["params"], variables["batch_stats"], tx)
    batches = build_batches()

    for training in batches[:WARMUP]:
        state, losses, outputs = adapt_step(
            model, tx, cfg, state, None, training, num_steps=ADAPT_ITERS
        )
    # hard sync via host transfer: on some backends block_until_ready returns
    # before execution finishes, so force a scalar readback instead
    float(losses["loss"])

    t0 = time.perf_counter()
    for training in batches[WARMUP:]:
        state, losses, outputs = adapt_step(
            model, tx, cfg, state, None, training, num_steps=ADAPT_ITERS
        )
    final_loss = float(losses["loss"])  # syncs the whole dependent chain
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final_loss), "bench produced non-finite loss"

    fps = MEASURE / elapsed

    # host-side feed cost (decode/render + batch assembly + transfer) so
    # BENCH_r* also exposes host regressions, not just the device path —
    # at native device speeds the host pipeline is the next bottleneck
    from tpuslam.utils.profiling import profile_host_pipeline

    host = profile_host_pipeline(height=HEIGHT, width=WIDTH, samples=8)

    # Steady-state END-TO-END fps (full Slam loop: adaptation + replay +
    # LC + PGO + per-frame readbacks) rides the same JSON line so the
    # driver-recorded BENCH catches host/loop regressions, not just the
    # device path — on the dev relay the two diverge ~9x via per-frame
    # sync RTT (BASELINE.md "end-to-end vs device-only").
    e2e = _e2e_fps(args.e2e_frames, args.pipeline_depth) if args.e2e_frames else None
    line = {
        "metric": "online_adapt_frames_per_sec",
        "value": round(fps, 2),
        "unit": f"frames/sec ({ADAPT_ITERS} adapt iters + eval fwd, batch 3, {HEIGHT}x{WIDTH})",
        "vs_baseline": round(fps / NORTH_STAR_FPS, 3),
        "host_ms_per_frame": host["ms_total_host"],
    }
    line.update(_utilization(args, fps))
    if e2e is not None:
        line["e2e_fps"] = e2e
    print(json.dumps(line))


def _utilization(args, fps: float) -> dict:
    """Utilization fields for the JSON line (VERDICT r4 #3): the native-v5e
    speed-of-light frame time for the MEASURED config (analytic fused bytes
    + calibrated conv FLOPs — utils/calibration.py::frame_sol_ms),
    `roofline_frac` = sol / measured (on the relay this is small and that
    smallness IS the relay tax — BASELINE.md "reading roofline_frac"), and
    the projected native fps at the expected (0.45 MXU / 0.7 HBM) and
    conservative (0.40/0.55) sustained efficiencies, so BENCH_r*.json can
    distinguish relay-slow from genuinely inefficient."""
    from tpuslam.utils.calibration import frame_sol_ms

    kw = dict(adapt_iters=ADAPT_ITERS, bf16=(args.dtype == "bfloat16"),
              tall=args.tall, fused_loss=args.fused_loss,
              fused_bwd=args.fused_bwd, proj=args.proj,
              bf16_out=args.bf16_out,
              extra_tiles=(args.extra_tiles if args.extra_tiles is not None
                           else 2),
              height=HEIGHT, width=WIDTH)
    sol_ms = frame_sol_ms(**kw)
    measured_ms = 1e3 / fps if fps > 0 else float("inf")
    expected = 1e3 / frame_sol_ms(mxu_eff=0.45, hbm_eff=0.7, **kw)
    conservative = 1e3 / frame_sol_ms(mxu_eff=0.40, hbm_eff=0.55, **kw)
    return {
        "sol_ms_frame": round(sol_ms, 3),
        "roofline_frac": round(sol_ms / measured_ms, 4),
        "proj_native_fps": round(expected, 1),
        "proj_native_fps_conservative": round(conservative, 1),
    }


def _e2e_fps(frames: int, pipeline_depth) -> float:
    """Steady-state fps of the real SLAM loop on the synthetic sequence at
    the bench resolution (2 adapt iters like adapt_synthetic.yaml)."""
    from tpuslam.config import parse_config
    from tpuslam.slam import Slam

    config = parse_config("tpuslam/config/defaults/adapt_synthetic.yaml")
    config.dataset.height = HEIGHT
    config.dataset.width = WIDTH
    config.dataset.num_frames = frames + 2
    from pathlib import Path as _P
    config.depth_pose.log_path = _P("/tmp/bench_e2e_log")
    if pipeline_depth is not None:
        config.slam.pipeline_depth = pipeline_depth
    slam = Slam(config)
    slam.run(max_steps=frames, progress=False)
    warm = slam.step_times[5:] or slam.step_times
    return round(1.0 / float(np.mean(warm)), 2)


def _main_with_watchdog() -> None:
    """Run main() under a dead-backend watchdog.

    The dev relay's outages stall device calls indefinitely (CLAUDE.md —
    observed multi-hour `UNAVAILABLE` windows where even a 256x256 matmul
    never returns).  A hung bench records NOTHING for the round; this
    prints an honest zero-valued JSON line instead and exits.  The budget
    (15 min) is ~4x a healthy cold-compile run, so it cannot clip a live
    measurement."""
    import os
    import threading

    # pre-parse the watchdog budget (main() runs in the thread, after the
    # wait below has already been armed)
    budget = 900.0
    if "--watchdog" in sys.argv:
        budget = float(sys.argv[sys.argv.index("--watchdog") + 1])

    done = threading.Event()
    error: list[BaseException] = []

    def runner():
        try:
            main()
        except BaseException as e:  # re-raised on the main thread below
            error.append(e)
        finally:
            done.set()

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    if done.wait(timeout=budget):
        if error:
            # A failed bench must exit non-zero (the pre-watchdog contract):
            # a harness keying on the exit code must not record a crashed
            # measurement as success.
            raise error[0]
    else:
        print(
            json.dumps(
                {
                    "metric": "online_adapt_frames_per_sec",
                    "value": 0.0,
                    "unit": "frames/sec (NOT MEASURED)",
                    "vs_baseline": 0.0,
                    "error": f"tpu backend unresponsive for {budget:.0f}s (relay outage)",
                }
            ),
            flush=True,
        )
        os._exit(2)


if __name__ == "__main__":
    _main_with_watchdog()
