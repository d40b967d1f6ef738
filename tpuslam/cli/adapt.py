"""Online adaptation driver — the `main_adapt.py` equivalent.

Usage:
    python -m tpuslam.cli.adapt --config tpuslam/config/defaults/adapt_kitti.yaml
    python -m tpuslam.cli.adapt --config .../adapt_synthetic.yaml --max-steps 100

Runs the SLAM loop over the configured sequence, saves metrics/model, and
appends the final trajectory error report to `<log_path>/log.txt` in the same
format as the reference (main_adapt.py:36-40).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from tpuslam.config import parse_config
from tpuslam.slam import Slam


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="tpuslam online adaptation")
    ap.add_argument("--config", required=True, type=Path)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--no-progress", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--pipeline-depth", type=int, default=None,
                    help="override slam.pipeline_depth: defer per-frame host "
                         "readbacks N frames so sync latency overlaps device "
                         "compute (0 = reference per-frame sync)")
    ap.add_argument("--prefetch-workers", type=int, default=1,
                    help="host decode threads feeding the prefetch queue")
    args = ap.parse_args(argv)

    np.random.seed(args.seed)
    config = parse_config(args.config)
    if args.pipeline_depth is not None:
        config.slam.pipeline_depth = args.pipeline_depth
    slam = Slam(config)
    print(f"tpuslam adapt: {len(slam)} frames, log -> {slam.log_path}")
    slam.run(max_steps=args.max_steps, progress=not args.no_progress,
             prefetch_workers=args.prefetch_workers)

    slam.save_metrics()
    slam.save_model()
    try:
        from tpuslam.viz.plots import plot_metrics, plot_trajectory

        plot_trajectory(slam, slam.log_path / "trajectory.png")
        plot_metrics(slam, slam.log_path / "metrics.png")
    except Exception as e:  # plotting must never kill a finished run
        print(f"plotting skipped: {e}")

    report = slam.final_report()
    print(report)
    with open(slam.log_path / "log.txt", "a") as f:
        f.write(f"config: {args.config}\n{report}\n")
    if slam.step_times:
        fps = 1.0 / float(np.mean(slam.step_times[3:] or slam.step_times))
        warm = slam.step_times[5:] or slam.step_times
        steady = 1.0 / float(np.mean(warm))
        print(f"throughput: {fps:.1f} frames/sec (incl. host); "
              f"steady-state {steady:.1f} fps over the last {len(warm)} frames "
              f"(compare bench.py --height/--width at the same shape for the "
              f"device-only ceiling)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
