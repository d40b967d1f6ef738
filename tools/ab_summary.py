"""Summarise rungs A/B runs from a relay_grind log into mean +- spread.

The round-5 A/B protocol (VERDICT r4 #7) runs each quality knob across
>= 3 seeds; this parses `log/relay_grind_*.log` (step headers + rung
result lines) and prints per-configuration mean +- half-range for ATE /
rel_trans / abs_rel / fps, grouping seeds of the same knob.

Usage: python tools/ab_summary.py [logfile ...]
"""
from __future__ import annotations

import re
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

HEADER = re.compile(r"^=== (\S+): .*\(")
RUNG = re.compile(
    r"rung \d+[^A]*ATE=\s*([\d.]+)m rel_trans=([\d.nan]+)m "
    r"abs_rel=([\d.nan]+) loops=(\d+) fps=([\d.]+)"
)


def group_of(step: str) -> str:
    """Map a step name to its A/B group (seeds collapse)."""
    m = re.match(r"rungs_s\d+_(\w+)", step)
    if m:
        return f"rungs[{m.group(1)}]"
    m = re.match(r"q192_s\d+_(\w+)", step)
    if m:
        return f"q192[{m.group(1)}]"
    m = re.match(r"dlr_s\d+_([\d.]+)", step)
    if m:
        return f"depth_lr_scale={m.group(1)}"
    return step


def main(paths) -> int:
    if not paths:
        paths = sorted(Path("log").glob("relay_grind_*.log"))
    groups = defaultdict(list)
    step = None
    for path in paths:
        for line in Path(path).read_text().splitlines():
            h = HEADER.match(line)
            if h:
                step = h.group(1)
                continue
            r = RUNG.search(line)
            if r and step:
                ate, rel, absr, loops, fps = r.groups()
                groups[group_of(step)].append(
                    dict(ate=float(ate), rel=float(rel), abs_rel=float(absr),
                         fps=float(fps)))
    if not groups:
        print("no rung results found")
        return 1
    print(f"{'group':28s} {'n':>2s} {'ATE':>14s} {'rel_trans':>14s} "
          f"{'abs_rel':>14s} {'fps':>12s}")
    for name, rows in sorted(groups.items()):
        def stat(key):
            v = np.array([r[key] for r in rows])
            if len(v) == 1:
                return f"{v[0]:.3f}"
            return f"{v.mean():.3f}+-{(v.max() - v.min()) / 2:.3f}"
        print(f"{name:28s} {len(rows):2d} {stat('ate'):>14s} "
              f"{stat('rel'):>14s} {stat('abs_rel'):>14s} {stat('fps'):>12s}")
    return 0


if __name__ == "__main__":
    sys.exit(main([Path(p) for p in sys.argv[1:]]))
