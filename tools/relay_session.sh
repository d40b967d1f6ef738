#!/usr/bin/env bash
# One-shot relay measurement session: run when the axon relay is healthy.
# Captures every number queued behind the 2026-08-18 outage (BASELINE.md
# "Round-3 continuation") into log/relay_session_<ts>.log, one step at a
# time (this box has ONE core — never run two heavy JAX processes).
#
# Usage: bash tools/relay_session.sh [quick]
#   quick = skip the two slow e2e A/B runs.
set -u
cd "$(dirname "$0")/.."
ts=$(date +%Y%m%d_%H%M%S)
out="log/relay_session_${ts}.log"
mkdir -p log
run() {
  echo "=== $* ===" | tee -a "$out"
  # 1000s > bench.py's internal 900s dead-backend watchdog, so a mid-run
  # relay stall yields bench's honest zero-valued JSON line instead of an
  # external SIGTERM racing it (the watchdog clock starts after the slow
  # jax import; the shell clock starts at exec).
  timeout 1000 "$@" 2>&1 | tail -20 | tee -a "$out"
  echo | tee -a "$out"
}

# 0. health probe — the tunnel stalls transiently (CLAUDE.md), so retry a
# few times before declaring the relay down
probe_ok=""
for attempt in 1 2 3 4 5; do
  echo "probe (attempt $attempt)..." | tee -a "$out"
  if timeout 120 python -c "
import jax, jax.numpy as jnp
print('relay OK', float((jnp.ones((256,256))@jnp.ones((256,256)))[0,0]))
" 2>&1 | tee -a "$out" | grep -q "relay OK"; then probe_ok=1; break; fi
  sleep 60
done
[ -n "$probe_ok" ] || { echo "RELAY STILL DOWN" | tee -a "$out"; exit 1; }

# 1. headline bench: default, packed, seg-skip (same session, comparable)
run python bench.py
run python bench.py --packed
run python bench.py --seg-skip

# 2. sync-latency probe (pins the per-frame readback RTT)
run python -c "
from tpuslam.utils.profiling import profile_sync_latency
print(profile_sync_latency(height=96, width=320, num_steps=2, frames=6))
"

# 3. per-op-class calibration incl. the new warp variants
run python -m tpuslam.utils.calibration

if [ "${1:-}" != "quick" ]; then
  # 4. e2e pipeline A/B at the adapt_synthetic protocol shape
  run python -m tpuslam.cli.adapt --config tpuslam/config/defaults/adapt_synthetic.yaml \
      --max-steps 40 --no-progress --pipeline-depth 0
  run python -m tpuslam.cli.adapt --config tpuslam/config/defaults/adapt_synthetic.yaml \
      --max-steps 40 --no-progress --pipeline-depth 3
  # 5. warp-variant quality A/B (rung 2, random init)
  run python -m tpuslam.cli.rungs --rungs 2 --frames 30 --warp seg_skip
fi

echo "DONE -> $out"
