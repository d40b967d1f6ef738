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

# 1. headline bench A/Bs (same session, comparable).  Round-4 priority
# order: shipped defaults first (the fused-grad default shipped UNMEASURED
# in round 3 — VERDICT r3 weak #3), then each round-4 kernel knob, then
# the round-3 leftovers.  --e2e-frames 0 keeps the kernel A/Bs pure
# device-path; the pipeline A/Bs in section 4 cover e2e.
run python bench.py                                  # shipped defaults (+e2e line)
run python bench.py --no-fused-grad --e2e-frames 0   # r3 unmeasured default A/B
run python bench.py --tall --e2e-frames 0            # full-height stripe kernel
run python bench.py --tall --bf16-out --e2e-frames 0
run python bench.py --tall --bf16-out --fused-loss --e2e-frames 0
run python bench.py --tall --bf16-out --fused-loss --fused-bwd --e2e-frames 0
run python bench.py --tall --bf16-out --fused-loss --fused-bwd --proj --e2e-frames 0
run python bench.py --fused-loss --e2e-frames 0      # fused loss on windowed warp
run python bench.py --bf16-out --e2e-frames 0
run python bench.py --extra-tiles 1 --e2e-frames 0   # r3 speed ceiling ref

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
  # 6. round-4 quality A/B: tall warp + fused loss + bf16 out vs default
  run python -m tpuslam.cli.rungs --rungs 2 --frames 30 --warp tall
fi

echo "DONE -> $out"
