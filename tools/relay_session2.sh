#!/usr/bin/env bash
# Round-4 follow-up relay session.  Priorities (relay may die mid-queue):
#   1. fused-stack bench A/Bs (re-runs after the fused-loss compile-OOM fix)
#   2. post-proj K-sweep slice split (VERDICT r3 #8)
#   3. trained-checkpoint depth-LR-split trade-off A/B (VERDICT r3 #5)
#   4. 192x640 parallax-SNR stress pretrain (VERDICT r3 #4, ~90 min)
# The probe loop is PATIENT (relay outages last hours): it retries for up
# to ~4h before giving up, so this script can be launched during an outage
# and will start the queue when the relay recovers.
# One step at a time — this box has ONE core.
set -u
cd "$(dirname "$0")/.."
ts=$(date +%Y%m%d_%H%M%S)
out="log/relay_session2_${ts}.log"
mkdir -p log
run() {
  local t=$1; shift
  echo "=== $* ===" | tee -a "$out"
  timeout "$t" "$@" 2>&1 | tail -25 | tee -a "$out"
  echo | tee -a "$out"
}

probe_ok=""
for attempt in $(seq 1 60); do
  echo "probe (attempt $attempt, $(date +%H:%M:%S))..." | tee -a "$out"
  if timeout 120 python -c "
import jax, jax.numpy as jnp
print('relay OK', float((jnp.ones((256,256))@jnp.ones((256,256)))[0,0]))
" 2>&1 | tee -a "$out" | grep -q "relay OK"; then probe_ok=1; break; fi
  sleep 120
done
[ -n "$probe_ok" ] || { echo "RELAY STILL DOWN after 4h" | tee -a "$out"; exit 1; }

# 0b. baseline twin for this session (defaults measured 9.17 in session 1)
run 1000 python bench.py --e2e-frames 0

# 1. fused-loss re-runs (the session-1 full-image kernel OOMed scoped
# VMEM at 192x640; re-measured with the row-slab windowed kernels) and
# the proj A/B, back-to-back (all full fused stack)
run 1000 python bench.py --fused-loss --e2e-frames 0
run 1000 python bench.py --tall --bf16-out --fused-loss --e2e-frames 0
run 1000 python bench.py --tall --bf16-out --fused-loss --fused-bwd --e2e-frames 0
run 1000 python bench.py --tall --bf16-out --fused-loss --fused-bwd --proj --e2e-frames 0

# 2. post-proj K-sweep slice split at shipped vs fused-stack knobs
run 1000 python -c "
from tpuslam.utils.profiling import profile_adapt_step
print('defaults:', profile_adapt_step(repeats=4))
print('fused+proj:', profile_adapt_step(repeats=4, loss_overrides=dict(
    pallas_tall=True, pallas_fused_loss=True, pallas_fused_bwd=True,
    pallas_proj=True, pallas_bf16_out=True)))
"

# 3. trained-checkpoint depth-LR-split A/B (VERDICT r3 #5): pretrain on
# the rungs world, then run the online-adaptation rung at depth-LR scale
# {1.0 (reference-exact), 0.1, 0.0 (frozen depth head)} — looking for a
# setting where odometry keeps its adaptation win without >2x abs_rel
# degradation.
run 2700 python -m tpuslam.cli.pretrain \
    --config tpuslam/config/defaults/pretrain_synthetic_quality.yaml
ckpt=$(ls -d log/pretrain_quality/models/weights_* 2>/dev/null | tail -1)
if [ -n "$ckpt" ]; then
  run 900 python -m tpuslam.cli.rungs --rungs 1 --frames 30 --weights "$ckpt"
  for s in 1.0 0.1 0.0; do
    run 900 python -m tpuslam.cli.rungs --rungs 2 --frames 30 \
        --weights "$ckpt" --depth-lr-scale "$s"
  done
else
  echo "NO CHECKPOINT under log/pretrain_quality — pretrain failed/timed out" | tee -a "$out"
fi

# 4. parallax-SNR stress test: collapse regime at 192x640 (2x pixel
# parallax of the 96x320 runs) — abs_rel < 0.30 validates the SNR claim,
# flat abs_rel falsifies it (VERDICT r3 #4)
run 5400 python -m tpuslam.cli.pretrain \
    --config tpuslam/config/defaults/pretrain_collapse_synthetic_192.yaml

echo "DONE -> $out"
