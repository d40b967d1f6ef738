#!/bin/bash
# Round-5 grind PHASE 2: quality pretrain with best-checkpoint tracking,
# then the depth-LR-split A/B re-run FROM THE BEST EPOCH with seeds
# (VERDICT r4 #6 + #7 — the round-4 A/B consumed a degraded epoch-15
# checkpoint and ran single-seed).  Launch ONLY after relay_grind.sh
# finishes (never two heavy JAX processes on this 1-core box).
# Usage: nohup bash tools/relay_grind2.sh >/tmp/grind2.log 2>&1 &
cd "$(dirname "$0")/.."
mkdir -p log
STATE=log/relay_grind_state
OUT=log/relay_grind_$(date +%Y%m%d).log
touch "$STATE"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

wait_healthy() {
  while true; do
    timeout 90 python - <<'PY' && return 0
import jax, jax.numpy as jnp
v = float((jnp.ones((256,256), jnp.bfloat16)@jnp.ones((256,256), jnp.bfloat16))[0,0])
print("healthy", v)
PY
    echo "$(date +%T) relay down; sleep 180" | tee -a "$OUT"
    sleep 180
  done
}

step() {  # step <name> <success-grep> <timeout_s> <cmd...>
  local name=$1 pat=$2 tmo=$3; shift 3
  grep -qx "$name" "$STATE" && return 0
  while true; do
    wait_healthy
    echo "=== $name: $* ($(date +%T)) ===" | tee -a "$OUT"
    timeout "$tmo" "$@" 2>&1 | tail -40 | tee -a "$OUT" | grep -q "$pat" && {
      echo "$name" >> "$STATE"; echo "--- $name DONE ---" | tee -a "$OUT"; return 0; }
    echo "--- $name FAILED, retrying ---" | tee -a "$OUT"
    sleep 60
  done
}

# 1. quality pretrain, 12 epochs, best-checkpoint tracking active
#    (fit monitors abs_rel since depth_error+val are on)
step pretrain_q 'epoch' 5400 python -m tpuslam.cli.pretrain \
  --config tpuslam/config/defaults/pretrain_synthetic_quality.yaml --epochs 12

# 2. resolve best checkpoint -> log/pretrain_quality/best_ckpt symlink
step resolve_best 'BEST' 300 python -c "
from pathlib import Path
from tpuslam.checkpoint.io import best_checkpoint, latest_checkpoint
log = Path('log/pretrain_quality')
best = best_checkpoint(log) or latest_checkpoint(log)
link = log / 'best_ckpt'
if link.is_symlink() or link.exists(): link.unlink()
link.symlink_to(best.resolve())
print('BEST', best)
"

# 3. depth-LR A/B from the best checkpoint: scale {1.0, 0.1, 0.0} x 3 seeds
for seed in 0 1 2; do
  for scale in 1.0 0.1 0.0; do
    step dlr_s${seed}_${scale} 'rung 2' 2400 python -m tpuslam.cli.rungs \
      --rungs 2 --frames 40 --seed $((7 + seed * 10)) \
      --weights log/pretrain_quality/best_ckpt --depth-lr-scale $scale
  done
done
echo "GRIND2 DONE $(date +%T)" | tee -a "$OUT"
