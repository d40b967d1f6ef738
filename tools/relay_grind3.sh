#!/bin/bash
# Round-5 grind PHASE 3: quality A/Bs at the PRODUCTION shape (192x640),
# where the pallas kernels are actually active.  The 96x320 rungs A/Bs
# (phase 1, and round 4's tall-warp A/B) were vacuous: W=320 < 384 silently
# disables every pallas variant, so they compared the XLA sampler against
# itself (steps.py now warns).  Launch ONLY after relay_grind.sh finishes.
# Usage: nohup bash tools/relay_grind3.sh >/tmp/grind3.log 2>&1 &
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

R="--rungs 2 --frames 30 --height 192 --width 640"
for seed in 0 1 2; do
  step q192_s${seed}_base 'rung 2' 2700 python -m tpuslam.cli.rungs $R --seed $seed
  step q192_s${seed}_bf16 'rung 2' 2700 python -m tpuslam.cli.rungs $R --seed $seed --bf16-out
done
# the round-4 tall claim re-checked at an active shape, plus the full stack
step q192_s0_tall 'rung 2' 2700 python -m tpuslam.cli.rungs $R --seed 0 --warp tall
step q192_s0_tallproj 'rung 2' 2700 python -m tpuslam.cli.rungs $R --seed 0 --warp tall_proj
step q192_s1_tallproj 'rung 2' 2700 python -m tpuslam.cli.rungs $R --seed 1 --warp tall_proj
echo "GRIND3 DONE $(date +%T)" | tee -a "$OUT"
