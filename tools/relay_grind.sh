#!/bin/bash
# Persistent round-5 measurement driver for a FLAKY relay: steps through the
# measurement list in order, retrying each step until its success marker
# appears, waiting for relay health between attempts. Progress survives
# restarts via log/relay_grind_state (one completed step name per line).
# Usage: nohup bash tools/relay_grind.sh >/tmp/grind.log 2>&1 &
cd "$(dirname "$0")/.."
mkdir -p log
STATE=log/relay_grind_state
OUT=log/relay_grind_$(date +%Y%m%d).log
touch "$STATE"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache  # helps across retries if supported

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

# 1. compile gate (all variants, incl. proj after the iota fix)
step gate_all '"fail": 0' 1800 python tools/compile_gate.py
# 2. north-star fused stack
step bench_proj '"value": [1-9]' 2700 python bench.py --tall --bf16-out --fused-loss --fused-bwd --proj --e2e-frames 0 --watchdog 2400
# 3. shipped defaults (same session; includes e2e + host + utilization)
step bench_default '"value": [1-9]' 2700 python bench.py --watchdog 2400
# 4. bf16-out variant
step bench_bf16out '"value": [1-9]' 2700 python bench.py --bf16-out --e2e-frames 0 --watchdog 2400
# 5. intermediate stack points
step bench_tall_fl '"value": [1-9]' 2700 python bench.py --tall --bf16-out --fused-loss --e2e-frames 0 --watchdog 2400
step bench_tall_fb '"value": [1-9]' 2700 python bench.py --tall --bf16-out --fused-loss --fused-bwd --e2e-frames 0 --watchdog 2400
# 6. e2e packed-readback A/B at pipeline_depth 0 vs 3 (VERDICT #9 measurement)
step e2e_pd0 'steady-state' 1800 python -m tpuslam.cli.adapt --config tpuslam/config/defaults/adapt_synthetic.yaml --max-steps 40 --no-progress --pipeline-depth 0
step e2e_pd3 'steady-state' 1800 python -m tpuslam.cli.adapt --config tpuslam/config/defaults/adapt_synthetic.yaml --max-steps 40 --no-progress --pipeline-depth 3
# 7. quality A/Bs: bf16-out 3 seeds + full-stack tall_proj (rung 2)
for seed in 0 1 2; do
  step rungs_s${seed}_base 'rung 2' 2400 python -m tpuslam.cli.rungs --rungs 2 --frames 30 --seed $seed
  step rungs_s${seed}_bf16 'rung 2' 2400 python -m tpuslam.cli.rungs --rungs 2 --frames 30 --seed $seed --bf16-out
done
step rungs_tall_proj 'rung 2' 2400 python -m tpuslam.cli.rungs --rungs 2 --frames 30 --warp tall_proj
echo "ALL STEPS DONE $(date +%T)" | tee -a "$OUT"
