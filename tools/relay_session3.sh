#!/usr/bin/env bash
# Round-5 relay measurement session. Run when the axon relay is healthy.
# Logs to log/relay_session3_<ts>.log. ONE heavy JAX process at a time
# (this box has one core).
#
# Priorities (VERDICT r4):
#   #1/#2  compile gate: every shipped Pallas kernel variant must COMPILE
#          (not just interpret) at production shape — the proj SMEM fix's
#          acceptance test.
#   #1     full fused stack measured: bench --tall --bf16-out --fused-loss
#          --fused-bwd --proj.
#   #3     bench lines now carry sol_ms_frame/roofline_frac/proj_native_fps.
#   #8     bf16-out quality A/B (rungs) to act on the measured 9.33 win.
#
# Usage: bash tools/relay_session3.sh [quick]   (quick = skip e2e/rungs)
set -u
cd "$(dirname "$0")/.."
ts=$(date +%Y%m%d_%H%M%S)
out="log/relay_session3_${ts}.log"
mkdir -p log
run() {
  echo "=== $* ===" | tee -a "$out"
  timeout 1200 "$@" 2>&1 | tail -30 | tee -a "$out"
  echo | tee -a "$out"
}

# 0. health probe with retries (transient tunnel stalls — CLAUDE.md)
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

# 1. compile gate — every shipped kernel variant, production shape.
# A FAIL here gates the corresponding bench claim (VERDICT r4 #2).
run python tools/compile_gate.py

# 2. the north-star fused stack, now expected to compile (SMEM fix)
run python bench.py --tall --bf16-out --fused-loss --fused-bwd --proj --e2e-frames 0
# 3. shipped defaults (same session, comparable; includes e2e + utilization)
run python bench.py
# 4. the measured-better bf16-out variant (VERDICT r4 #8)
run python bench.py --bf16-out --e2e-frames 0
# 5. intermediate stack points for attribution
run python bench.py --tall --bf16-out --fused-loss --e2e-frames 0
run python bench.py --tall --bf16-out --fused-loss --fused-bwd --e2e-frames 0

if [ "${1:-}" != "quick" ]; then
  # 6. bf16-out quality A/B (rung 2, 30 frames, random init) — 3 seeds
  for seed in 0 1 2; do
    run python -m tpuslam.cli.rungs --rungs 2 --frames 30 --seed $seed
    run python -m tpuslam.cli.rungs --rungs 2 --frames 30 --seed $seed --bf16-out
  done
  # 7. full-stack quality A/B (tall+fused_loss+fused_bwd+proj)
  run python -m tpuslam.cli.rungs --rungs 2 --frames 30 --warp tall_proj
fi

echo "DONE -> $out"
