#!/bin/bash
# Probe the axon relay until it responds; log status. Exits when healthy.
# Usage: bash tools/relay_probe.sh [interval_s]
INTERVAL=${1:-240}
LOG=/tmp/relay_probe.log
echo "$(date +%T) probe loop start" >> "$LOG"
while true; do
  timeout 90 python - <<'EOF' >> "$LOG" 2>&1
import time
t0 = time.time()
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
y = x @ x
v = float(y[0, 0])
print(f"{time.strftime('%T')} HEALTHY devices={jax.devices()} matmul={v} t={time.time()-t0:.1f}s")
EOF
  if [ $? -eq 0 ]; then
    echo "$(date +%T) relay HEALTHY — probe loop exiting" >> "$LOG"
    exit 0
  fi
  echo "$(date +%T) relay down, retry in ${INTERVAL}s" >> "$LOG"
  sleep "$INTERVAL"
done
