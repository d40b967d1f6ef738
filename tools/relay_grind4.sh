#!/bin/bash
# Round-5 grind PHASE 4: verify the validate()-NaN fix ON THE RELAY —
# the chained-accumulation validate must return a finite loss with the
# trained checkpoint that reproduced the NaN (epoch-2 best of the round-5
# quality pretrain).  Launch only when no other heavy JAX process runs.
# Usage: nohup bash tools/relay_grind4.sh >/tmp/grind4.log 2>&1 &
cd "$(dirname "$0")/.."
mkdir -p log
STATE=log/relay_grind_state
OUT=log/relay_grind_$(date +%Y%m%d).log
touch "$STATE"

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

step() {
  local name=$1 pat=$2 tmo=$3; shift 3
  grep -qx "$name" "$STATE" && return 0
  while true; do
    wait_healthy
    echo "=== $name: $* ($(date +%T)) ===" | tee -a "$OUT"
    timeout "$tmo" "$@" 2>&1 | tail -20 | tee -a "$OUT" | grep -q "$pat" && {
      echo "$name" >> "$STATE"; echo "--- $name DONE ---" | tee -a "$OUT"; return 0; }
    echo "--- $name FAILED, retrying ---" | tee -a "$OUT"
    sleep 60
  done
}

step validate_relay 'VALIDATE_FINITE' 1800 python -c "
from pathlib import Path
import numpy as np
from tpuslam.data import SyntheticDataset
from tpuslam.train.pretrain import Pretrainer
from tpuslam.checkpoint.io import load_checkpoint

tr = Pretrainer(height=96, width=320, scales=(0,1,2,3), batch_size=6,
                min_depth=0.1, max_depth=80.0, log_path='/tmp/valcheck',
                dtype='bfloat16')
params, stats, _, _ = load_checkpoint(
    Path('log/pretrain_quality/models/weights_002'),
    tr.state.params, tr.state.batch_stats)
tr.state = tr.state.replace(params=params, batch_stats=stats)
val = SyntheticDataset(num_frames=96, height=96, width=320, seed=1,
                       trajectory='loop', speed=0.8, do_augmentation=False)
v = tr.validate(val)
print('validation_loss =', v)
assert np.isfinite(v), 'still NaN on the relay'
print('VALIDATE_FINITE')
"
# run-mode gate: execute every kernel variant once and check finiteness
# (catches runtime-only Mosaic faults that compile cleanly)
step gate_run '"fail": 0' 2400 python tools/compile_gate.py --run

echo "GRIND4 DONE $(date +%T)" | tee -a "$OUT"
