#!/bin/bash
# Poll the tunneled TPU until jax.devices() answers, then run the r2 sweep.
# Appends progress to /tmp/tpu_wait2.log and the sweep to /tmp/sweep_r2.log.
WAITLOG=/tmp/tpu_wait2.log
echo "=== waiter start $(date)" >> "$WAITLOG"
while true; do
  if timeout 90 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; then
    echo "TPU UP $(date)" >> "$WAITLOG"
    break
  fi
  echo "tpu down $(date)" >> "$WAITLOG"
  sleep 60
done
cd /root/repo && bash scripts/run_sweep_r2.sh
