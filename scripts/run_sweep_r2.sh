#!/bin/bash
# Budget cap so a late tunnel window can't leave the sweep hogging the
# single chip when the round driver wants it for bench.py (one TPU process
# at a time -- two queue and both look hung):
#  - relative cap: 6h from sweep start
#  - absolute cap: /tmp/sweep_deadline (epoch seconds, written at session
#    start = round end minus bench headroom); whichever is sooner wins.
# The deadline is enforced INSIDE the inner script (each stage's timeout
# is clipped to the remaining budget): killing the inner bash from here
# would orphan the running python, which would keep holding the chip.
LOG=${LOG:-/tmp/sweep_r2.log}
NOW=$(date +%s)
SWEEP_END=$((NOW + 21600))
DEADLINE=$(cat /tmp/sweep_deadline 2>/dev/null || echo 0)
if [ "$DEADLINE" -gt 0 ] && [ "$DEADLINE" -lt "$SWEEP_END" ]; then
  SWEEP_END=$DEADLINE
fi
if [ $((SWEEP_END - NOW)) -lt 300 ]; then
  echo "SWEEP SKIPPED: $((SWEEP_END - NOW))s left before deadline $(date)" >> "$LOG"
  exit 0
fi
echo "SWEEP BUDGET $((SWEEP_END - NOW))s $(date)" >> "$LOG"
SWEEP_END=$SWEEP_END bash "$(dirname "$0")/run_sweep_r2_inner.sh"
echo "SWEEP WRAPPER EXIT rc=$? $(date)" >> "$LOG"
