#!/bin/bash
# Clean-window re-measurement of the 2048^3 snode-chain ladder: the first
# r3 window's 2048 batch overlapped another TPU process (two queue on the
# one chip), so its ranking (CAPD=16 over 32/64) may be timing noise.
# All rungs here share one window; pick_knobs re-applies from the union
# log (slower contaminated duplicates lose by construction).
set -u
LOG=${LOG:-/tmp/sweep_r3.log}
cd /root/repo
echo "--- R3 2048 CLEAN BATCH $(date +%H:%M:%S)" >> "$LOG"
RES=2048 COMBOS="16:1:64:0,32:1:64:0,64:1:64:0,8:1:64:0,16:1:64:1,16:1:32:0,16:1:64:0:4:24:64:2,64:2:0:0" \
  timeout 2700 python scripts/cap_sweep.py >> "$LOG" 2>&1
python scripts/pick_knobs.py "$LOG" --apply >> "$LOG" 2>&1
echo "R3 2048 CLEAN DONE $(date)" >> "$LOG"
