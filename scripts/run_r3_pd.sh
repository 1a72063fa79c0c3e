#!/bin/bash
# Round-depth (MAX_PROBES / MAX_DDA_ITERS) re-ladder at 1024^3 on top of
# the UNIQ=64 + TWO_BRICK winner. The P=4/D=24 optimum predates the
# dedup-gather: rounds were gather-priced (12.8 of 23.4 ms), so short
# rounds that shed stragglers early won. With the gather collapsed ~30x,
# round cost is kernel+bookkeeping-priced and deeper rounds amortize the
# pick/put/dedup fixed costs over more brick visits per pick.
# Incumbent (8:1:64:1:4:24) rides the batch (pick_knobs pinning gotcha).
set -u
LOG=${LOG:-/tmp/sweep_r3.log}
cd /root/repo
echo "--- R3 PD BATCH RES=1024 $(date +%H:%M:%S)" >> "$LOG"
RES=1024 COMBOS="8:1:64:1:4:24,8:1:64:1:8:24,8:1:64:1:4:48,8:1:64:1:8:48,8:1:64:1:6:36,8:1:64:1:12:48,8:1:64:1:8:64,8:1:64:0:8:48" \
  timeout 2700 python scripts/cap_sweep.py >> "$LOG" 2>&1
python scripts/pick_knobs.py "$LOG" --apply >> "$LOG" 2>&1
echo "R3 PD DONE $(date)" >> "$LOG"
