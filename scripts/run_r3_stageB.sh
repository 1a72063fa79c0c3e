#!/bin/bash
# Round-3 stage B: PT-profile knob ladder on the lattice (the bench scene)
# at 256^3 and 1024^3, apply the PT overlay winners, then warm the
# round-end bench (now including its path-traced stage) at the applied
# knobs so the driver's bench run hits compiled programs.
# Factory combo rides every batch (the pick_knobs pinning gotcha).
LOG=${LOG:-/tmp/sweep_r3.log}
cd /root/repo
ptbatch() {  # ptbatch RES COMBOS TIMEOUT
  echo "--- R3 PT BATCH RES=$1 [$2] $(date +%H:%M:%S)" >> "$LOG"
  SCENE=lattice RES=$1 COMBOS=$2 timeout $3 \
    python scripts/pt_step_timing.py >> "$LOG" 2>&1
}
# combo = capd:packd:uniq:twob[:p[:d[:vacp[:vacr]]]]
# Rungs updated 2026-08-19 after the primary ladder: UNIQ=64(+TWO_BRICK at
# 1024) with PACK_DIV=1 won primary decisively (packd=2 lost ~1.6x once
# UNIQ collapsed the gather), so the PT ladder tests the primary winner,
# its VAC overlay (PT tails are straggler-heavy, act_stats), the round-2
# PT winner (8:2:0:0:4:24:64:2), and factory.
ptbatch 256  "8:2:0:0,8:1:32:0,8:1:32:0:4:24:64:2,8:2:0:0:4:24:64:2,8:1:64:1:4:24:64:2" 2400
ptbatch 1024 "8:2:0:0,8:1:64:1,8:1:64:1:4:24:64:2,8:1:64:0:4:24:64:2,8:2:0:0:4:24:64:2" 3000
python scripts/pick_knobs.py "$LOG" --apply-pt >> "$LOG" 2>&1
echo "--- R3 BENCH WARM $(date +%H:%M:%S)" >> "$LOG"
timeout 2400 python bench.py >> "$LOG" 2>&1
echo "R3 STAGE B DONE rc=$? $(date)" >> "$LOG"
