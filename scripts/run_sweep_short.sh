#!/bin/bash
# Short-window variant of run_sweep_r2.sh for a ~1h tunnel window:
# headline knob ladder (baseline / UNIQ / UNIQ+TWOB / VAC / UNIQ+VAC)
# at 256^3 and 1024^3, self-apply winners, then warm the round-end
# bench at the applied knobs. Stages are clipped to the remaining
# budget; bench warm runs last with its own bounded timeout even if
# the ladder ate the budget (the driver's bench must find warm caches).
LOG=${LOG:-/tmp/sweep_short.log}
SWEEP_END=${SWEEP_END:-$(( $(date +%s) + 2400 ))}
cd /root/repo
clip() {
  local rem=$(( SWEEP_END - $(date +%s) ))
  if [ "$rem" -lt 60 ]; then echo ""; else
    if [ "$rem" -lt "$1" ]; then echo "$rem"; else echo "$1"; fi
  fi
}
batch() {  # batch RES COMBOS timeout
  local to=$(clip $3)
  if [ -z "$to" ]; then echo "--- SKIP RES=$1 (budget spent)" >> "$LOG"; return; fi
  echo "--- BATCH RES=$1 [$2] $(date +%H:%M:%S) to=${to}s" >> "$LOG"
  RES=$1 COMBOS=$2 timeout $to python scripts/cap_sweep.py >> "$LOG" 2>&1
}
# combo = capd:packd:uniq:twob[:p[:d[:vacp[:vacr]]]]
# Every batch MUST carry the factory combo (8:2:0:0) and its VAC variant:
# pick_knobs --apply pins every knob of the winner, so a ladder that only
# runs packd=1 pins PACK_DIV=1 by default-of-absence (the round-2 gotcha).
batch 256  "8:2:0:0,8:1:0:0,8:1:64:0,8:2:64:0,8:1:64:1,8:2:0:0:4:24:64:2,8:1:64:0:4:24:64:2" 1200
batch 1024 "8:2:0:0,8:1:0:0,8:1:64:0,8:2:64:0,8:1:64:1,8:2:0:0:4:24:64:2,8:1:64:0:4:24:64:2" 1500
python scripts/pick_knobs.py "$LOG" --apply >> "$LOG" 2>&1
echo "--- BENCH WARM $(date +%H:%M:%S)" >> "$LOG"
timeout 1500 python bench.py >> "$LOG" 2>&1
echo "SWEEP SHORT DONE rc=$? $(date)" >> "$LOG"
