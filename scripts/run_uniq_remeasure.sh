#!/bin/bash
# Follow-up ladder after the short sweep: (a) re-measure UNIQ combos
# with the Mosaic f32->i32->u32 cast fix (they failed to lower in the
# first window), (b) add the PACK_DIV=2 combos the short ladder lacked,
# so pick_knobs chooses between packd=1 and the factory packd=2 instead
# of pinning packd=1 by default-of-absence. Trees load from the /tmp
# treecache the short sweep populated; each combo is compile + 5 frames.
LOG=${LOG:-/tmp/sweep_short.log}
cd /root/repo
run() {  # run RES COMBOS
  if [ ! -e "/tmp/hako_tree_lat64_$1.npz" ]; then
    echo "--- SKIP REMEASURE RES=$1 (no cached tree)" >> "$LOG"; return
  fi
  echo "--- REMEASURE RES=$1 [$2] $(date +%H:%M:%S)" >> "$LOG"
  RES=$1 COMBOS=$2 timeout ${T:-1500} python scripts/cap_sweep.py >> "$LOG" 2>&1
}
# combo = capd:packd:uniq:twob[:p[:d[:vacp[:vacr]]]]
run 1024 "8:1:64:0,8:1:64:0:4:24:64:2,8:2:0:0,8:2:0:0:4:24:64:2"
run 256  "8:2:0:0,8:1:64:0,8:2:64:0"
python scripts/pick_knobs.py "$LOG" --apply >> "$LOG" 2>&1
echo "REMEASURE DONE $(date)" >> "$LOG"
