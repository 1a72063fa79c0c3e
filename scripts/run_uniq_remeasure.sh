#!/bin/bash
# Re-measure the UNIQ dedup-gather combos after the Mosaic f32->u32 cast
# fix (the first short-sweep window measured them as lowering failures).
# Trees come from the /tmp treecache the short sweep already populated,
# so each batch is compile + 5 timed frames, not a rebuild.
LOG=${LOG:-/tmp/sweep_short.log}
cd /root/repo
for RES in 256 1024; do
  if [ ! -e "/tmp/hako_tree_lat64_${RES}.npz" ]; then
    echo "--- SKIP UNIQ RES=$RES (no cached tree)" >> "$LOG"; continue
  fi
  echo "--- UNIQ REMEASURE RES=$RES $(date +%H:%M:%S)" >> "$LOG"
  RES=$RES COMBOS="8:1:64:0,8:1:128:0,8:1:64:1" \
    timeout ${T:-900} python scripts/cap_sweep.py >> "$LOG" 2>&1
done
python scripts/pick_knobs.py "$LOG" --apply >> "$LOG" 2>&1
echo "UNIQ REMEASURE DONE $(date)" >> "$LOG"
