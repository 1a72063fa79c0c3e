#!/bin/bash
# Round-3 primary-ray knob ladder. All combos for a resolution run in ONE
# window and ONE log so pick_knobs ranks rows that share timing conditions
# (the tunnel's cross-window variance is significant), and every batch
# includes the factory combo (8:2:0:0) plus the incumbent so --apply picks
# every knob from measured alternatives (the pick_knobs pinning gotcha).
# The UNIQ combos compile now: the Mosaic f32->i32->u32 cast fix (daadab5)
# landed after round 2's sweep window.
#
# Trees load from the /tmp treecache (scripts/prebuild_caches.py runs
# first each session). Each combo costs one compile + 5 frames.
LOG=${LOG:-/tmp/sweep_r3.log}
cd /root/repo
probe() {  # probe RES -> skip batch if the cached tree is missing
  python - "$1" <<'EOF'
import sys
from massivevoxelraytracing_tpu.utils import treecache
import os
sys.exit(0 if os.path.exists(treecache.cache_path(int(sys.argv[1]))) else 1)
EOF
}
batch() {  # batch RES COMBOS TIMEOUT
  if ! probe "$1"; then
    echo "--- SKIP RES=$1 (no cached tree)" >> "$LOG"; return
  fi
  echo "--- R3 BATCH RES=$1 [$2] $(date +%H:%M:%S)" >> "$LOG"
  RES=$1 COMBOS=$2 timeout ${T:-$3} python scripts/cap_sweep.py >> "$LOG" 2>&1
}
# combo = capd:packd:uniq:twob[:p[:d[:vacp[:vacr]]]]
# 1024^3 = the headline scale. Factory, r2 winner, UNIQ value ladder,
# UNIQ x pack/VAC/TWOB interactions, CAP_DIV resweep under cheap gather.
batch 1024 "8:2:0:0,8:1:0:0,8:1:64:0,8:2:64:0,8:1:32:0,8:1:128:0,8:1:64:0:4:24:64:2,8:1:64:1,8:1:64:1:4:24:64:2,4:1:64:0,16:1:64:0" 3000
# 256^3: same shape, fewer rungs.
batch 256 "8:2:0:0,8:1:0:0,8:1:64:0,8:2:64:0,8:1:32:0,8:1:64:1,8:1:64:0:4:24:64:2,4:1:64:0" 1800
# 2048^3: snode chain (2 row gathers/round). CAP_DIV=64 was the only r2
# entry; resweep it against UNIQ and wider/narrower caps.
batch 2048 "64:2:0:0,64:1:0:0,64:1:64:0,64:1:64:0:4:24:64:2,32:1:64:0,128:1:64:0,16:1:64:0,64:1:64:1" 3000
python scripts/pick_knobs.py "$LOG" --apply >> "$LOG" 2>&1
echo "R3 SWEEP DONE $(date)" >> "$LOG"
