#!/bin/bash
# Round-2 validation + dedup (UNIQ) + two-brick (TWOB) sweep, ordered so
# the most important results land first in case the tunnel window is
# short. Combos run IN-PROCESS per resolution (COMBOS mode): the resolved
# knobs ride the accel static tuple into every jit cache key, and a
# failing combo prints and continues instead of killing the batch.
# (per-row DMA gather pricing already measured 2026-08-17: 27 M rows/s,
#  loses to XLA take's 51 M rows/s -- commit f91baf0)
LOG=${LOG:-/tmp/sweep_r2.log}
cd /root/repo
batch() {  # batch RES COMBOS timeout
  echo "--- BATCH RES=$1 [$2] $(date +%H:%M:%S)" >> "$LOG"
  RES=$1 COMBOS=$2 timeout $3 python scripts/cap_sweep.py >> "$LOG" 2>&1
}
# 1) the headline ladder at 256/1024: baseline, dedup (UNIQ=64/128),
#    two-brick on dedup, two-brick alone. combo = capd:packd:uniq:twob[:p[:d]]
batch 256  "8:1:0:0,8:1:64:0,8:1:128:0,8:1:64:1,8:1:0:1" 4500
batch 1024 "8:1:0:0,8:1:64:0,8:1:128:0,8:1:64:1,8:1:0:1" 4500
# 1b) self-apply the headline winners into TUNED_BY_RES so every later
#     stage (PT timing, rtcamp, the driver's round-end bench.py) runs the
#     measured optimum even if nobody is watching. pick_knobs skips any
#     resolution whose combos disagree on checksum (correctness first).
python scripts/pick_knobs.py "$LOG" --apply >> "$LOG" 2>&1
# 2) reference-max scale axis: streamed build + render. 4096^3 rung first
#    (validates the streamed path + fills jit caches), then the 16k^3 /
#    ~654M-voxel headline (renderer_introduction.pdf p.8)
echo "--- SCALE 4096 $(date +%H:%M:%S)" >> "$LOG"
RES=4096 CUBE=512 COLOR=1 OUT=out/scale_shell_4k.png \
  timeout 3600 python scripts/scale_shell.py >> "$LOG" 2>&1
echo "--- SCALE 16384 $(date +%H:%M:%S)" >> "$LOG"
RES=16384 CUBE=1024 TARGET=654e6 OUT=out/scale_shell_16k.png \
  timeout 7200 python scripts/scale_shell.py >> "$LOG" 2>&1
# 3) PT step (VERDICT target: <3 s per 16 spp at 640x360 @256^3):
#    does dedup/two-brick transfer to the secondary-bounce wavefronts?
echo "--- PT UNIQ=0 $(date +%H:%M:%S)" >> "$LOG"
timeout 3000 python scripts/pt_step_timing.py >> "$LOG" 2>&1
echo "--- PT UNIQ=64 $(date +%H:%M:%S)" >> "$LOG"
UNIQ=64 timeout 3000 python scripts/pt_step_timing.py >> "$LOG" 2>&1
echo "--- PT UNIQ=64 TWOB=1 $(date +%H:%M:%S)" >> "$LOG"
UNIQ=64 TWOB=1 timeout 3000 python scripts/pt_step_timing.py >> "$LOG" 2>&1
# 4) interactions: packing x dedup, wider caps, P/D resweep at the dedup
#    point (the gather collapse moves the P/D optimum)
batch 256  "8:2:64:0,4:1:64:0,8:2:64:1,8:2:0:0" 4500
batch 1024 "8:2:64:0,4:1:64:0,8:2:64:1,8:1:64:0:8:24,8:1:64:0:4:48,8:1:64:1:8:24,8:2:0:0,8:4:0:0" 6000
# 5) 2048^3 (supernode chain; two-brick is non-fat-only so twob=0 here)
batch 2048 "64:1:0:0,64:1:64:0,64:1:128:0,64:2:64:0,32:1:64:0,64:2:0:0,64:4:0:0" 6000
# 5b) re-apply with the interaction + 2048 batches folded in
python scripts/pick_knobs.py "$LOG" --apply >> "$LOG" 2>&1
# 6) end-to-end rtcamp artifact at round-2 speed (4 frames, per-frame
#    rebuild + PT + async PNG): the production-shot shape
echo "--- RTCAMP $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python -m massivevoxelraytracing_tpu.apps.rtcamp \
  --frame-range 0 4 --frames 24 --width 640 --height 360 --steps 2 \
  --out out/anim_r2 >> "$LOG" 2>&1
echo "SWEEP DONE $(date)" >> "$LOG"
