#!/bin/bash
# Round-2 validation + dedup-gather (UNIQ) + PACK_DIV sweep, ordered so the
# most important results land first in case the tunnel window is short.
# One process per combo (jit caches cannot go stale across module-constant
# changes). Appends to $LOG.
# (per-row DMA gather pricing already measured 2026-08-17: 27 M rows/s,
#  loses to XLA take's 51 M rows/s -- commit f91baf0)
LOG=${LOG:-/tmp/sweep_r2.log}
cd /root/repo
run() {
  echo "--- RES=$1 CAPD=$2 PACKD=$3 UNIQ=$4 TWOB=${5:-0} $(date +%H:%M:%S)" >> "$LOG"
  RES=$1 CAPD=$2 PACKD=$3 UNIQ=$4 TWOB=${5:-0} timeout 3000 python scripts/cap_sweep.py >> "$LOG" 2>&1
}
# 1) geometric-ladder validation without packing (pending from last
#    session) -- also the dedup baselines
run 256 8 1 0
run 1024 8 1 0
# 2) THE headline experiment: per-block dedup-gather. Blocks measured
#    13-48 unique brick ids per 2048 lanes (scripts/dup_stats.py) while the
#    row gather -- 55% of the round -- is row-count-priced: UNIQ=64 should
#    collapse it ~30x.
run 256 8 1 64
run 1024 8 1 64
run 1024 8 1 128
run 256 8 1 128
# 2b) two-brick rounds (kernel A emits the 2nd in-node brick; 27->16 rounds
#     measured on CPU): on top of dedup and alone
run 1024 8 1 64 1
run 256 8 1 64 1
run 1024 8 1 0 1
# 3) reference-max scale axis: streamed build + render. 4096^3 rung first
#    (validates the streamed path + fills jit caches), then the 16k^3 /
#    ~654M-voxel headline (renderer_introduction.pdf p.8)
echo "--- SCALE 4096 $(date +%H:%M:%S)" >> "$LOG"
RES=4096 CUBE=512 COLOR=1 OUT=out/scale_shell_4k.png \
  timeout 3600 python scripts/scale_shell.py >> "$LOG" 2>&1
echo "--- SCALE 16384 $(date +%H:%M:%S)" >> "$LOG"
RES=16384 CUBE=1024 TARGET=654e6 OUT=out/scale_shell_16k.png \
  timeout 7200 python scripts/scale_shell.py >> "$LOG" 2>&1
# 4) PT step (VERDICT target: <3 s per 16 spp at 640x360 @256^3):
#    does dedup transfer to the secondary-bounce wavefronts?
echo "--- PT UNIQ=0 $(date +%H:%M:%S)" >> "$LOG"
timeout 3000 python scripts/pt_step_timing.py >> "$LOG" 2>&1
echo "--- PT UNIQ=64 $(date +%H:%M:%S)" >> "$LOG"
UNIQ=64 timeout 3000 python scripts/pt_step_timing.py >> "$LOG" 2>&1
echo "--- PT UNIQ=128 $(date +%H:%M:%S)" >> "$LOG"
UNIQ=128 timeout 3000 python scripts/pt_step_timing.py >> "$LOG" 2>&1
# 5) dedup x packing x cap interactions + P/D resweep at the dedup point
run 256 8 2 64
run 1024 8 2 64
run 1024 4 1 64
run 256 4 1 64
echo "--- P/D resweep $(date +%H:%M:%S)" >> "$LOG"
RES=1024 CAPD=8 PACKD=1 UNIQ=64 P=8 timeout 3000 python scripts/cap_sweep.py >> "$LOG" 2>&1
RES=1024 CAPD=8 PACKD=1 UNIQ=64 D=48 timeout 3000 python scripts/cap_sweep.py >> "$LOG" 2>&1
RES=1024 CAPD=8 PACKD=1 UNIQ=64 P=8 D=48 timeout 3000 python scripts/cap_sweep.py >> "$LOG" 2>&1
# 6) packing-only references (pre-dedup follow-ups)
run 256 8 2 0
run 1024 8 2 0
run 1024 8 4 0
# 7) 2048^3: validate geometric ladder at the known-best CAPD=64, then
#    dedup + packing there (builds come from the tree cache)
run 2048 64 1 0
run 2048 64 1 64
run 2048 64 1 128
run 2048 64 2 64
run 2048 32 1 64
run 2048 64 2 0
run 2048 64 4 0
# 8) end-to-end rtcamp artifact at round-2 speed (4 frames, per-frame
#    rebuild + PT + async PNG): the production-shot shape
echo "--- RTCAMP $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python -m massivevoxelraytracing_tpu.apps.rtcamp \
  --frame-range 0 4 --frames 24 --width 640 --height 360 --steps 2 \
  --out out/anim_r2 >> "$LOG" 2>&1
echo "SWEEP DONE $(date)" >> "$LOG"
