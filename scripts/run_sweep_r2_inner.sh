#!/bin/bash
# Round-2 validation + dedup (UNIQ) + two-brick (TWOB) sweep, ordered so
# every hard VERDICT "Done" criterion lands before the stretch stages in
# case the tunnel window is short: headline knob ladder -> PT step ->
# warm rebuild -> 4096^3 -> 2048^3 knobs -> rtcamp artifact ->
# interactions -> 16k^3 (the 2h stretch run goes last).
# Combos run IN-PROCESS per resolution (COMBOS mode): the resolved
# knobs ride the accel static tuple into every jit cache key, and a
# failing combo prints and continues instead of killing the batch.
# (per-row DMA gather pricing already measured 2026-08-17: 27 M rows/s,
#  loses to XLA take's 51 M rows/s -- commit f91baf0)
LOG=${LOG:-/tmp/sweep_r2.log}
SWEEP_END=${SWEEP_END:-$(( $(date +%s) + 21600 ))}
cd /root/repo
clip() {  # clip STAGE_TIMEOUT -> min(stage timeout, remaining budget); "" if spent
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
stage() {  # stage NAME TIMEOUT cmd... (env assignments go via `env K=V`)
  local name=$1 to; to=$(clip $2); shift 2
  if [ -z "$to" ]; then echo "--- SKIP $name (budget spent)" >> "$LOG"; return; fi
  echo "--- $name $(date +%H:%M:%S) to=${to}s" >> "$LOG"
  timeout $to "$@" >> "$LOG" 2>&1
}
# 1) the headline ladder at 256/1024: baseline, dedup (UNIQ=64/128),
#    two-brick on dedup, two-brick alone, straggler vacuum (alone + on
#    dedup; act_stats measured 70 of 83 rounds are 1-36%-density tail
#    rounds). combo = capd:packd:uniq:twob[:p[:d[:vacp[:vacr]]]]
batch 256  "8:1:0:0,8:1:64:0,8:1:128:0,8:1:64:1,8:1:0:1,8:1:0:0:4:24:64:2,8:1:64:0:4:24:64:2" 5400
batch 1024 "8:1:0:0,8:1:64:0,8:1:128:0,8:1:64:1,8:1:0:1,8:1:0:0:4:24:64:2,8:1:64:0:4:24:64:2" 5400
# 1b) self-apply the headline winners into TUNED_BY_RES so every later
#     stage (PT timing, rtcamp, the driver's round-end bench.py) runs the
#     measured optimum even if nobody is watching. pick_knobs skips any
#     resolution whose combos disagree on checksum (correctness first).
python scripts/pick_knobs.py "$LOG" --apply >> "$LOG" 2>&1
# 2) PT step (VERDICT target: <3 s per 16 spp at 640x360 @256^3):
#    does dedup/two-brick transfer to the secondary-bounce wavefronts?
stage "PT UNIQ=0" 3000 python scripts/pt_step_timing.py
stage "PT UNIQ=64" 3000 env UNIQ=64 python scripts/pt_step_timing.py
stage "PT UNIQ=64 TWOB=1" 3000 env UNIQ=64 TWOB=1 python scripts/pt_step_timing.py
# secondary-bounce wavefronts are straggler-heavy: vacuum should bite
# hardest here (act_stats: tail rounds run at 1-36% lane density)
stage "PT VAC" 3000 env VACP=64 python scripts/pt_step_timing.py
stage "PT VAC UNIQ=64" 3000 env VACP=64 UNIQ=64 python scripts/pt_step_timing.py
# PT scaling point for the docs (applied base knobs; 1024 has no PT
# overlay entry, so this measures the base-table optimum on wavefronts)
stage "PT RES=1024" 3600 env RES=1024 python scripts/pt_step_timing.py
# 2b) apply the fastest PT stage into the TUNED_PT_BY_RES overlay (the
#     PathTracer resolves knobs with profile="pt"), so the rtcamp stage
#     and any round-end PT run ride the measured PT optimum
python scripts/pick_knobs.py "$LOG" --apply-pt >> "$LOG" 2>&1
# 3) warm per-frame rebuild at reference scale (VERDICT item #4's
#    "Done =" metric): 7M-tri lattice at 2048^3, build 3x in one
#    process, per-phase split from scene.build_stats
stage "REBUILD 2048" 2700 python scripts/rebuild_timing.py
# 4) reference-max scale axis, first rung: streamed build + render at
#    4096^3 (validates the streamed path + fills the jit caches the
#    16k^3 run reuses)
stage "SCALE 4096" 3600 env RES=4096 CUBE=512 COLOR=1 \
  OUT=out/scale_shell_4k.png python scripts/scale_shell.py
# 5) 2048^3 knobs (supernode chain; two-brick is non-fat-only so twob=0)
batch 2048 "64:1:0:0,64:1:64:0,64:1:128:0,64:2:64:0,32:1:64:0,64:2:0:0,64:4:0:0,64:1:0:0:4:24:64:2,64:1:64:0:4:24:64:2" 7200
# 5b) re-apply with the 2048 batch folded in
python scripts/pick_knobs.py "$LOG" --apply >> "$LOG" 2>&1
# 5c) pre-warm the driver's round-end bench (same lattice scene as the
#     sweeps): fills the build+render jit caches for bench.py's shapes
#     and logs a bench preview at the applied knobs
stage "BENCH WARM" 2400 python bench.py
# 6) end-to-end rtcamp artifact at round-2 speed (4 frames, per-frame
#    rebuild + PT + async PNG): the production-shot shape
stage "RTCAMP" 3600 python -m massivevoxelraytracing_tpu.apps.rtcamp \
  --frame-range 0 4 --frames 24 --width 640 --height 360 --steps 2 \
  --out out/anim_r2
# 7) interactions: packing x dedup, wider caps, P/D resweep at the dedup
#    point (the gather collapse moves the P/D optimum), vacuum width/entry,
#    and ALL-VACUUM rounds (VAC_PICK >= nb clamps to nb, so every round is
#    an act-first lane-packed round over vac_run dense blocks -- act_stats
#    measured 70/83 rounds below 36% lane density, so densifying the whole
#    run may beat block-granular rounds despite the per-round pack sort)
batch 256  "8:2:64:0,4:1:64:0,8:2:64:1,8:2:0:0,8:1:0:0:4:24:64:1,8:1:0:0:4:24:128:2,8:1:0:0:4:24:32:2,8:1:0:0:4:24:65536:16,8:1:0:0:4:24:65536:32" 5400
batch 1024 "8:2:64:0,4:1:64:0,8:2:64:1,8:1:64:0:8:24,8:1:64:0:4:48,8:1:64:1:8:24,8:2:0:0,8:4:0:0,8:1:0:0:4:24:64:1,8:1:0:0:4:24:128:2,8:1:0:0:4:24:65536:32" 7200
# 8) the 16k^3 / ~654M-voxel stretch headline (renderer_introduction.pdf
#    p.8) -- last: it can eat 2h and everything above it is a hard
#    round-2 criterion
stage "SCALE 16384" 7200 env RES=16384 CUBE=1024 TARGET=654e6 \
  OUT=out/scale_shell_16k.png python scripts/scale_shell.py
# 8b) final apply with every batch folded in
python scripts/pick_knobs.py "$LOG" --apply --apply-pt >> "$LOG" 2>&1
echo "SWEEP DONE $(date)" >> "$LOG"
