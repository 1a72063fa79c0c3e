#!/bin/bash
# Round-3 TPU window 1 (ONE TPU process at a time -- this script is it):
#   1. prebuild the shared lattice tree caches (256/1024/2048; /tmp is
#      wiped every session so this is always the first TPU job)
#   2. primary-ray knob ladder incl. the never-measured UNIQ combos
#      (run_sweep_r3.sh) -> pick_knobs --apply
#   3. PT-profile ladder on the lattice (run_r3_stageB.sh)
#      -> pick_knobs --apply-pt -> bench warm (incl. the new PT stage)
# Stages clip themselves via per-batch timeouts; tail -f /tmp/sweep_r3.log
# to watch.
set -u
LOG=${LOG:-/tmp/sweep_r3.log}
cd /root/repo
echo "=== R3 MASTER START $(date)" >> "$LOG"
timeout 4200 python scripts/prebuild_caches.py 256 1024 2048 >> "$LOG" 2>&1
echo "=== R3 PREBUILD DONE rc=$? $(date)" >> "$LOG"
bash scripts/run_sweep_r3.sh
bash scripts/run_r3_stageB.sh
echo "=== R3 MASTER DONE $(date)" >> "$LOG"
