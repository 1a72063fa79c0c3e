#!/bin/sh
# Round-4 stage B: continue-round + fat-at-1024 A/B cells on the chip.
#   A: cont on the current (non-fat) 1024 tree vs the bench's 378 ms base
#   B: fat tree at 1024 (MVRT_SNODES_ABOVE=512: T=1 probe, both row
#      stages on the DMA-dedup fetch) -- first run builds the _fat cache
#   C: fat + U=64 (the fat path dedups two row classes per round)
# Each NEW cell pays a Mosaic compile (~10 min on this 1-CPU host).
# Usage: scripts/run_r4_cont.sh   Env: LOG (default /tmp/r4_cont.log)
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r4_cont.log}
run() {
  echo "=== $* ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1
}
run env AB_SKIP_LEGACY=1 timeout 2400 python scripts/mega_ab.py 1024
run env MVRT_SNODES_ABOVE=512 AB_SKIP_LEGACY=1 timeout 4800 \
  python scripts/mega_ab.py 1024
run env MVRT_SNODES_ABOVE=512 MEGA_U=64 AB_SKIP_LEGACY=1 timeout 2400 \
  python scripts/mega_ab.py 1024
run env AB_SKIP_LEGACY=1 timeout 1800 python scripts/mega_ab.py 256
echo "=== done ===" >> "$LOG"
