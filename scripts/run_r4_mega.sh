#!/bin/sh
# Round-4 megakernel knob cells at the bench resolution (default 1024):
# each cell is one mega-only mega_ab.py run; a NEW cell pays a Mosaic
# compile (~10-15 min on the tunneled chip), repeats load from .jax_cache.
# Usage: scripts/run_r4_mega.sh [RES]   Env: LOG (default /tmp/r4_mega.log)
set -u
cd "$(dirname "$0")/.."
RES=${1:-1024}
LOG=${LOG:-/tmp/r4_mega.log}
# cells: "SBLK U PROBES DDA" -- default is 8 32 4 24
for CELL in "16 32 4 24" "4 32 4 24" "8 16 6 32" "8 32 2 12" "8 64 4 24"; do
  set -- $CELL
  echo "=== res=$RES sblk=$1 U=$2 probes=$3 dda=$4 ===" >> "$LOG"
  MEGA_SBLK=$1 MEGA_U=$2 MEGA_PROBES=$3 MEGA_DDA=$4 AB_SKIP_LEGACY=1 \
    timeout 2400 python scripts/mega_ab.py "$RES" >> "$LOG" 2>&1
done
echo "=== done ===" >> "$LOG"
