#!/bin/bash
# FUSE_BOOK x S_BLK combined matrix at tuned knobs (VERDICT r2 item 2 /
# PLAN "combined matrix in flight"). One process per cell: the jitted
# driver's cache keys on neither S_BLK nor FUSE_BOOK's module attr, and
# sblk_probe measures the raw intersect path at knobs_for_res(RES).
# Usage: scripts/run_r3_matrix.sh [res...]   (default: 1024 256 2048)
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r3_matrix.log}
# array default: a quoted "${@:-...}" expands to ONE word when no args are
# given, which fed RES='1024 256 2048' into sblk_probe's int()
[ $# -gt 0 ] || set -- 1024 256 2048
for RES in "$@"; do
  for CELL in "16 0" "16 1" "8 0" "8 1" "4 1"; do
    set -- $CELL
    SBLK=$1 FUSEB=$2 RES=$RES timeout 1200 python scripts/sblk_probe.py \
      2>&1 | grep -E "^SBLK|Error|error" | tee -a "$LOG"
  done
done
