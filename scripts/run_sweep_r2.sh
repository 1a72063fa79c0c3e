#!/bin/bash
# Round-2 validation + PACK_DIV sweep. One process per combo (jit caches
# cannot go stale across module-constant changes). Appends to $LOG.
LOG=${LOG:-/tmp/sweep_r2.log}
cd /root/repo
# 0) quick probes first (2 min): per-row DMA gather pricing decides whether
#    a DMA-fed kernel B is worth building
echo "--- DMA PROBE $(date +%H:%M:%S)" >> "$LOG"
timeout 900 python scripts/dma_gather_probe3.py >> "$LOG" 2>&1
run() {
  echo "--- RES=$1 CAPD=$2 PACKD=$3 $(date +%H:%M:%S)" >> "$LOG"
  RES=$1 CAPD=$2 PACKD=$3 timeout 3000 python scripts/cap_sweep.py >> "$LOG" 2>&1
}
# 1) geometric-ladder validation without packing (pending from last session)
run 256 8 1
run 1024 8 1
# 2) packing sweep
run 256 8 2
run 1024 8 2
run 1024 8 4
run 256 8 4
# 3) packing makes wide rounds cheap (dead lanes skip the gather): try
#    wider caps with deeper packing
run 1024 4 4
run 256 4 4
# 3.5) reference-max scale axis: streamed build + render. 4096^3 rung
#      first (validates the streamed path + fills jit caches), then the
#      16k^3 / ~654M-voxel headline (renderer_introduction.pdf p.8)
echo "--- SCALE 4096 $(date +%H:%M:%S)" >> "$LOG"
RES=4096 CUBE=512 COLOR=1 OUT=out/scale_shell_4k.png \
  timeout 3600 python scripts/scale_shell.py >> "$LOG" 2>&1
echo "--- SCALE 16384 $(date +%H:%M:%S)" >> "$LOG"
RES=16384 CUBE=1024 TARGET=654e6 OUT=out/scale_shell_16k.png \
  timeout 7200 python scripts/scale_shell.py >> "$LOG" 2>&1
# 4) 2048^3: validate geometric ladder at the known-best CAPD=64, then pack
run 2048 64 1
run 2048 64 2
run 2048 64 4
run 2048 32 4
run 2048 16 4
echo "SWEEP DONE $(date)" >> "$LOG"
