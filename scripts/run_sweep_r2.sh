#!/bin/bash
# Global 4h cap so a late tunnel window can't leave the sweep hogging the
# single chip when the round driver wants it for bench.py (one TPU process
# at a time -- two queue and both look hung).
timeout 14400 bash "$(dirname "$0")/run_sweep_r2_inner.sh"
echo "SWEEP WRAPPER EXIT rc=$? $(date)" >> ${LOG:-/tmp/sweep_r2.log}
