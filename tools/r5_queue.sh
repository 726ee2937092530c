#!/bin/sh
# Round-5 serial TPU measurement queue (one job at a time — the shared dev
# chip serializes launches, so concurrent measurements corrupt timing).
# Run from the repo root:  sh tools/r5_queue.sh [logdir]
set -x
LOG=${1:-/tmp/r5q}
mkdir -p "$LOG"

# VERDICT r4 task 1b: the mip-fetch LOD histogram per protocol (decides
# whether the GDBN_MIP_L0 single-tap path is admissible per config).
timeout 5400 python tools/measure_lod.py --cfgs dtu_eval llff_eval nerf_eval \
  > "$LOG/lod.log" 2>&1

# VERDICT r4 task 5: re-measure the non-DTU protocols at the round-5 head.
timeout 5400 python tools/measure_frame.py --cfg configs/llff_eval.yaml \
  > "$LOG/llff_frame.log" 2>&1
timeout 5400 python tools/measure_frame.py --cfg configs/nerf_eval.yaml \
  --set synthetic_hw [800,800] > "$LOG/nerf_frame.log" 2>&1
