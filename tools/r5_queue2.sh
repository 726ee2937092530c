#!/bin/sh
# Round-5 serial TPU measurement queue, part 2 (VERDICT r4 tasks 4/5/6).
# One job at a time — the shared dev chip serializes launches, so
# concurrent measurements corrupt timing.  Run from the repo root:
#   sh tools/r5_queue2.sh [logdir]
#
# NOTE (as-run record, 2026-08-21): the live round ran these jobs in
# phases with two deviations — (a) the training run pins
# train.sampler_meta.input_views_num [3] (the default [2,3,4] sampler
# draws three view counts, each a separate ~25 min remote compile);
# (b) the LLFF measure_frame needs an explicit `--set synthetic_hw
# [640,960]` (synthetic_hw does NOT inherit test_dataset.input_h_w).
# Results are recorded in PERF.md / PARITY.md.
set -x
LOG=${1:-/tmp/r5q}
mkdir -p "$LOG"

# --- task 4: trained-weights golden gate -------------------------------
# (a) short synthetic training run on the TPU (same recipe as the PARITY
#     "multi-epoch" validation run) to produce a trained checkpoint with
#     real BN stats + narrowed CIs;
# (b) golden_parity --ckpt at the full eval protocol size on the chip.
timeout 3000 python train_net.py --cfg_file configs/dtu_pretrain.yaml \
  synthetic True synthetic_hw [256,320] train.epoch 3 ep_iter 120 \
  train.batch_size 2 skip_eval True exp_name r5_gate resume False \
  train.sampler_meta.input_views_num [3] train.sampler_meta.input_views_prob [1.] \
  > "$LOG/train_gate.log" 2>&1

timeout 5400 python tools/golden_parity.py --device ambient --scenes 4 \
  --ckpt workspace/trained_model/gdb_nerf/r5_gate/latest.ckpt \
  > "$LOG/gate_trained.log" 2>&1

# --- task 5: re-publish the non-DTU protocol rows (marginal estimator) --
timeout 5400 python tools/measure_frame.py --marginal \
  --cfg configs/llff_eval.yaml --set synthetic_hw [640,960] \
  > "$LOG/llff_marginal.log" 2>&1
timeout 5400 python tools/measure_frame.py --marginal \
  --cfg configs/nerf_eval.yaml --set synthetic_hw [800,800] \
  > "$LOG/nerf_marginal.log" 2>&1

# --- task 6: selective-remat A/B on the full-recipe train step ----------
# Baseline (all submodules remat'd) then per-submodule skips; OOM on a
# skip variant is itself the measurement (that submodule's remat is
# memory-load-bearing, not optional recompute).
timeout 5400 python tools/measure_train_step.py --batch 4 --size 512 640 \
  --remat --perceptual --sustain 20 > "$LOG/remat_base.log" 2>&1
GDBN_REMAT_SKIP=encode timeout 5400 python tools/measure_train_step.py \
  --batch 4 --size 512 640 --remat --perceptual --sustain 20 \
  > "$LOG/remat_skip_encode.log" 2>&1
GDBN_REMAT_SKIP=depth timeout 5400 python tools/measure_train_step.py \
  --batch 4 --size 512 640 --remat --perceptual --sustain 20 \
  > "$LOG/remat_skip_depth.log" 2>&1
GDBN_REMAT_SKIP=feature,decoder timeout 5400 python tools/measure_train_step.py \
  --batch 4 --size 512 640 --remat --perceptual --sustain 20 \
  > "$LOG/remat_skip_feature_decoder.log" 2>&1
echo QUEUE2_DONE
