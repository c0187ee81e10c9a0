#!/bin/bash
# BASELINE config #3 (round 5): ScanNet-style indoor RGB-D, mm depth
# (depth_unit_scale_factor default 0.001), depth-unprojected init point
# cloud via `qed init-pc`, 3k iters. VERDICT r5 item #3a.
set -x
cd /root/repo
export QED_HBM_BYTES=16642998272
python -m qed_splatter_tpu.cli init-pc \
  --data outputs/room-scannet-r5 --stride 4 --voxel-size 0.02
python -m qed_splatter_tpu.cli train \
  --data outputs/room-scannet-r5 \
  --output-dir outputs --experiment-name room-scannet-r5-run \
  --supervise --max-restarts 4 \
  --max-num-iterations 3000 \
  --log-every 100 --steps-per-eval-image 200 \
  --steps-per-eval-all-images 1500 --steps-per-save 1000 \
  --vis jsonl
