#!/bin/bash
# BASELINE config #4 (round 5): outdoor forest scene, UNSCALED poses
# (auto_scale_poses off, no centering/orientation), random_scale=100 cube
# init, dense mm depth supervision — the reference thesis workload
# (reference README.md:20-28). VERDICT r5 item #3b.
set -x
cd /root/repo
export QED_HBM_BYTES=16642998272
python -m qed_splatter_tpu.cli train \
  --data outputs/forest-r5 \
  --output-dir outputs --experiment-name forest-r5-run \
  --supervise --max-restarts 4 \
  --max-num-iterations 3000 \
  --no-data.auto-scale-poses \
  --data.center-method none --data.orientation-method none \
  --model.random-scale 100 --model.num-random 100000 \
  --log-every 100 --steps-per-eval-image 200 \
  --steps-per-eval-all-images 1500 --steps-per-save 1000 \
  --vis jsonl
