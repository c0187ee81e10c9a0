#!/bin/bash
# BASELINE config #2 delivery run (round 5): RGB-only splatfacto-init,
# 7k iters at 1080p, capacity capped at 614k (the coherent splat budget
# for K<=1024 at this resolution — see RESULTS.md round-4 analysis),
# crash-supervised. VERDICT r5 item #2.
set -x
cd /root/repo
export QED_HBM_BYTES=16642998272   # measured: outputs/measure_hbm_r4.log
python -m qed_splatter_tpu.cli train \
  --data outputs/room1080-rgb-r4 \
  --output-dir outputs --experiment-name room1080-7k-r5b \
  --supervise --max-restarts 8 \
  --max-num-iterations 7000 \
  --log-every 100 --steps-per-eval-image 100 \
  --steps-per-eval-all-images 1000 --steps-per-save 1000 \
  --vis jsonl --model.max-capacity 614400
