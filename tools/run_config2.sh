#!/bin/bash
# BASELINE config #2: RGB-only splatfacto-init, 7k iters at 1080p — the
# reference stack's bread-and-butter splatfacto workload (ref config.py:31
# budget; nerfstudio dozer/poster class: SfM-sparse-cloud seeded, no depth).
# Runs crash-supervised: worker kills restart from the latest checkpoint
# with the killing executable refused by the attempt journal.
set -x
cd /root/repo
export QED_HBM_BYTES=16642998272   # measured: outputs/measure_hbm_r4.log
python -m qed_splatter_tpu.cli train \
  --data outputs/room1080-rgb-r4 \
  --output-dir outputs --experiment-name room1080-7k-r4 \
  --supervise --max-restarts 8 \
  --max-num-iterations 7000 \
  --log-every 100 --steps-per-eval-image 100 \
  --steps-per-eval-all-images 1000 --steps-per-save 500 \
  --vis jsonl
