#!/bin/bash
for seed in 0 1 2 3 4; do
  python train_tactile_push_gd.py --cfg ./cfg/gd_no_tactile.yaml \
    --logdir ./trained_models/gd_no_tactile/seed$seed --seed $seed --no-time-stamp
done
