#!/bin/bash
for seed in 0 1 2 3 4; do
  python train_tactile_push_gd.py --cfg ./cfg/gd_privilege.yaml \
    --logdir ./trained_models/gd_privilege/seed$seed --seed $seed --no-time-stamp
done
