#!/bin/bash
# seed sweep: 5 seeds x GD tactile (the paper comparison grid, SURVEY.md P25)
for seed in 0 1 2 3 4; do
  python train_tactile_push_gd.py --cfg ./cfg/gd_tactile.yaml \
    --logdir ./trained_models/gd_tactile/seed$seed --seed $seed --no-time-stamp
done
