#!/bin/bash
for seed in 0 1 2 3 4; do
  python train_tactile_push_ppo.py --cfg ./cfg/ppo_tactile.yaml \
    --logdir ./trained_models/ppo_tactile/seed$seed --seed $seed --no-time-stamp
done
