"""Train TactileInsertion with recurrent PPO.

    python train_tactile_insertion_ppo.py \
        --cfg cfg/tactile_insertion_trans_and_rot.yaml --logdir ...
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "../.."))

import jax


def main():
    from tactilesimulation_tpu.utils import config as cfgutil
    from tactilesimulation_tpu.utils.logging import print_ok

    args_list = ["--cfg", "./cfg/tactile_insertion_trans_and_rot.yaml",
                 "--logdir", "./trained_models/",
                 "--seed", "0"]
    cfgutil.solve_argv_conflict(args_list, sys.argv[1:])
    args = cfgutil.get_rl_parser().parse_args(args_list + sys.argv[1:])
    if args.device:
        jax.config.update("jax_platforms", args.device)

    cfg = cfgutil.load_cfg(args)
    cfgutil.set_random_seed(args.seed)

    from tactilesimulation_tpu import envs
    from tactilesimulation_tpu.algorithms.ppo_rnn import PPORNN

    env_params = dict(cfg["params"]["env"])
    name = env_params.pop("name")
    # lane-major vec env: fused whole-batch step + auto-reset (the vmapped
    # per-instance path measured 324 ms/vec-step at B=8 on TPU — infeasible
    # for the 5e6-step protocol). Opt out with `lane_vec: false` in the cfg.
    lane_vec = env_params.pop("lane_vec", True)
    env = envs.make(name, **env_params)
    if lane_vec:
        from tactilesimulation_tpu.envs.tactile_insertion_lanes import (
            TactileInsertionLanes)
        env = TactileInsertionLanes(env)

    algo = PPORNN(env, cfg["params"],
                  logdir=args.logdir if args.train else None, seed=args.seed)
    if args.checkpoint:
        algo.load(args.checkpoint)
    if args.resume:
        algo.resume(args.resume)
    if args.train:
        cfgutil.dump_cfg(cfg, args.logdir)
        sr = algo.train(stop_update=args.stop_update)
        print_ok(f"final success rate: {sr:.3f}")


if __name__ == "__main__":
    main()
